package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Dedup

/** Streaming duplicate-CLUSTER maintenance — the labels-store sibling
  * of `StreamingNearDupIngest`: where the dedup sink DROPS duplicates
  * at the door, this sink lands EVERYTHING and maintains the duplicate
  * cluster labeling incrementally, the state a governance/audit plane
  * needs ("which landed docs are copies of which") and the input to
  * any survivor rule applied later (min-id, longest, PageRank) without
  * re-clustering.
  *
  * The per-batch recurrence is the CC MERGE LAW (`Dedup
  * .mergeComponents`, gated one-shot-vs-incremental as
  * `q_cc_incremental`): new edges = the batch's internal dup pairs
  * (`Dedup.dupPairs`) ∪ its verified cross-batch near-dup probes
  * (`minhashProbeSigs` against the landed signature/posting index) ∪
  * its exact cross-batch digest matches; labels(t) =
  * merge(labels(t-1), CC(new edges)). Per-batch cost: one fixpoint
  * over BATCH-sized edges plus one over cluster LABELS — never a
  * corpus re-cluster. The labels table is dup-cluster-sized (only
  * docs that appear in some edge — a vanishing corpus fraction), so
  * the per-generation snapshot write is metadata-class, not a corpus
  * rewrite.
  *
  * Equivalence caveat (spec-pinned at fixture scale): the incremental
  * labeling equals the one-shot `connectedComponents(dupPairs(all))`
  * as long as no hot-bucket cap binds — the one-shot pass caps band
  * buckets at √N of the WHOLE corpus while the probe path band-joins
  * uncapped, so where caps bind (far beyond gated scales, with a
  * runtime warn) the incremental labeling can only see MORE candidate
  * edges, never fewer.
  *
  * Idempotence and replay safety mirror the ingest siblings:
  * `batch=<id>` / `gen=<id>` overwrite dirs, a frontier guard, and
  * replays read only generations strictly BEFORE their own id. */
object StreamingClusterIngest {

  /** Layout: `docs/ sigs/ post/ dig/ batch=<id>` (every landed row,
    * its signature rows, posting rows and canonical digest) and
    * `labels/gen=<id>` (the full cluster labeling AFTER that batch —
    * dup-cluster-sized snapshots, so point-in-time cluster state is
    * replayable per generation). */
  def start(docs: DataFrame, corpusDir: String, checkpointDir: String,
            n: Int = 3, k: Int = 8, bands: Int = 4,
            minJaccard: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch, corpusDir, batchId, n, k, bands, minJaccard))
      .start()

  def ingestBatch(batch: DataFrame, corpusDir: String, batchId: Long,
                  n: Int, k: Int, bands: Int, minJaccard: Double): Unit = {
    val spark = batch.sparkSession
    val frontier = maxLandedBatch(corpusDir)
    require(frontier <= batchId,
      s"cluster-ingest batch id $batchId is behind the store frontier " +
        s"$frontier at $corpusDir — this sink is single-writer per " +
        "checkpoint; a new checkpoint needs a new corpusDir")
    val b = batch.localCheckpoint()
    // Batch-internal edges: exact digest stars + verified MinHash
    // near-dup pairs, the same generator the one-shot closure gates.
    val internal = Dedup.dupPairs(b, n, k, bands, minJaccard)
      .select(col("doc_a"), col("doc_b"))
    // Cross-batch edges vs the landed index — replays must not see
    // their own first run's rows, so only batches BEFORE this count.
    val bsig = b.transform(Dedup.minhashSigTable(_, n, k)).localCheckpoint()
    val bpost = Dedup.shinglePostings(b, n)
    val corpusSig = StreamingNearDupIngest.sigStore(spark, corpusDir, k)
      .filter(col("batch") < batchId).drop("batch")
    val corpusPost = StreamingNearDupIngest.postStore(spark, corpusDir)
      .filter(col("batch") < batchId).drop("batch")
    val crossNear = Dedup.minhashProbeSigs(corpusSig, bsig, corpusPost, bpost,
        k, bands, minJaccard)
      .select(col("batch_doc").as("doc_a"), col("corpus_doc").as("doc_b"))
    // Exact cross-batch matches by canonical digest — catches the
    // shingle-less (< n tokens) docs the signature probe cannot see.
    val bdig = b.select(col("doc_id"),
      md5(Dedup.canonical(col("text"))).as("dig")).localCheckpoint()
    val crossExact = bdig
      .join(digStore(spark, corpusDir).filter(col("batch") < batchId)
          .select(col("doc_id").as("corpus_doc"), col("dig")),
        Seq("dig"))
      .select(col("doc_id").as("doc_a"), col("corpus_doc").as("doc_b"))
    val newEdges = internal.union(crossNear).union(crossExact)
    val newCC = Dedup.connectedComponents(newEdges)
    val labels = Dedup.mergeComponents(latestLabels(spark, corpusDir, batchId), newCC)
      .localCheckpoint()
    // Idempotent writes: a replayed batch rewrites its own dirs.
    b.write.mode("overwrite").parquet(s"$corpusDir/docs/batch=$batchId")
    bsig.write.mode("overwrite").parquet(s"$corpusDir/sigs/batch=$batchId")
    bpost.write.mode("overwrite").parquet(s"$corpusDir/post/batch=$batchId")
    bdig.write.mode("overwrite").parquet(s"$corpusDir/dig/batch=$batchId")
    labels.write.mode("overwrite").parquet(s"$corpusDir/labels/gen=$batchId")
  }

  /** Highest landed batch id (-1 if none) — keyed on sigs/ like the
    * near-dup sibling (all sub-stores land the same ids together). */
  def maxLandedBatch(corpusDir: String): Long =
    StoreFs.maxPartitionId(s"$corpusDir/sigs")

  /** Canonical-digest store; empty-shaped when nothing has landed. */
  def digStore(spark: SparkSession, corpusDir: String): DataFrame =
    if (StoreFs.exists(s"$corpusDir/dig"))
      spark.read.parquet(s"$corpusDir/dig")
    else
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("dig"), lit(0L).as("batch"))

  /** The labeling as of the latest generation STRICTLY BEFORE
    * `beforeBatch` (replay exclusion); empty-shaped for a fresh
    * store. Snapshot dirs are dup-cluster-sized, so this is one
    * small-directory read, not a corpus scan. */
  def latestLabels(spark: SparkSession, corpusDir: String,
                   beforeBatch: Long): DataFrame = {
    val gens = StoreFs.listNames(s"$corpusDir/labels")
      .filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong).filter(_ < beforeBatch)
    if (gens.isEmpty)
      spark.range(0).select(col("id"), col("id").as("label"))
    else
      spark.read.parquet(s"$corpusDir/labels/gen=${gens.max}")
  }

  /** The current cluster labeling (latest generation). */
  def labels(spark: SparkSession, corpusDir: String): DataFrame =
    latestLabels(spark, corpusDir, Long.MaxValue)

  /** Every landed doc row across batches. */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/docs")
}
