package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Dedup

/** Streaming NEAR-dup corpus ingestion — the fuzzy sibling of
  * `StreamingIngest` (exact digests): each micro-batch is first
  * deduplicated within itself (exact + MinHash-LSH pairs → connected
  * components → one representative per cluster), then its survivors are
  * PROBED against the on-disk MinHash signature index of everything
  * already landed (`Dedup.minhashProbeSigs` — band-keyed joins against
  * the store, never a corpus self-join), and only docs with no
  * near-duplicate in the corpus land. The signature table IS the
  * persistent state: each batch appends its survivors' signature rows,
  * so corpus signatures are computed exactly once, at ingest time —
  * per-batch cost scales with the batch, never with corpus history.
  *
  * Idempotence and replay safety mirror `StreamingIngest`: `batch=<id>`
  * overwrite subdirectories, a frontier guard against fresh-checkpoint
  * id resets, and replays exclude the replayed batch's own rows from
  * the index they probe. */
object StreamingNearDupIngest {

  /** Layout: `<corpusDir>/docs/batch=<id>` (landed rows),
    * `<corpusDir>/sigs/batch=<id>` (their MinHash signature rows —
    * k longs per doc), and `<corpusDir>/post/batch=<id>` (their
    * distinct (doc_id, sh) posting rows — the exact-verify shingle
    * index; row form so the store never holds per-doc arrays). */
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
      s"ingest batch id $batchId is behind the store frontier $frontier at " +
        s"$corpusDir — this sink is single-writer per checkpoint; a new " +
        "checkpoint needs a new corpusDir")
    // Upgrade guard: a store written before the posting index existed
    // has sigs/ batches but no post/. Probing it would NOT fail — the
    // empty posting frame makes exactOverlap verify zero candidates,
    // so every near-duplicate silently lands as fresh. Refuse loudly
    // instead; backfillPostings rebuilds post/ from the landed docs.
    if (frontier >= 0 && !StoreFs.exists(s"$corpusDir/post"))
      throw new IllegalStateException(
        s"near-dup store at $corpusDir has landed sigs/ batches (frontier " +
          s"$frontier) but no post/ shingle index — exact verification " +
          "would drop every candidate pair and near-duplicates would land " +
          "as fresh docs; run StreamingNearDupIngest.backfillPostings(" +
          "spark, corpusDir, n) once to rebuild post/ from docs/")
    // 1. WITHIN-batch near-dup resolution: one representative per
    //    exact/near-dup cluster (min doc_id — deterministic under
    //    replay), so a batch cannot land two copies of one document.
    val survivors = Dedup.dedupCorpus(batch, n, k, bands, minJaccard)
      .localCheckpoint()
    // 2. Probe survivors against the landed signature index. Replays
    //    must not see their own first run's rows: only batches BEFORE
    //    this one count as the corpus.
    val bsig = survivors
      .transform(Dedup.minhashSigTable(_, n, k))
      .localCheckpoint()
    val bpost = Dedup.shinglePostings(survivors, n)
    val index = sigStore(spark, corpusDir, k)
      .filter(col("batch") < batchId).drop("batch")
    val postIndex = postStore(spark, corpusDir)
      .filter(col("batch") < batchId).drop("batch")
    val dupIds = Dedup.minhashProbeSigs(index, bsig, postIndex, bpost,
        k, bands, minJaccard)
      .select(col("batch_doc").as("doc_id")).distinct()
    val freshSig = bsig.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
    val fresh = survivors.join(freshSig.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val freshPost = bpost.join(freshSig.select(col("doc_id")), Seq("doc_id"), "left_semi")
    // 3. Idempotent writes: a replayed batch rewrites its own output.
    fresh.write.mode("overwrite").parquet(s"$corpusDir/docs/batch=$batchId")
    freshSig.write.mode("overwrite").parquet(s"$corpusDir/sigs/batch=$batchId")
    freshPost.write.mode("overwrite").parquet(s"$corpusDir/post/batch=$batchId")
  }

  /** Highest batch id already landed in the signature store (-1 if none). */
  def maxLandedBatch(corpusDir: String): Long =
    StoreFs.maxPartitionId(s"$corpusDir/sigs")

  /** The signature store with its `batch` partition column; an
    * empty frame of the right shape when nothing has landed yet. */
  def sigStore(spark: SparkSession, corpusDir: String, k: Int): DataFrame =
    if (StoreFs.exists(s"$corpusDir/sigs"))
      spark.read.parquet(s"$corpusDir/sigs")
    else {
      val sigCols = (0 until k).map(i => lit(0L).as(s"s$i"))
      spark.range(0).select(
        (col("id").as("doc_id") +: sigCols :+ lit(0L).as("batch")): _*)
    }

  /** The posting-row store ((doc_id, sh) shingle index) with its
    * `batch` partition column; empty-shaped when nothing has landed. */
  def postStore(spark: SparkSession, corpusDir: String): DataFrame =
    if (StoreFs.exists(s"$corpusDir/post"))
      spark.read.parquet(s"$corpusDir/post")
    else
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("sh"), lit(0L).as("batch"))

  /** Rebuild `post/` from the landed docs — the one-time upgrade path
    * for stores written before the posting index existed (ingestBatch
    * refuses such stores). One `shinglePostings` pass per landed batch
    * with idempotent `batch=<id>` overwrites, so a crashed backfill
    * just re-runs; `n` must match the shingle width the store's
    * signatures were built with. */
  def backfillPostings(spark: SparkSession, corpusDir: String, n: Int): Unit = {
    StoreFs.listNames(s"$corpusDir/docs").filter(_.startsWith("batch=")).sorted
      .foreach { b =>
        Dedup.shinglePostings(spark.read.parquet(s"$corpusDir/docs/$b"), n)
          .write.mode("overwrite").parquet(s"$corpusDir/post/$b")
      }
  }

  /** The landed corpus (all surviving docs across batches). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/docs")
}
