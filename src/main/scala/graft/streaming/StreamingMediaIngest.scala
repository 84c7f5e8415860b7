package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Dedup
import graft.multimodal.Multimodal

/** Streaming near-dup ingestion for BINARY media payloads — the
  * multimodal sibling of `StreamingNearDupIngest` (text MinHash):
  * each micro-batch is deduplicated within itself (exact digests +
  * `Multimodal.fingerprintDedup` pairs → connected components → one
  * representative per cluster), then survivors PROBE the on-disk
  * fingerprint index of everything already landed (banded Hamming
  * via `Dedup.simhashProbeSigs` — batch bands × corpus bands, never a
  * corpus self-join; recall 1.0 for hamming <= 3 by pigeonhole), and
  * only payloads with no near-duplicate in the corpus land.
  *
  * The index row is (id, fp64, c_md5) — ONE long + one digest per
  * payload regardless of payload size, so the persistent state is
  * id-table-sized and per-batch cost scales with the batch, never the
  * corpus. Payloads under 4 bytes have no fingerprint windows
  * (`contentFingerprint64` would emit the degenerate all-zero hash);
  * they are fenced onto the exact-digest path only, mirroring a
  * decoder that cannot decode falling back to bytes-exact.
  *
  * Idempotence and replay safety mirror the text sibling: `batch=<id>`
  * overwrite subdirectories, a frontier guard against fresh-checkpoint
  * id resets, and replays exclude the replayed batch's own rows from
  * the index they probe. */
object StreamingMediaIngest {

  def start(media: DataFrame, corpusDir: String, checkpointDir: String,
            maxHamming: Int = 3): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch, corpusDir, batchId, maxHamming))
      .start()

  def ingestBatch(batch: DataFrame, corpusDir: String, batchId: Long,
                  maxHamming: Int): Unit = {
    val spark = batch.sparkSession
    val frontier = maxLandedBatch(corpusDir)
    require(frontier <= batchId,
      s"media ingest batch id $batchId is behind the store frontier " +
        s"$frontier at $corpusDir — this sink is single-writer per " +
        "checkpoint; a new checkpoint needs a new corpusDir")
    val b = batch.localCheckpoint() // counted for the ledger + deduped
    // 1. WITHIN-batch exact dedup: one representative (min id) per
    //    byte-identical payload — deterministic under replay.
    val withMd5 = b.withColumn("_c", md5(col("content")))
    val reps = withMd5.groupBy(col("_c")).agg(min(col("id")).as("id"))
    val exactSurv = withMd5
      .join(reps, Seq("_c", "id"), "left_semi")
      .localCheckpoint()
    // 2. WITHIN-batch near-dup resolution over the fingerprint pair
    //    graph: CC label = min id of the cluster; non-label members
    //    drop. Payloads without windows (< 4 bytes) have no pairs here
    //    — the exact pass above is their whole within-batch story.
    val pairs = Multimodal.fingerprintDedup(exactSurv, maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val dropNear = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id"))
    val survivors = exactSurv
      .join(dropNear, Seq("id"), "left_anti")
      .localCheckpoint()
    // 3. Probe the landed index. Replays must not see their own first
    //    run's rows: only batches BEFORE this one count as the corpus.
    val index = fpStore(spark, corpusDir)
      .filter(col("batch") < batchId).drop("batch")
      .localCheckpoint()
    val bfp = survivors
      .transform(df => Multimodal.contentFingerprint64(
        df.filter(length(col("content")) >= 4)))
      .join(survivors.select(col("id"), md5(col("content")).as("_c")), Seq("id"))
      .localCheckpoint()
    val nearDup = Dedup.simhashProbeSigs(
        index.select(col("id").as("doc_id"), col("fp64").as("simhash64")),
        bfp.select(col("id").as("doc_id"), col("fp64").as("simhash64")),
        maxHamming)
      .select(col("batch_doc").as("id"))
    // exact-vs-store by digest covers the windowless payloads too (for
    // fingerprinted ones it is subsumed by hamming 0, recall 1.0)
    val exactDup = survivors.select(col("id"), md5(col("content")).as("_c"))
      .join(index.select(col("_c")), Seq("_c"), "left_semi")
      .select(col("id"))
    val dupIds = nearDup.union(exactDup).distinct()
    val fresh = survivors.join(dupIds, Seq("id"), "left_anti")
      .localCheckpoint()
    // 4. Idempotent writes: a replayed batch rewrites its own output.
    //    The index row for a windowless payload carries fp64 = NULL —
    //    it participates in digest probes only, never Hamming bands.
    val freshFp = fresh.select(col("id"), col("_c"))
      .join(bfp.select(col("id"), col("fp64")), Seq("id"), "left")
      .select(col("id"), col("fp64"), col("_c"))
    fresh.drop("_c").write.mode("overwrite")
      .parquet(s"$corpusDir/media/batch=$batchId")
    freshFp.write.mode("overwrite").parquet(s"$corpusDir/fp/batch=$batchId")
    // 5. Admission ledger (the StreamingQualityIngest governance
    //    contract, media form): every arriving payload accounted to
    //    exactly one outcome — n_in = n_batch_rejected (within-batch
    //    exact/near collapse) + n_corpus_rejected (probe hit) +
    //    n_landed. Derives from the same deterministic decisions as
    //    the landed data, so a replay rewrites it identically.
    val nIn = b.count()
    val nSurv = survivors.count()
    val nLanded = fresh.count()
    import spark.implicits._
    Seq((nIn, nIn - nSurv, nSurv - nLanded, nLanded))
      .toDF("n_in", "n_batch_rejected", "n_corpus_rejected", "n_landed")
      .write.mode("overwrite").parquet(s"$corpusDir/stats/batch=$batchId")
  }

  /** Per-batch admission ledger (all batches); `batch` comes from the
    * partition dirs. */
  def stats(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/stats")
      .withColumn("batch", col("batch").cast("long"))
      .select(col("batch"), col("n_in"), col("n_batch_rejected"),
        col("n_corpus_rejected"), col("n_landed"))

  /** Highest batch id already landed in the fingerprint store (-1 if none). */
  def maxLandedBatch(corpusDir: String): Long =
    StoreFs.maxPartitionId(s"$corpusDir/fp")

  /** The fingerprint index with its `batch` partition column; an
    * empty frame of the right shape when nothing has landed yet.
    * NULL fp64 rows are windowless payloads (digest-only members). */
  def fpStore(spark: SparkSession, corpusDir: String): DataFrame =
    if (StoreFs.exists(s"$corpusDir/fp"))
      spark.read.parquet(s"$corpusDir/fp")
        .select(col("id"), col("fp64"), col("_c"), col("batch"))
    else
      spark.range(0).select(col("id"), lit(0L).as("fp64"),
        lit("").as("_c"), lit(0L).as("batch"))

  /** The landed media corpus (all surviving payloads across batches). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/media")
}
