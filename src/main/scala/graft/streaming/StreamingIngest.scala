package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Dedup

/** Full-history streaming corpus ingestion: each micro-batch keeps
  * only the docs whose canonical digest has NEVER been seen — checked
  * against the entire landed corpus, not a watermark horizon — and
  * appends the survivors to the corpus plus their digests to the
  * digest store this sink itself maintains. The complement of
  * `StreamingDedup.dedupStream` (watermark-bounded state): here the
  * state is the on-disk digest store, so it scales with the corpus,
  * not with executor memory, and the per-batch check is
  * `Dedup.incrementalDedupFp`'s bloom-prefiltered exact path — the
  * store is scanned map-side, never shuffled.
  *
  * Idempotence under foreachBatch's at-least-once replays: every
  * batch writes to `batch=<id>` subdirectories with overwrite, so a
  * replayed batch rewrites its own output instead of duplicating it —
  * and because its digests were not yet visible to ITSELF when first
  * computed, the recomputed survivor set is identical. */
object StreamingIngest {

  /** Layout: `<corpusDir>/docs/batch=<id>` (surviving rows) and
    * `<corpusDir>/digests/batch=<id>` (their `fp` digests). */
  def start(docs: DataFrame, corpusDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch, corpusDir, batchId))
      .start()

  /** One micro-batch: in-batch first-occurrence (lowest doc_id wins,
    * deterministic under replay), then the store-level incremental
    * check, then the two idempotent writes.
    *
    * Batch ids come from ONE streaming query's checkpoint — restarts
    * continue the sequence, and a crash-replay of batch N is allowed
    * (the store's max batch is then N, N's own digests are excluded
    * below). A FRESH checkpoint against an existing store would reset
    * ids to 0 and silently overwrite landed batches, so ids behind the
    * store's frontier are rejected (driver-side dir listing, no job). */
  def ingestBatch(batch: DataFrame, corpusDir: String, batchId: Long): Unit = {
    val frontier = maxLandedBatch(corpusDir)
    require(frontier <= batchId,
      s"ingest batch id $batchId is behind the store frontier $frontier at " +
        s"$corpusDir — this sink is single-writer per checkpoint; a new " +
        "checkpoint needs a new corpusDir")
    val withFp = batch.withColumn("fp", md5(Dedup.canonical(col("text"))))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val firsts = withFp.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // Replays must not see their own first run's digests: only batches
    // BEFORE this one count as the corpus.
    val store = digestStore(batch.sparkSession, corpusDir)
      .filter(col("batch") < batchId).select(col("fp"))
    val fresh = Dedup.incrementalDedupFp(store, firsts).localCheckpoint()
    fresh.drop("fp").write.mode("overwrite")
      .parquet(s"$corpusDir/docs/batch=$batchId")
    fresh.select(col("fp")).write.mode("overwrite")
      .parquet(s"$corpusDir/digests/batch=$batchId")
  }

  /** Highest batch id already landed in the digest store (-1 if none). */
  def maxLandedBatch(corpusDir: String): Long =
    StoreFs.maxPartitionId(s"$corpusDir/digests")

  /** The digest store with its `batch` partition column; empty-schema
    * frame when nothing has landed yet. */
  def digestStore(spark: SparkSession, corpusDir: String): DataFrame =
    if (StoreFs.exists(s"$corpusDir/digests"))
      spark.read.parquet(s"$corpusDir/digests")
    else {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("fp", "batch")
    }

  /** The landed corpus (all surviving docs across batches). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/docs")
}
