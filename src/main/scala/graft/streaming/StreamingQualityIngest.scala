package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.TextAnalysis

/** Quality-gated full-history ingestion — the "filter at the door"
  * production pattern: each micro-batch is scored by the hashed linear
  * quality classifier (`TextAnalysis.hashedQualityScore`, the
  * fastText/CCNet filter shape; 0-exchange scoring), rejected docs
  * never reach the dedup store, and the survivors flow through
  * `StreamingIngest.ingestBatch`'s full-history exact dedup + landing.
  * Per-batch ADMISSION STATS (arrivals, quality rejects, dup rejects,
  * landed) land alongside the corpus — the evidence a data-governance
  * review asks for ("how much did the filter cut, per batch?").
  *
  * Idempotence: the stats row derives from the same deterministic
  * classifier + dedup decisions as the landed data and writes to its
  * own `stats/batch=<id>` dir with overwrite — a foreachBatch replay
  * rewrites both identically (same argument as `StreamingIngest`). */
object StreamingQualityIngest {

  def start(docs: DataFrame, corpusDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        gatedBatch(batch, corpusDir, batchId))
      .start()

  /** One micro-batch: classifier gate -> full-history dedup + land ->
    * one idempotent stats row. */
  def gatedBatch(batch: DataFrame, corpusDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val b = batch.localCheckpoint() // scored twice (gate + count)
    val nIn = b.count()
    val admittedIds = TextAnalysis.hashedQualityScore(b)
      .filter(col("keep") === 1L).select(col("doc_id"))
    val admitted = b.join(admittedIds, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nAdmitted = admitted.count()
    StreamingIngest.ingestBatch(admitted, corpusDir, batchId)
    val nLanded = spark.read.parquet(s"$corpusDir/docs/batch=$batchId").count()
    import spark.implicits._
    // `batch` rides the partition directory (like the digest store),
    // not the row — writing it twice would clash with partition
    // discovery's inferred column
    Seq((nIn, nIn - nAdmitted, nAdmitted - nLanded, nLanded))
      .toDF("n_in", "n_quality_rejected", "n_dup_rejected", "n_landed")
      .write.mode("overwrite").parquet(s"$corpusDir/stats/batch=$batchId")
  }

  /** Per-batch admission ledger (all batches); `batch` comes from the
    * partition dirs (cast from partition-discovery's int inference). */
  def stats(spark: org.apache.spark.sql.SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/stats")
      .withColumn("batch", col("batch").cast("long"))
      .select(col("batch"), col("n_in"), col("n_quality_rejected"),
        col("n_dup_rejected"), col("n_landed"))
}
