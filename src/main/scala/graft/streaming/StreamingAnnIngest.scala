package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Similarity

/** Incremental ANN-index maintenance: new embedding batches are PQ-
  * ENCODED against the codebooks the index was trained with and their
  * codes appended — the vector sibling of `StreamingIngest`'s digest
  * store. Retraining per batch would silently re-code the landed
  * corpus (codes are only comparable within one codebook generation),
  * so the codebooks are persisted ONCE at build time and every batch
  * adopts them; rebuilding is an explicit offline `buildIndex` rerun.
  *
  * Layout: `<indexDir>/centroids` (the codebook generation, written
  * once) and `<indexDir>/codes/batch=<id>` (per-batch code rows).
  * Idempotence under foreachBatch's at-least-once replays: each batch
  * overwrites its OWN `batch=<id>` subdir, and encoding against fixed
  * codebooks is deterministic, so a replay rewrites identical rows.
  * Per-batch cost: one broadcast of the (m·ksub·dims)-sized codebooks
  * against the batch scan — O(batch), never O(corpus).
  */
object StreamingAnnIngest {

  /** Offline index build: train codebooks on the seed corpus, persist
    * them, and land the seed corpus's codes as batch=0. */
  def buildIndex(seed: DataFrame, indexDir: String,
                 m: Int, ksub: Int, iters: Int): Unit = {
    val (codes, cents) = Similarity.pqTrain(seed, m, ksub, iters)
    cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
    codes.write.mode("overwrite").parquet(s"$indexDir/codes/batch=0")
  }

  def centroids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/centroids")

  /** The full landed code index, reduced to the LATEST generation per
    * (vec_id, subspace): a vec_id re-ingested in a later batch (or a
    * stale dir left by a checkpoint reset) must contribute exactly one
    * code row per subspace — a duplicate row would silently corrupt
    * that candidate's ADC distance instead of erroring. One group-by
    * over the compressed codes (O(index), the same order as the ADC
    * scan itself); the struct-max picks the highest batch id per key.
    * Emits the ARRAY form (vec_id, carr) the LUT-gather search scans
    * directly — same single O(index) pass, and `pqSearchIndex` skips
    * its row-to-array conversion (which, keyed on the ever-fresh
    * per-tick plan, would re-materialize the whole index every
    * micro-batch). */
  def codeIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/codes")
      .groupBy(col("vec_id"), col("s"))
      .agg(max(struct(col("batch"), col("code"))).as("_m"))
      .select(col("vec_id"), col("s"), col("_m.code").as("code"))
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.functions.expr(
        "transform(array_sort(collect_list(struct(s, code))), p -> p.code)")
        .as("carr"))

  /** Batch ids already landed under `codes/` (partition-dir listing —
    * no data read). */
  private def landedBatches(spark: SparkSession, indexDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
  }

  /** A checkpoint "owns" the landed batch numbering once it has
    * committed at least one offset. */
  private def checkpointOwnsIndex(spark: SparkSession, checkpointDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$checkpointDir/offsets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** One micro-batch: encode against the persisted codebooks, land
    * under this batch's own id (idempotent overwrite; streaming batch
    * ids start at 0, landed as batch=<id+1> so the seed keeps 0). */
  def ingestBatch(batch: DataFrame, indexDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val cents = centroids(batch.sparkSession, indexDir)
    Similarity.pqEncode(batch, cents)
      .write.mode("overwrite").parquet(s"$indexDir/codes/batch=${batchId + 1}")
  }

  /** Wire over an embeddings stream (vec_id, embedding, ...).
    *
    * Refuses to start a FRESH checkpoint over an index that already
    * holds streamed batches: batch ids restart at 0 under a new
    * checkpoint, so the restarted stream would silently overwrite
    * batch=1 while leaving later batch dirs stale. Either resume with
    * the original checkpoint, or rebuild the index (`buildIndex`) and
    * start clean. (`codeIndex` additionally reduces to the latest
    * generation per key, so even a mixed dir cannot double-count.) */
  def start(embeddings: DataFrame, indexDir: String,
            checkpointDir: String): StreamingQuery = {
    val spark = embeddings.sparkSession
    val streamed = landedBatches(spark, indexDir).filter(_ > 0)
    require(streamed.isEmpty || checkpointOwnsIndex(spark, checkpointDir),
      s"refusing to start a fresh checkpoint ($checkpointDir) over an index that already " +
        s"holds streamed batches ${streamed.sorted.mkString(",")} under $indexDir/codes — " +
        "batch ids would restart at 0 and overwrite them; resume with the original " +
        "checkpoint or rebuild the index")
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch, indexDir, batchId))
      .start()
  }

  /** Streaming PQ search: each micro-batch of query VECTORS is ADC-
    * searched against the landed code index, results landed per batch
    * (idempotent overwrite). Per-tick cost: the |batch|·m·ksub ADC
    * table broadcasts over ONE scan of the code index — O(index) read,
    * O(batch·k) written, the corpus vectors never touched. This is the
    * serving side of the incremental-index story: ingest maintains the
    * codes, search answers from them. */
  def searchStream(queries: DataFrame, indexDir: String, k: Int,
                   outDir: String, checkpointDir: String): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // boundedQueries: a per-tick batch is trigger-bounded far
          // below the LUT chunk size, so the sizing count is skipped
          // and the tick stays one Spark job (a tick above ~512k
          // queries belongs on the batch API, not foreachBatch)
          Similarity.pqSearchIndex(batch.toDF(),
              codeIndex(spark, indexDir), centroids(spark, indexDir), k,
              boundedQueries = true)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
      }
      .start()
}
