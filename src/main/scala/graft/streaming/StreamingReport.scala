package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import graft.operators.ReportUpsert

/** Structured-Streaming form of the reference's 5-minute cron recompute
  * (SURVEY.md §2.9; /root/reference/pipelines/dagster_pipeline.py:17-22):
  * instead of re-folding ALL uploads every tick, new upload batches
  * stream in and `foreachBatch` MERGEs their per-period reports into the
  * reports table via the same monotone-count guard (transformer.py:55-65
  * becomes ReportUpsert.merge's P5 predicate).
  *
  * At scale this replaces an O(all-history) recompute per tick with
  * O(new-data) incremental work — the watermark bounds state, and the
  * MERGE touches only the date partitions present in the batch.
  */
object StreamingReport {

  /** The events schema in its LEGACY encoding (ts as raw nanos LONG —
    * the TIMESTAMP(NANOS) footer surfaced via the legacy conf). Used by
    * tests that pin the legacy-input path; `transactionsStream` itself
    * infers the schema of whatever is actually on disk. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The events schema in its CURRENT encoding (ts as timestamp[us] →
    * TIMESTAMP_NTZ). The default declared schema when a stream starts
    * against an EMPTY landing zone (the normal state of a fresh
    * deployment), where batch footer inference has nothing to read. */
  val currentEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events dir as a stream of transactions. A streaming
    * source needs a declared schema, so infer it from the files already
    * landed (one batch footer read — sets the legacy nanos conf only if
    * that encoding is present), then decode `ts` with the same
    * type-dispatched helper as the batch loader (graft.Tables.decodeTs):
    * the stream keeps working whether the landing zone holds legacy
    * TIMESTAMP(NANOS) files or current timestamp[us] ones.
    *
    * An EMPTY landing zone (nothing landed yet) has no footer to infer
    * from; rather than fail at stream start, fall back to
    * `schemaIfEmpty` (default: the current-generation encoding) so the
    * stream can be started before the first file arrives. */
  def transactionsStream(spark: SparkSession, dir: String,
                         schemaIfEmpty: StructType = currentEventsSchema): DataFrame = {
    val onDisk =
      try graft.Tables.readEventsRaw(spark, dir).schema
      catch {
        // Batch inference throws UNABLE_TO_INFER_SCHEMA / "Path does not
        // exist" on an empty or absent dir — the declared fallback keeps
        // stream start independent of landing-zone state.
        case e: org.apache.spark.sql.AnalysisException => schemaIfEmpty
      }
    graft.Tables.decodeTs(
      spark.readStream
        .schema(onDisk)
        .parquet(dir))
      .select(
        col("ts"),
        to_date(col("ts")).as("txn_date"),
        col("event_type").as("category"),
        concat(lit("u"), col("user_id").cast("string")).as("vendor"),
        col("value").as("amount"))
  }

  /** Event-time windowed spend per category with late-data watermark —
    * the streaming generalization of the per-file fold (A1/A5). */
  def windowedCategorySpend(tx: DataFrame, window_ : String, watermark: String): DataFrame =
    tx.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("category"))
      .agg(sum(col("amount").cast("decimal(14,2)")).cast("double").as("total_spent"),
           count(lit(1)).as("total_transactions"))

  /** Event-time SESSION windows per vendor — the built-in
    * `session_window`: events within `gap` of each other merge into one
    * window whose end is last-event-time + gap, and the watermark
    * closes a session once event time passes its end. State is bounded
    * by construction (at most one open window per active key, evicted
    * at close) — the requirement for running sessionization forever on
    * an unbounded stream. Batch sibling `q_session_window` gates the
    * same operator's semantics cross-engine (islands + last+gap end). */
  def sessionizedSpend(tx: DataFrame, gap: String, watermark: String): DataFrame =
    tx.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("vendor"))
      .agg(sum(col("amount").cast("decimal(14,2)")).cast("double").as("total_spent"),
           count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("vendor"), col("total_spent"), col("n_events"))

  /** Stream-stream attribution join: each purchase is joined to the
    * same user's click events from the preceding `horizonHours` hours
    * — the canonical watermarked interval join. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state on each side is evicted once the other side's watermark
    * passes the horizon: bounded state on unbounded streams (the
    * requirement for running this join forever at 100 TB/day).
    * `left`/`right` must share the events-stream schema of
    * `transactionsStream`'s source (ts, user_id, event_type, value). */
  def attributionJoin(events: DataFrame, horizonHours: Int,
                      watermark: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      expr(s"""p_user_id = user_id AND
              |click_ts <= purchase_ts AND
              |click_ts >= purchase_ts - INTERVAL $horizonHours HOURS""".stripMargin))
      .select(col("p_user_id").as("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_ts"), col("click_value"))
  }

  /** Incremental report maintenance: each micro-batch's daily reports
    * are MERGEd into the parquet reports table (exactly-once per the
    * reference's idempotence guard: replayed batches can only grow
    * total_transactions, so equal-count replays are no-ops).
    *
    * Without a checkpoint, every run reprocesses the whole landing zone
    * — the reference's own recompute-from-scratch cadence
    * (/root/reference/pipelines/dagster_pipeline.py:17-22). With
    * `checkpointDir` set, restarts resume from the file-source offset
    * log and each run processes ONLY newly landed files: true
    * O(new-data) incremental maintenance. */
  def reportMergeSink(tx: DataFrame, reportsDir: String,
                      checkpointDir: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = tx.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val daily = ReportUpsert.dailyReports(batch, version = s"batch$batchId")
        // Partitioned MERGE: only the date partitions present in this
        // micro-batch are read (pruned) and rewritten (dynamic
        // overwrite) — per-batch cost is O(batch), not O(history).
        ReportUpsert.mergeIntoPartitioned(reportsDir, daily)
      }
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d))
  }

  /** The OCC sibling of `reportMergeSink` (r15): every micro-batch
    * commits through `ReportUpsert.mergeIntoOcc`, so the reports table
    * tolerates CONCURRENT writers — two independent streams (or a
    * stream plus an ad-hoc backfill job) merging into one table race
    * on the manifest CAS and the loser replays against the winner's
    * snapshot; the monotone-count guard keeps every replay a
    * no-op-or-correct-update. Spark's foreachBatch replay after a
    * checkpoint restart lands on the same guard: a re-merged batch
    * whose counts already landed degrades to a no-op commit. */
  def reportMergeSinkOcc(tx: DataFrame, occDir: String,
                         checkpointDir: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = tx.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val daily = ReportUpsert.dailyReports(batch, version = s"batch$batchId")
        ReportUpsert.mergeIntoOcc(occDir, daily)
        ()
      }
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d))
  }
}
