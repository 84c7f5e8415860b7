package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ReportUpsert
import graft.streaming.StreamingReport

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def reports(rows: (String, Double, String, Long)*): DataFrame =
    rows.toSeq.toDF("dt", "total_spent", "version", "total_transactions")
      .selectExpr("to_date(dt) AS begin_date", "to_date(dt) AS end_date",
        "total_spent", "version", "total_transactions")

  test("merge: miss inserts, greater-count updates, equal/smaller no-ops (J1/P5)") {
    val existing = reports(("2024-01-01", 10.0, "old", 5L), ("2024-01-02", 20.0, "old", 8L))
    val incoming = reports(
      ("2024-01-01", 11.0, "new", 5L),   // equal count -> no-op
      ("2024-01-02", 25.0, "new", 9L),   // grew -> update
      ("2024-01-03", 7.0, "new", 2L))    // miss -> insert
    val out = ReportUpsert.merge(existing, incoming).collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(2), r.getString(3), r.getLong(4))).toMap
    assert(out("2024-01-01") == (10.0, "old", 5L))
    assert(out("2024-01-02") == (25.0, "new", 9L))
    assert(out("2024-01-03") == (7.0, "new", 2L))
  }

  test("mergeInto on disk is idempotent under replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ups").toString + "/reports"
    val v1 = reports(("2024-01-01", 10.0, "v1", 5L))
    ReportUpsert.mergeInto(dir, v1)
    ReportUpsert.mergeInto(dir, v1.withColumn("version", lit("replay")))
    val out = spark.read.parquet(dir).collect()
    assert(out.length == 1 && out.head.getAs[String]("version") == "v1")
  }
}

class StreamingSpec extends SparkSpec {

  /** The streaming file source needs a DIRECTORY of files (that's the
    * production landing-zone shape); stage the single-file fixture. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  test("streaming windowed agg over events matches batch totals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val stx = StreamingReport.transactionsStream(spark, eventsDir)
    val q = StreamingReport.windowedCategorySpend(stx, "1 day", "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cat_spend")
      .option("checkpointLocation", tmp + "/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cat_spend")
      .groupBy("category")
      .agg(sum(col("total_spent").cast("decimal(14,2)")).cast("double").as("s"),
           sum("total_transactions").as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val batch = Tables.transactions(spark, "/root/testdata/sf0.001")
      .groupBy(col("category"))
      .agg(sum(col("amount").cast("decimal(14,2)")).cast("double").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("stateful running vendor spend accumulates across batches") {
    import graft.streaming.StatefulSpend
    val tmp = java.nio.file.Files.createTempDirectory("graft_state").toString
    val stx = StreamingReport.transactionsStream(spark, eventsDir)
    val q = StatefulSpend.runningVendorSpend(stx)
      .writeStream.outputMode("update")
      .format("memory").queryName("vendor_state")
      .option("checkpointLocation", tmp + "/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    // Latest state row per vendor must equal the batch aggregate.
    val latest = spark.table("vendor_state")
      .groupBy("vendor")
      .agg(max("n_txns").as("n"), max("total_spent").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = Tables.transactions(spark, "/root/testdata/sf0.001")
      .groupBy(col("vendor"))
      .agg(count(lit(1)).as("n"),
           sum(col("amount").cast("decimal(14,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(latest == batch)
  }

  test("foreachBatch merge sink builds the reports table incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/reports"
    val stx = StreamingReport.transactionsStream(spark, eventsDir)
    val q = StreamingReport.reportMergeSink(stx, dir).start()
    q.processAllAvailable(); q.stop()
    val n = spark.read.parquet(dir).count()
    assert(n == 30)  // one report row per event day
  }
}
