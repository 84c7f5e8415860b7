package graft

import org.apache.spark.sql.SparkSession

/** Local t1-style smoke: run the flagship `SparkEntry.entry` and print
  * the row count plus a readable slice of the report. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("upsert")) upsertProbe(spark)
    else {
      val df = SparkEntry.entry(spark)
      println("ENTRY_ROWS=" + df.count())
      df.select("begin_date", "end_date", "total_spent", "total_transactions",
        "top_5_vendors", "fi_summary").show(false)
      println("DETAILS=" + df.select("details").head().getString(0).take(600))
    }
    spark.stop()
  }

  /** Drive the ReportUpsert.mergeInto sink: first merge populates the
    * table, a re-merge of identical data is a no-op (P5 guard), a merge
    * of grown data updates in place. */
  private def upsertProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.ReportUpsert
    val dir = "/tmp/graft_reports"
    ReportUpsert.deleteDir(dir)
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    val half = ReportUpsert.dailyReports(
      tx.filter(dayofmonth(col("txn_date")) <= 15 || col("category") =!= "error"), "v1")
    val full = ReportUpsert.dailyReports(tx, "v2")
    ReportUpsert.mergeInto(dir, half)
    println("AFTER_V1=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
    ReportUpsert.mergeInto(dir, half.withColumn("version", lit("v1b")))
    println("AFTER_REMERGE=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
    ReportUpsert.mergeInto(dir, full)
    println("AFTER_V2=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
  }
}
