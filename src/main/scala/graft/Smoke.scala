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
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.select("begin_date", "end_date", "total_spent", "total_transactions",
      "top_5_vendors", "fi_summary").show(false)
    println("DETAILS=" + df.select("details").head().getString(0).take(600))
    spark.stop()
  }
}
