package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet corpus (TESTDATA.md) plus the
  * "transactions" view that adapts `events` to the reference's
  * spending-summary shape (SURVEY.md §7.1): each calendar day of the
  * events stream plays the role of one uploaded bank-statement file
  * (reference: /root/reference/extractor.py:21-42), `event_type` is the
  * spending category, `u<user_id>` the vendor, `value` the amount.
  *
  * All reads are plain parquet scans so Catalyst pushes filters and
  * prunes columns into the scan — at 100 TB the same code runs against
  * a partitioned table with partition pruning for free.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf) and rebuild a
    * microsecond timestamp. The generator wrote µs-precision values so
    * `div 1000` is lossless and matches DuckDB's own ns→µs conversion. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The transaction long-form view: one row per spending event.
    * Columns: txn_date DATE (the "file" bucket), category STRING,
    * vendor STRING, amount DOUBLE.
    */
  def transactions(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      to_date(col("ts")).as("txn_date"),
      col("event_type").as("category"),
      concat(lit("u"), col("user_id").cast("string")).as("vendor"),
      col("value").as("amount"))
}
