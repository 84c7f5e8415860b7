package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's extract surface (SURVEY §2.1 S1/S2, §2.2 P1/P4)
  * re-expressed as a batch JSON source: the Django endpoints the
  * reference polls (/root/reference/extractor.py:21-42) become a landed
  * directory of JSON documents — one upload-metadata listing and one
  * summary document per upload.
  *
  * Error semantics match the reference: a fetch that failed or returned
  * malformed JSON is dropped, not fatal (extractor.py returns {} / []
  * on error; transformer.py:168-169 skips empties) — here that is
  * PERMISSIVE parsing + corrupt-record capture + a filter.
  */
object UploadSource {

  /** The per-upload summary document schema (FIXTURES.md A1). */
  val summarySchema: StructType = StructType(Seq(
    StructField("upload_id", LongType),
    StructField("begin_date", StringType),
    StructField("end_date", StringType),
    StructField("total_spent", DoubleType),
    StructField("total_transactions", LongType),
    StructField("spending_per_category", MapType(StringType, DoubleType)),
    StructField("spending_per_vendor", MapType(StringType, DoubleType)),
    StructField("_corrupt", StringType)))

  /** S1: list uploaded file ids from landed metadata JSON
    * (`{"uploaded_files": [{"id": ...}, ...]}`) — the
    * `[int(d['id']) for d in ...]` projection (extractor.py:38). */
  def uploadedFileIds(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("uploaded_files ARRAY<STRUCT<id: STRING>>")
      .json(dir)
      .select(explode(col("uploaded_files")).as("f"))
      .select(col("f.id").cast("long").as("id"))
      .filter(col("id").isNotNull)

  /** S2 + P4: read per-upload summary JSON documents, dropping
    * malformed rows and rows missing required fields (the reference's
    * skip-on-empty at transformer.py:168-169). Dates are parsed with
    * the reference's '%Y-%m-%d' contract (F1). */
  def uploadSummaries(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(summarySchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .filter(col("_corrupt").isNull)
      .filter(col("begin_date").isNotNull && col("end_date").isNotNull &&
        col("total_spent").isNotNull)
      .select(
        col("upload_id"),
        to_date(col("begin_date"), "yyyy-MM-dd").as("begin_date"),
        to_date(col("end_date"), "yyyy-MM-dd").as("end_date"),
        col("total_spent"),
        col("total_transactions"),
        col("spending_per_category"),
        col("spending_per_vendor"))

  /** The map-explode bridge (F10): upload summaries -> the long-form
    * transactions shape the report pipeline consumes, with the file's
    * end_date as the date bucket (transformer.py:210,217-218). */
  def transactionsFromSummaries(summaries: DataFrame, mapCol: String): DataFrame =
    summaries
      .select(col("end_date").as("txn_date"),
        explode(col(mapCol)).as(Seq("key", "amount")))
}
