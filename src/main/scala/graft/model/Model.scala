package graft.model

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models (SURVEY §1.1): `Dataset[T]` with case-class
  * Encoders where the schema is closed — the summary/report shapes —
  * while dynamic-keyed data stays in `DataFrame`/`MapType` long form.
  */
final case class Event(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class Document(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

/** FIXTURES.md A1 — the per-upload summary record. */
final case class UploadSummary(
    upload_id: Long, begin_date: Date, end_date: Date,
    total_spent: Double, total_transactions: Long,
    spending_per_category: Map[String, Double],
    spending_per_vendor: Map[String, Double])

/** FIXTURES.md A2 — the reports-table row. */
final case class ReportRow(
    id: String, begin_date: Date, end_date: Date,
    details: String, fi_summary: String, created_at: Date)

object Model {
  /** Typed corpus loaders. */
  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir).as[Event]
  }

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir).as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    graft.Tables.embeddings(spark, sfDir).as[Embedding]
  }
}
