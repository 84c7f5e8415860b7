package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Read the events table tolerating BOTH ts encodings the generator
    * has produced over time: legacy parquet TIMESTAMP(NANOS) (rejected
    * by the vectorized reader unless surfaced as raw int64 nanos via the
    * legacy conf) and plain timestamp[us] (read as TIMESTAMP_NTZ). The
    * legacy conf is set only when the NANOS footer is actually present —
    * an input TYPE change must never silently break the loader again. */
  private[graft] def readEventsRaw(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  /** Normalize a loaded/declared `ts` column to the session TIMESTAMP
    * type, dispatching on what the reader actually produced:
    *  - LongType        → raw nanos (legacy NANOS footer, or a stream
    *                      schema declared that way); µs-precision values
    *                      make `div 1000` lossless, matching DuckDB's
    *                      own ns→µs conversion.
    *  - TIMESTAMP_NTZ   → timestamp[us] footer; cast to session
    *                      TIMESTAMP (identity on wall-clock in UTC) so
    *                      downstream temporal ops and the oracle agree.
    *  - TIMESTAMP       → already the session type. */
  private[graft] def decodeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType   => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected INT64 nanos, TIMESTAMP_NTZ or TIMESTAMP")
    }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    decodeTs(readEventsRaw(spark, s"$sfDir/events.parquet"))
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

  /** Schema-drift guard (the r4/r5 events-regeneration lesson, made a
    * front-door check): every table's REQUIRED columns and the
    * accepted type classes per column, validated at round open — so an
    * input type change fails HERE with a named-table, named-column
    * error, not at the driver's correctness gate 60 queries deep.
    * Accepted classes are deliberately coarse (e.g. events.ts admits
    * every encoding `decodeTs` can dispatch on); anything outside them
    * is a generation this engine has never seen and must be triaged,
    * not silently mis-read. */
  private val expectedSchemas: Map[String, Map[String, Set[String]]] = {
    val num = Set("double", "float", "decimal")
    val int = Set("bigint", "int")
    Map(
      "events" -> Map("event_id" -> int, "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
        "user_id" -> int, "event_type" -> Set("string"), "value" -> num,
        "props" -> Set("string")),
      "lineitem" -> Map("l_orderkey" -> int, "l_partkey" -> int, "l_suppkey" -> int,
        "l_quantity" -> (num ++ int), "l_extendedprice" -> num, "l_discount" -> num,
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> Set("date", "timestamp", "timestamp_ntz")),
      "orders" -> Map("o_orderkey" -> int, "o_custkey" -> int,
        "o_totalprice" -> num, "o_orderdate" -> Set("date", "timestamp", "timestamp_ntz"),
        "o_orderpriority" -> Set("string")),
      "customer" -> Map("c_custkey" -> int, "c_nationkey" -> int),
      "supplier" -> Map("s_suppkey" -> int, "s_nationkey" -> int),
      "part" -> Map("p_partkey" -> int),
      "nation" -> Map("n_nationkey" -> int, "n_regionkey" -> int),
      "region" -> Map("r_regionkey" -> int),
      "documents" -> Map("doc_id" -> int, "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"), "n_chars" -> int),
      "embeddings" -> Map("vec_id" -> int, "embedding" -> Set("array<float>", "array<double>"),
        "label" -> int))
  }

  private def typeClass(dt: org.apache.spark.sql.types.DataType): String =
    dt.simpleString match {
      case s if s.startsWith("decimal") => "decimal"
      case s => s
    }

  /** Validate every table under `sfDir` against the expected schema
    * contract; returns the list of violations (empty = clean). Cheap:
    * footer reads only, no jobs beyond schema inference. */
  def schemaDrift(spark: SparkSession, sfDir: String): Seq[String] =
    expectedSchemas.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val loaded =
        try Right(if (name == "events") readEventsRaw(spark, s"$sfDir/$name.parquet")
                  else table(spark, sfDir, name))
        catch { case e: Exception =>
          Left(s"$name: unreadable — ${Option(e.getMessage).getOrElse(e.toString).take(120)}")
        }
      loaded match {
        case Left(err) => Seq(err)
        case Right(df) =>
          val actual = df.schema.map(f => f.name -> typeClass(f.dataType)).toMap
          cols.toSeq.sortBy(_._1).flatMap { case (c, accepted) =>
            actual.get(c) match {
              case None => Some(s"$name.$c: MISSING (have ${actual.keys.toSeq.sorted.mkString(",")})")
              case Some(t) if !accepted(t) =>
                Some(s"$name.$c: type $t not in accepted {${accepted.toSeq.sorted.mkString(",")}}")
              case _ => None
            }
          }
      }
    }

  /** Fail-fast form for session/round open. */
  def requireSchemas(spark: SparkSession, sfDir: String): Unit = {
    val drift = schemaDrift(spark, sfDir)
    require(drift.isEmpty, s"schema drift against $sfDir:\n  ${drift.mkString("\n  ")}")
  }

  /** Warn-only form shared by the `Verify` and `Bench` mains: each
    * violation becomes ONE named stderr line at round open, so an input
    * regeneration announces itself up front instead of surfacing as
    * dozens of per-query runtime errors. Returns the violations. */
  def warnDrift(spark: SparkSession, sfDir: String, tag: String): Seq[String] = {
    val drift = schemaDrift(spark, sfDir)
    drift.foreach(d => System.err.println(s"[$tag] SCHEMA DRIFT: $d"))
    drift
  }
}
