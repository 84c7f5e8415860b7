package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table fingerprints — the migration-validation
  * primitive this engine's own correctness gate is built on, exposed
  * as a first-class operator: checksum a table before and after a
  * move/rewrite/engine-swap and compare scalars instead of rows.
  *
  * Design for 100 TB:
  *   - Each row is canonicalized to a string (caller-supplied columns,
  *     NULL marked with a reserved sentinel so ("a", NULL) never
  *     collides with ("a", "")), md5-hashed, and two disjoint 60-bit
  *     lanes of the digest are summed as DECIMAL(38,0). Addition is
  *     commutative, so the checksum is independent of row order,
  *     partitioning, and cluster size — and the aggregation is one
  *     map-side-combined pass with a single scalar per partition
  *     crossing the wire. No global sort, no collect.
  *   - Two independent lanes instead of one halve nothing in cost but
  *     square the collision odds a single summed lane would have.
  *   - Sums are emitted as decimal-rendered STRINGS (38 digits exceeds
  *     double's 53-bit mantissa; a double rendering would silently
  *     drop the low bits that make a checksum a checksum).
  *   - The grouped form is the production shape: per-partition-key
  *     digests localize a mismatch to the partitions that differ, so a
  *     100 TB validation re-reads only the offending slice.
  *
  * Engine-portable by the md5 playbook: DuckDB computes the identical
  * lanes via CAST('0x'||substring(md5(..),s,15) AS BIGINT) and exact
  * HUGEINT sums.
  */
object Checksum {

  /** Field separator / NULL sentinel for the canonical row rendering.
    * Control chars absent from the data domain; NULL uses a different
    * byte than the separator so shifted fields can't cancel out. */
  private val Sep = "\u0001"
  private val NullMark = "\u0002"

  /** Canonical row string over already-rendered (string-safe) columns.
    * Callers cast: ints/strings/dates directly, doubles through an
    * exact quantization (e.g. floor(x*100) for money) — double→string
    * rendering is NOT engine-portable, quantized ints are. */
  def canonical(cols: Seq[Column]): Column =
    concat_ws(Sep, cols.map(c => coalesce(c.cast("string"), lit(NullMark))): _*)

  def rowDigest(cols: Seq[Column]): Column = md5(canonical(cols))

  /** 60-bit unsigned lane from 15 hex chars of a digest, exact. */
  private def lane(h: Column, start: Int): Column =
    conv(substring(h, start, 15), 16, 10).cast("decimal(38,0)")

  private def laneAggs(h: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(lane(h, 1)).cast("string").as("checksum_a"),
    sum(lane(h, 17)).cast("string").as("checksum_b"))

  /** Whole-table fingerprint: (n_rows, checksum_a, checksum_b). */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val aggs = laneAggs(col("h"))
    df.select(rowDigest(cols).as("h")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group fingerprints — one row per value of `groupCol`. ONE
    * shuffle on the group key with partial aggregation; at scale the
    * group key is the table's partition key so a mismatch names the
    * partitions to re-validate. */
  def groupedChecksum(df: DataFrame, groupCol: Column, groupName: String,
                      cols: Seq[Column]): DataFrame = {
    val aggs = laneAggs(col("h"))
    df.select(groupCol.as(groupName), rowDigest(cols).as("h"))
      .groupBy(col(groupName))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Validation verdict between two grouped-checksum outputs: one row
    * per group key present in either side, with a status in
    * {match, mismatch, only_left, only_right}. Join is on the group
    * key — broadcast-able when the key space is small, shuffle-on-key
    * otherwise; either way it never touches the data rows again. */
  def compareChecksums(left: DataFrame, right: DataFrame,
                       groupName: String): DataFrame = {
    val l = left.select(col(groupName),
      col("n_rows").as("l_rows"), col("checksum_a").as("l_a"),
      col("checksum_b").as("l_b"))
    val r = right.select(col(groupName),
      col("n_rows").as("r_rows"), col("checksum_a").as("r_a"),
      col("checksum_b").as("r_b"))
    l.join(r, Seq(groupName), "full_outer")
      .withColumn("status",
        when(col("l_rows").isNull, lit("only_right"))
          .when(col("r_rows").isNull, lit("only_left"))
          .when(col("l_rows") === col("r_rows") &&
                col("l_a") === col("r_a") && col("l_b") === col("r_b"),
            lit("match"))
          .otherwise(lit("mismatch")))
  }
}
