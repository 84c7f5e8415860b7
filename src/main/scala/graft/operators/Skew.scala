package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handles sort-merge skew
  * at runtime; explicit salting is the deterministic fallback for the
  * pathological case — a handful of hot keys holding most rows — and
  * for aggregations, where AQE cannot split a hot group.
  */
object Skew {

  /** Salted equi-join of a skewed LEFT against a small-ish RIGHT.
    * Left rows get a deterministic salt in [0, salts) derived from a
    * sibling column (any per-row-varying column keeps the salt stable
    * across retries — never rand(), which breaks recomputation); the
    * right side is replicated `salts` times. The join key becomes
    * (key, salt), splitting each hot key across `salts` reducers.
    * Result is row-identical to the unsalted join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: String, salts: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"))
    val r = right.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** saltedJoin generalized over join type, deriving the salt from the
    * WHOLE left row (no sibling column needed — still deterministic
    * under retry/recompute, unlike rand()). Join types that iterate the
    * RIGHT side's unmatched rows (right/full outer) are rejected:
    * replication would duplicate them. inner / left / left_semi /
    * left_anti are exact — a left row sees every right row of its key
    * regardless of which sub-key it landed on. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 joinType: String): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports $allowed (right/full outer would duplicate " +
        s"unmatched right rows across salts), got $joinType")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame =
    saltedJoin(left, right, key, salts, "inner")

  /** Two-phase (partial -> final) aggregation for skewed group keys:
    * sum per (key, salt) first — splitting a hot key across reducers —
    * then re-sum per key. For algebraic aggregates this is
    * semantically identical to a direct groupBy; with decimal sums it
    * is also bit-identical. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltFrom: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast("double").as("total"))
}
