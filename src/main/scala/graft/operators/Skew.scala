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
