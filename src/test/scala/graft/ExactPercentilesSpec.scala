package graft

import org.apache.spark.sql.functions._
import graft.plans.ExactPercentiles.exact_percentiles

/** The custom TypedImperativeAggregate must be indistinguishable from
  * Spark's built-in `percentile` — bit-for-bit, not approximately —
  * across grouping, partitioning, and degenerate inputs. (The
  * merge-under-repartition ScalaCheck property lives in GraftProps.) */
class ExactPercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.25, 0.5, 0.75)

  test("exact_percentiles bit-matches the built-in percentile on corpus data") {
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    val custom = tx.groupBy(col("category"))
      .agg(exact_percentiles(col("amount").cast("double"), ps).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val builtin = tx.groupBy(col("category"))
      .agg(expr("percentile(CAST(amount AS DOUBLE), array(0.25, 0.5, 0.75))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(custom == builtin, s"custom=$custom builtin=$builtin")
    assert(custom.nonEmpty)
  }

  test("exact_percentiles: nulls skipped, single value constant, empty group NULL") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(42.0)),
      ("c", None)).toDF("k", "x")
    val out = df.groupBy(col("k"))
      .agg(exact_percentiles(col("x"), ps).as("qs"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out("a") == Seq(1.5, 2.0, 2.5))   // interpolated over {1, 3}
    assert(out("b") == Seq(42.0, 42.0, 42.0))
    assert(out("c") == null)                 // all-null group -> NULL
  }

  test("exact_percentiles is SQL-callable after registration") {
    graft.plans.ExactPercentiles.register(spark)
    Seq(1.0, 2.0, 3.0, 4.0).toDF("x").createOrReplaceTempView("ep_vals")
    val got = spark.sql(
      "SELECT exact_percentiles(CAST(x AS DOUBLE), array(0.5)) FROM ep_vals")
      .head().getSeq[Double](0)
    assert(got == Seq(2.5))
  }

  test("exact_percentiles survives serialize/deserialize partial buffers") {
    // Forcing many input partitions exercises update -> serialize ->
    // deserialize -> merge -> eval across the exchange.
    val xs = (1 to 101).map(_.toDouble)
    val df = xs.toDF("x").repartition(7)
    val got = df.agg(exact_percentiles(col("x"), Seq(0.0, 0.5, 1.0)))
      .head().getSeq[Double](0)
    assert(got == Seq(1.0, 51.0, 101.0))
  }
}
