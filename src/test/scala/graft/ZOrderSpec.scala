package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout contracts: exact Morton bit semantics, the
  * quantizer's degenerate range, the manifest-driven file-skipping
  * scan (identical results to a full-scan filter, pruning pushed as a
  * partition filter), and the layout comparison's invariants. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("zValue interleaves bits exactly; quantize handles a degenerate range") {
    // a = 0101, b = 0011 -> z bits: a0->0, b0->1, a1->2, b1->3, a2->4
    // = 1 + 2 + 0 + 8 + 16 = 27
    val row = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .head()
    assert(row.getLong(0) == 27L, s"expected 27, got ${row.getLong(0)}")
    // constant column: mx == mn quantizes to 0 (no division by zero)
    val q = Seq((7L, 7L)).toDF("x", "mn")
      .select(ZOrder.quantize(col("x"), col("mn"), col("mn"), 8).as("q"))
      .head()
    assert(q.getLong(0) == 0L)
  }

  test("zOrderWrite + zScan: full-scan-identical results through pruned partitions") {
    val li = Tables.lineitem(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.zOrderWrite(li, path, "l_partkey", "l_suppkey", 8, 6)
    val (aLo, aHi, bLo, bHi) = (10L, 60L, 2L, 6L)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_linenumber"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expected = keys(li.filter(
      col("l_partkey").between(aLo, aHi) && col("l_suppkey").between(bLo, bHi)))
    val scanned = ZOrder.zScan(spark, path, "l_partkey", "l_suppkey",
      aLo, aHi, bLo, bHi)
    assert(keys(scanned) == expected,
      "the manifest-pruned scan must return exactly the full-scan filter rows")
    assert(expected.nonEmpty, "fixture rectangle must select something")
    // the bucket predicate reaches Spark's PARTITION pruning (no file
    // of a non-matching bucket is ever opened)
    val p = scanned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("z_bucket"),
      s"bucket pruning must push as a partition filter:\n$p")
    // and the manifest genuinely skips: the rectangle intersects a
    // strict subset of buckets
    val stats = spark.read.parquet(s"$path/_zstats")
    val total = stats.count()
    val hit = stats.filter(col("max_a") >= aLo && col("min_a") <= aHi &&
      col("max_b") >= bLo && col("min_b") <= bHi).count()
    assert(hit < total, s"expected real skipping, scanned $hit of $total buckets")
  }

  test("zOrderCompare: z-order scans fewer rows than the single-key layout for a 2-D rectangle") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val rows = ZOrder.zOrderCompare(li, "l_partkey", "l_suppkey", 8, 8,
        100L, 300L, 10L, 40L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (zn, zScanB, zRows) = rows("zorder")
    val (ln, lScanB, lRows) = rows("linear_a")
    assert(zn > 0 && ln > 0)
    assert(zScanB <= zn && lScanB <= ln)
    // the selective 2-D rectangle is the z-order win case: the linear
    // layout cannot prune the b dimension, so it reads every row of
    // its a-matching stripe
    assert(zRows < lRows,
      s"z-order must scan fewer rows than linear for a 2-D rectangle: $zRows vs $lRows")
    // both layouts are supersets of the true answer
    val truth = li.filter(col("l_partkey").between(100, 300) &&
      col("l_suppkey").between(10, 40)).count()
    assert(zRows >= truth && lRows >= truth)
  }

  test("zOrderCompare: refuses prefixBits > bits, where the linear arm's shift is undefined") {
    // zBucketed itself accepts prefixBits up to 2*bits (the curve has
    // that much prefix), but the comparison's single-key arm shifts by
    // bits - prefixBits — negative shift counts are JVM-masked into
    // garbage buckets, so the API must refuse rather than mis-measure
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zOrderCompare(li, "l_partkey", "l_suppkey", 8, 9,
        100L, 300L, 10L, 40L)
    }
    assert(e.getMessage.contains("prefixBits"), e.getMessage)
  }
}
