package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — the multi-column clustering
  * lever behind Delta/Iceberg `OPTIMIZE ZORDER BY` (public algorithm:
  * Morton 1966; the lakehouse application is described in the Delta
  * docs), built Spark-first: a codegen'd integer bit-interleave
  * expression, a z-prefix bucketing pass (one grouped agg — bucketing
  * by curve PREFIX is range-partitioning the curve without a global
  * sort), a per-bucket min/max stats table (the Iceberg-manifest idea
  * in miniature), and a file-skipping scan planner that prunes
  * partition directories through Spark's own partition-filter
  * pushdown.
  *
  * Why it matters at 100 TB: a single-column sort layout prunes scans
  * on ONE predicate dimension; interleaving the bits of two quantized
  * key columns gives every z-prefix bucket a bounded rectangle in
  * (a, b) space, so a 2-D predicate rectangle intersects — and
  * therefore scans — O(perimeter) buckets instead of a full stripe.
  * `zOrderCompare` measures exactly that trade on real data.
  *
  * Everything is integer arithmetic on non-negative keys (shift / and
  * / or, min-max affine quantization with floor division), so DuckDB
  * replays the layout bit-exactly — the gate queries hash-match the
  * whole stats table, not a summary. */
object ZOrder {

  /** Bit-interleave two `bits`-bit non-negative integer columns:
    * result bit 2i carries a's bit i, bit 2i+1 carries b's bit i.
    * Disjoint target bits, so the combining OR is also exact ADDITION
    * — the DuckDB replay uses `+` and matches bit-for-bit. Inputs
    * wider than `bits` alias onto their low bits (callers quantize
    * first — see `quantize`). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Affine min-max quantization of a non-negative integer column to
    * `bits` bits: floor((x − mn)·(2^bits − 1) / (mx − mn)), exact
    * BIGINT arithmetic (operands non-negative, so Spark's
    * truncate-toward-zero `div` equals DuckDB's floor `//`). Without
    * this, small key domains leave the high interleave bits constant
    * and every row lands in one z-prefix bucket. `mn`/`mx` are column
    * expressions (scalar-agg values attached by the caller). */
  def quantize(x: Column, mn: Column, mx: Column, bits: Int): Column =
    when(mx > mn,
      call_function("div", (x - mn) * lit((1L << bits) - 1L), mx - mn))
      .otherwise(lit(0L))

  /** Per-row (z, bucket) assignment over quantized (a, b): one scalar
    * min/max agg broadcast onto the scan, then pure map-side bit
    * algebra. `prefixBits` of the z value form the bucket id (at most
    * 2^prefixBits buckets, each a bounded rectangle of quantized
    * space). */
  def zBucketed(df: DataFrame, aCol: String, bCol: String,
                bits: Int, prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits must be in [1, ${2 * bits}], got $prefixBits")
    val bounds = df.agg(
      min(col(aCol)).as("_amn"), max(col(aCol)).as("_amx"),
      min(col(bCol)).as("_bmn"), max(col(bCol)).as("_bmx"))
    val z = zValue(
      quantize(col(aCol), col("_amn"), col("_amx"), bits),
      quantize(col(bCol), col("_bmn"), col("_bmx"), bits), bits)
    df.join(broadcast(bounds))
      .withColumn("z", z)
      .withColumn("z_bucket", shiftright(col("z"), 2 * bits - prefixBits))
      .drop("_amn", "_amx", "_bmn", "_bmx")
  }

  /** The layout's stats table (the manifest): per z-prefix bucket, row
    * count and min/max of BOTH raw key columns — what a scan planner
    * consults instead of the data. One grouped agg, bucket-count-sized
    * output. */
  def zOrderStats(df: DataFrame, aCol: String, bCol: String,
                  bits: Int, prefixBits: Int): DataFrame =
    zBucketed(df, aCol, bCol, bits, prefixBits)
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"))

  /** Skip evaluation for the predicate rectangle [aLo,aHi]×[bLo,bHi]:
    * the stats table plus a 0/1 `scanned` flag (bucket min/max range
    * intersects the rectangle on both dimensions). The flagged table
    * IS the query result a scan planner acts on; summing n_rows over
    * scanned buckets gives the I/O the layout pays. */
  def zOrderSkipStats(df: DataFrame, aCol: String, bCol: String,
                      bits: Int, prefixBits: Int,
                      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame =
    zOrderStats(df, aCol, bCol, bits, prefixBits)
      .withColumn("scanned",
        when(col("max_a") >= aLo && col("min_a") <= aHi &&
             col("max_b") >= bLo && col("min_b") <= bHi, 1L).otherwise(0L))

  /** Head-to-head layout comparison for one predicate rectangle:
    * z-order bucketing vs single-key prefix bucketing (the plain
    * sort-by-a layout) at the SAME bucket count. Emits one row per
    * layout: buckets total/scanned and rows scanned — the measured
    * answer to "what does interleaving buy this workload?". The
    * single-key layout prunes the a-dimension perfectly and the
    * b-dimension not at all; z-order bounds both. */
  def zOrderCompare(df: DataFrame, aCol: String, bCol: String,
                    bits: Int, prefixBits: Int,
                    aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    // zBucketed permits prefixBits up to 2*bits (the interleaved curve
    // has 2*bits of prefix to take), but THIS comparison's single-key
    // arm buckets by shiftright(_aq, bits - prefixBits): a prefixBits
    // above `bits` would be a negative shift count — JVM-masked into a
    // huge shift and a silently garbage linear layout (r14 advice).
    require(prefixBits <= bits,
      s"zOrderCompare: prefixBits=$prefixBits exceeds per-key bits=$bits — " +
        "the single-key layout arm is only defined for prefixBits <= bits")
    val zrows = zOrderSkipStats(df, aCol, bCol, bits, prefixBits, aLo, aHi, bLo, bHi)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("scanned")).as("buckets_scanned"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"))
      .select(lit("zorder").as("layout"), col("n_buckets"),
        col("buckets_scanned"), col("rows_scanned"))
    val bounds = df.agg(
      min(col(aCol)).as("_amn"), max(col(aCol)).as("_amx"))
    val linear = df.join(broadcast(bounds))
      .withColumn("_aq", quantize(col(aCol), col("_amn"), col("_amx"), bits))
      .withColumn("bucket", shiftright(col("_aq"), bits - prefixBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"))
      .withColumn("scanned",
        when(col("max_a") >= aLo && col("min_a") <= aHi &&
             col("max_b") >= bLo && col("min_b") <= bHi, 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("scanned")).as("buckets_scanned"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"))
      .select(lit("linear_a").as("layout"), col("n_buckets"),
        col("buckets_scanned"), col("rows_scanned"))
    zrows.unionByName(linear)
  }

  /** Materialize the layout: the data lands partitioned by `z_bucket`
    * (one directory per curve-prefix range — Spark's partition
    * discovery makes the bucket a pruning column on every later read)
    * and the stats table lands beside it as `_zstats` (underscore ⟹
    * invisible to partition discovery — the manifest never pollutes
    * the data schema). */
  def zOrderWrite(df: DataFrame, path: String, aCol: String, bCol: String,
                  bits: Int, prefixBits: Int): Unit = {
    zBucketed(df, aCol, bCol, bits, prefixBits).drop("z")
      .write.mode("overwrite").partitionBy("z_bucket").parquet(s"$path/data")
    zOrderStats(df, aCol, bCol, bits, prefixBits)
      .write.mode("overwrite").parquet(s"$path/_zstats")
  }

  /** File-skipping scan: consult the manifest for buckets whose
    * min/max rectangle intersects the predicate rectangle (a
    * bucket-count-sized collect — planner metadata, like a partition
    * listing), then read the data with `z_bucket IN (...)` — Spark
    * prunes the non-matching partition directories BEFORE any file
    * I/O (PartitionFilters, spec-asserted) — and re-apply the exact
    * predicate (buckets are supersets of the rectangle). */
  def zScan(spark: SparkSession, path: String, aCol: String, bCol: String,
            aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val buckets = spark.read.parquet(s"$path/_zstats")
      .filter(col("max_a") >= aLo && col("min_a") <= aHi &&
              col("max_b") >= bLo && col("min_b") <= bHi)
      .select(col("z_bucket")).collect().map(_.getLong(0))
    spark.read.parquet(s"$path/data")
      .filter(col("z_bucket").isin(buckets: _*))
      .filter(col(aCol) >= aLo && col(aCol) <= aHi &&
              col(bCol) >= bLo && col(bCol) <= bHi)
  }
}
