package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole compute surface — the period spending report —
  * re-expressed as composable Spark plans over a long-form transactions
  * DataFrame `(txn_date DATE, category STRING, vendor STRING, amount
  * DOUBLE)`.
  *
  * Reference semantics (file:line cites into /root/reference):
  *  - global sums / counts / min-max dates: transformer.py:146-147,172-187
  *  - per-key group sums with per-addend round(2): transformer.py:194-205
  *  - distinct sorted key sets: transformer.py:153-154,232-233
  *  - zero-imputed per-key mean (denominator = number of files, NOT number
  *    of files containing the key): transformer.py:217-226
  *  - pct_change of the latest file vs its predecessor per key, missing
  *    keys imputed 0, leading/0-predecessor rows -> 0: transformer.py:221-222
  *  - value-ascending sort of key totals and "top-5" = first 5 of that
  *    ASC sort (as-implemented quirk): transformer.py:212-213,240
  *
  * Everything here is stock Catalyst: hash aggregates with map-side
  * partial aggregation, one shuffle per groupBy on the grouping key,
  * window functions over a (key)-partitioned sort. At 100 TB the
  * category/vendor cardinalities are the shuffle keys — low-cardinality
  * (category) aggregations reduce almost entirely map-side; the dense
  * date×key grid stays small (days × keys, independent of row count).
  */
object SpendingReport {

  /** A5/A6 per-addend rounding: the reference rounds every amount to 2dp
    * before accumulating (transformer.py:196,203). The DECIMAL(14,2)
    * cast IS that round (half-up), and summing decimals keeps the
    * accumulation exact and order-independent — double sums would pick
    * up low-bit noise from Spark's partition-dependent add order and
    * hash-diverge from any oracle. Cast back to double at the end. */
  private def amt2: Column = col("amount").cast("decimal(14,2)")
  private def moneySum(c: Column): Column = sum(c).cast("double")

  /** A1-A4: global totals and the covered date range — one row.
    * Reference: transformer.py:146-147,172-187,229-231,241-242. */
  def globalSummary(tx: DataFrame): DataFrame =
    tx.agg(
      moneySum(amt2).as("total_spent"),
      count(lit(1)).as("total_transactions"),
      min(col("txn_date")).as("begin_date"),
      max(col("txn_date")).as("end_date"))

  /** A5/A6 + O1/O2: group-sum by key, reported with the value-ascending
    * rank the reference's sorted-dict output encodes
    * (transformer.py:212-213,234-237). Ties broken by key name so the
    * rank is deterministic.
    *
    * The rank is computed scale-safe: an unpartitioned
    * `Window.orderBy` would move ALL rows to a single partition — fine
    * at #distinct-vendors today, a one-task straggler at 100× the key
    * cardinality. `globalRank` range-partitions instead. */
  def keyTotals(tx: DataFrame, key: String): DataFrame =
    globalRank(
      tx.groupBy(col(key)).agg(moneySum(amt2).as("total")),
      Seq(col("total").asc, col(key).asc), "rank_asc")

  /** Distributed global row_number over a total order, with no
    * single-partition window anywhere in the plan:
    *  1. range-partition on the sort columns (partitions are ordered,
    *     non-overlapping ranges);
    *  2. row_number within each partition (parallel windows);
    *  3. add per-partition offsets = cumulative partition counts — a
    *     metadata-sized driver step (one long per partition, same class
    *     of driver state as AQE's per-partition stats).
    * The sort order must be total (no ties across all sortCols) for the
    * rank to be deterministic under repartitioning. The input is
    * localCheckpointed so the count pass and the output read one
    * materialization instead of recomputing the upstream aggregate. */
  def globalRank(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) => val o = acc; acc += cnt; (pid, o) }
    val offDf = offsets.toSeq.toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    parted
      .withColumn("_rn", row_number().over(w))
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn(outCol, (col("_offset") + col("_rn")).cast("long"))
      .drop("_pid", "_rn", "_offset")
  }

  /** Pareto / cumulative-contribution over key totals — the ABC
    * "top vendors cover X% of spend" analysis: keys ordered by total
    * DESC with the running cumulative total and its share of the grand
    * total. Distributed like `globalRank`: range partition on the
    * (total DESC, key ASC) total order, per-partition prefix sums, and
    * per-partition DECIMAL offsets (a metadata-sized driver step — one
    * decimal per partition). All sums are exact decimal; the ONE
    * double division per row happens off exact operands, so the output
    * is engine-portable. */
  def paretoContribution(tx: DataFrame, key: String): DataFrame = {
    val spark = tx.sparkSession
    import spark.implicits._
    val sortCols = Seq(col("total").desc, col(key).asc)
    val parted = tx.groupBy(col(key)).agg(sum(amt2).as("total"))
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = parted.groupBy(col("_pid")).agg(sum(col("total")).as("_ptot"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1))).sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO
    val offsets = parts.map { case (pid, t) => val o = acc; acc = acc.add(t); (pid, o) }
    val grand = acc
    val offDf = offsets.toSeq.toDF("_pid", "_off")
      .select(col("_pid"), col("_off").cast("decimal(30,2)").as("_off"))
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.withColumn("_run", sum(col("total")).over(w))
      .join(broadcast(offDf), Seq("_pid"))
      .select(col(key),
        col("total").cast("double").as("total_spent"),
        (col("_off") + col("_run")).cast("double").as("cum_spent"),
        ((col("_off") + col("_run")).cast("double")
          / lit(grand.doubleValue)).as("cum_share"))
  }

  /** Gini concentration coefficient of per-key totals — "how
    * concentrated is spend across vendors": 0 = perfectly even,
    * →1 = one key holds everything. Uses the rank formulation
    * G = (2·Σ rᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with x ranked ascending;
    * tied totals get consecutive ranks whose group contribution is
    * order-independent, so the result is deterministic under any
    * partitioning. Ranks come from the distributed `globalRank` (no
    * single-partition window); Σrx and Σx stay in exact decimal and
    * the ONE double division happens off exact operands. */
  def giniConcentration(tx: DataFrame, key: String): DataFrame = {
    val totals = tx.groupBy(col(key)).agg(sum(amt2).as("total"))
    val ranked = globalRank(totals, Seq(col("total").asc, col(key).asc), "_r")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("total")).as("_s"),
        sum(col("total") * col("_r")).as("_a"))
      .select(col("n_keys"),
        ((lit(2) * col("_a") - (col("n_keys") + 1) * col("_s")).cast("double")
          / (col("n_keys") * col("_s")).cast("double")).as("gini"))
  }

  /** A7/A8 + O4: distinct keys, one row per key (row-form of the sorted
    * distinct list; transformer.py:153-154,232-233). */
  def distinctKeys(tx: DataFrame, key: String): DataFrame =
    tx.select(col(key)).distinct()

  /** A7/A8 aggregate form: sorted distinct array + exact cardinality.
    * At 100 TB swap countDistinct for approx_count_distinct (HLL). */
  def uniqueKeySets(tx: DataFrame): DataFrame =
    tx.agg(
      sort_array(collect_set(col("category"))).as("unique_categories"),
      countDistinct(col("category")).as("n_categories"),
      sort_array(collect_set(col("vendor"))).as("unique_vendors"),
      countDistinct(col("vendor")).as("n_vendors"))

  /** Scalar (gate-hashable) form of the distinct sets: md5 of the
    * '|'-joined sorted set + exact cardinalities. Array columns crash
    * the driver's pandas-based compare harness (unhashable ndarray), so
    * the oracle-gated query emits only scalars; the array form above
    * remains the report-assembly surface. */
  def uniqueKeySetsDigest(tx: DataFrame): DataFrame =
    tx.agg(
      md5(array_join(sort_array(collect_set(col("category"))), "|")).as("categories_md5"),
      countDistinct(col("category")).as("n_categories"),
      md5(array_join(sort_array(collect_set(col("vendor"))), "|")).as("vendors_md5"),
      countDistinct(col("vendor")).as("n_vendors"))

  /** Per-(file,key) sums — the long form of the reference's pivot table
    * (transformer.py:217-218): rows = file dates, columns = keys, built
    * here as (txn_date, key, amount) without materializing the wide
    * shape. A10's within-file duplicate-key re-aggregation is inherent. */
  def bucketKeySums(tx: DataFrame, key: String): DataFrame =
    tx.groupBy(col("txn_date"), col(key))
      .agg(moneySum(amt2).as("amount"))

  /** The dense date×key grid with absent cells imputed 0.0 — pandas
    * `fillna(0)` over the pivot (transformer.py:217-218). The grid is
    * (#dates × #keys) rows regardless of input size, so the cross join
    * is tiny and broadcast. */
  def denseGrid(tx: DataFrame, key: String): DataFrame = {
    val dates = tx.select(col("txn_date")).distinct()
    val keys  = tx.select(col(key)).distinct()
    dates.crossJoin(broadcast(keys))
      .join(bucketKeySums(tx, key), Seq("txn_date", key), "left")
      .na.fill(0.0, Seq("amount"))
  }

  /** A9: zero-imputed per-key mean — sum over ALL file dates divided by
    * the number of file dates (transformer.py:225-226; NOT avg(), which
    * would divide by per-key row counts). The division runs in double on
    * an exact decimal sum, unrounded: deterministic bit-identical output
    * (rounding a post-division double would re-introduce engine-specific
    * round-boundary behavior). */
  def zeroImputedMean(tx: DataFrame, key: String): DataFrame = {
    val nDates = tx.select(col("txn_date")).distinct().count()
    tx.groupBy(col(key))
      .agg((moneySum(amt2) / lit(nDates.toDouble)).as("mean_amount"))
  }

  /** W1/W2: percent change of the latest file date vs its predecessor,
    * per key, over the zero-imputed dense grid (transformer.py:221-222).
    *
    * Two modes for the 0-predecessor edge (the one place engine and
    * reference-as-implemented can differ — see README "pct_change edge
    * semantics"):
    *  - default (`pandasInf = false`, what the oracle gates): a zero or
    *    missing predecessor yields 0.0 — the reference's own
    *    `.fillna(0)` already zeroes the leading row and 0→0; we extend
    *    the same rule to 0→x rather than emit infinities.
    *  - `pandasInf = true`: pandas-faithful — 0→x yields ±Infinity
    *    (pandas' (x-0)/0; `.fillna(0)` replaces only NaN, so the inf
    *    SURVIVES in the reference's report), while the leading row and
    *    0→0 produce NaN and ARE zeroed by fillna. */
  def pctChangeLatest(tx: DataFrame, key: String,
                      pandasInf: Boolean = false): DataFrame = {
    val w  = Window.partitionBy(col(key)).orderBy(col("txn_date").asc)
    val wl = Window.partitionBy(col(key)).orderBy(col("txn_date").desc)
    val pct =
      if (pandasInf)
        when(col("prev").isNull, lit(0.0))                                   // leading NaN -> fillna(0)
          .when(col("prev") === 0.0 && col("amount") === 0.0, lit(0.0))      // 0/0 NaN -> fillna(0)
          .when(col("prev") === 0.0 && col("amount") > 0.0, lit(Double.PositiveInfinity))
          .when(col("prev") === 0.0, lit(Double.NegativeInfinity))
          .otherwise((col("amount") - col("prev")) / col("prev"))
      else
        when(col("prev").isNull || col("prev") === 0.0, lit(0.0))
          .otherwise((col("amount") - col("prev")) / col("prev"))
    denseGrid(tx, key)
      .withColumn("prev", lag(col("amount"), 1).over(w))
      .withColumn("pct_change", pct)
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .select(col(key), col("pct_change"))
  }

  /** The WIDE pivot shape itself (SURVEY §1.1 row 2, J2): rows = file
    * dates, one column per category, absent cells 0. Explicit pivot
    * values keep the plan single-pass (no extra distinct scan) and the
    * output schema static. Long form is preferred everywhere else. */
  def pivotWide(tx: DataFrame, key: String, values: Seq[String]): DataFrame =
    tx.groupBy(col("txn_date"))
      .pivot(key, values)
      .agg(sum(amt2).cast("double"))
      .na.fill(0.0, values)

  /** The inverse of `pivotWide` (J2): melt the wide date×category grid
    * back to long form with Spark's native unpivot — round-trips with
    * the pivot (spec-pinned), so wide intermediates are never a
    * one-way door. Zero-filled cells survive as explicit rows, which
    * is the pivot's information content. */
  def unpivotWide(wide: DataFrame, key: String, values: Seq[String]): DataFrame =
    wide.unpivot(
      ids = Array(col("txn_date")),
      values = values.map(col).toArray,
      variableColumnName = key,
      valueColumnName = "amount")

  /** O3: "top-5" vendors = first 5 of the value-ASCENDING sort — the
    * reference's as-implemented quirk (transformer.py:240 labels the 5
    * LOWEST-spend vendors `top_5_vendors`). Plans as
    * TakeOrderedAndProject (distributed top-k, no global sort). */
  def top5Asc(tx: DataFrame, key: String): DataFrame =
    keyTotals(tx, key)
      .orderBy(col("total").asc, col(key).asc)
      .limit(5)
      .select(col(key), col("total"))

  /** Full report assembly (transformer.py:229-243 + P2's details
    * projection at :283): one row; ordered map-likes persisted as
    * arrays of (key,total) structs so output hashing is deterministic.
    */
  def report(tx: DataFrame): DataFrame = {
    val g = globalSummary(tx)
    val catTotals = keyTotals(tx, "category")
      .orderBy(col("rank_asc")).select(struct(col("category"), col("total")).as("kv"))
      .agg(collect_list(col("kv")).as("spending_per_category"))
    val venTotals = keyTotals(tx, "vendor")
      .orderBy(col("rank_asc")).select(struct(col("vendor"), col("total")).as("kv"))
      .agg(collect_list(col("kv")).as("spending_per_vendor"))
    val catPct = pctChangeLatest(tx, "category")
      .select(struct(col("category"), col("pct_change")).as("kv"))
      .agg(sort_array(collect_list(col("kv"))).as("pct_change_category"))
    val venPct = pctChangeLatest(tx, "vendor")
      .select(struct(col("vendor"), col("pct_change")).as("kv"))
      .agg(sort_array(collect_list(col("kv"))).as("pct_change_vendor"))
    val catMean = zeroImputedMean(tx, "category")
      .select(struct(col("category"), col("mean_amount")).as("kv"))
      .agg(sort_array(collect_list(col("kv"))).as("avg_category"))
    val venMean = zeroImputedMean(tx, "vendor")
      .select(struct(col("vendor"), col("mean_amount")).as("kv"))
      .agg(sort_array(collect_list(col("kv"))).as("avg_vendor"))
    val top5 = top5Asc(tx, "vendor")
      .select(struct(col("vendor"), col("total")).as("kv"))
      .agg(collect_list(col("kv")).as("top_5_vendors"))
    val uniq = uniqueKeySets(tx)

    // All sides are single-row aggregates -> broadcast-nested-loop cross
    // joins of 1x1 rows; cost is the underlying aggs, not the joins.
    val row = g.crossJoin(uniq).crossJoin(catTotals).crossJoin(venTotals)
      .crossJoin(catPct).crossJoin(venPct).crossJoin(catMean).crossJoin(venMean)
      .crossJoin(top5)

    // P2: details = report minus (begin_date, end_date, fi_summary).
    val detailCols = Seq("total_spent", "total_transactions",
      "unique_categories", "unique_vendors", "spending_per_category",
      "pct_change_category", "avg_category", "spending_per_vendor",
      "pct_change_vendor", "avg_vendor", "top_5_vendors")
    // details ships BOTH ways: the JSON string (engine-portable, what
    // the oracle and fingerprints hash) and the true Spark 4 VARIANT
    // (the literal analog of the reference's Snowflake VARIANT column,
    // README.md:44-52 — typed extraction without re-parsing).
    row.withColumn("details", to_json(struct(detailCols.map(col): _*)))
      .withColumn("details_variant", parse_json(to_json(struct(detailCols.map(col): _*))))
      .withColumn("id", expr("uuid()"))
      .withColumn("created_at", current_date())
  }

  /** Report + fi_summary enrichment (driver-side single-row step,
    * §2.10): collects the one report row, renders the executive summary
    * via the supplied function (deterministic stub by default), and
    * returns the final file_details-shaped row. */
  def enriched(tx: DataFrame,
               summarize: ReportFields => String = Summarizer.stub): DataFrame = {
    val r = report(tx).cache()
    val row = r.select("begin_date", "end_date", "total_spent",
      "total_transactions", "unique_categories").head()
    val fields = ReportFields(
      beginDate = row.getDate(0).toString,
      endDate = row.getDate(1).toString,
      totalSpent = row.getDouble(2),
      totalTransactions = row.getLong(3),
      topCategories = row.getSeq[String](4))
    r.withColumn("fi_summary", lit(summarize(fields)))
  }

  /** Robust per-key stats: the mean of values inside the key's own
    * [loQ, hiQ] quantile band — the outlier-resistant aggregate a
    * spend/metrics surface reports next to the raw mean. Two grouped
    * passes over the input (quantile bounds, then the trimmed sum) with
    * the key-sized bounds broadcast between them — no sort of the full
    * data, no per-key collect. Quantiles use the exact interpolated
    * `percentile` (bit-matching DuckDB's quantile_cont, proven by
    * q_percentiles); the kept-range sum runs in DECIMAL space so the
    * mean is one IEEE double division of exact quantities. */
  def trimmedMean(tx: DataFrame, key: String = "category",
                  valCol: String = "amount",
                  loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(0.0 <= loQ && loQ < hiQ && hiQ <= 1.0, s"need 0<=lo<hi<=1, got $loQ,$hiQ")
    val bounds = tx.groupBy(col(key))
      .agg(expr(s"percentile($valCol, $loQ)").as("lo"),
           expr(s"percentile($valCol, $hiQ)").as("hi"))
      .localCheckpoint()  // key-sized; joined below and projected out
    tx.join(broadcast(bounds), Seq(key))
      .filter(col(valCol) >= col("lo") && col(valCol) <= col("hi"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_kept"),
           sum(col(valCol).cast("decimal(14,2)")).as("_sum"))
      .join(broadcast(bounds), Seq(key))
      .select(col(key), col("lo"), col("hi"), col("n_kept"),
        (col("_sum").cast("double") / col("n_kept")).as("trimmed_mean"))
  }

  /** Median absolute deviation per key — the robust spread companion to
    * `trimmedMean`'s robust center: mad = median(|x − median(x)|).
    * Same two-pass shape (key-sized medians broadcast back onto the
    * data); both medians are the exact interpolated `percentile`, and
    * |x − m| is a single IEEE subtraction of doubles, so the result is
    * bit-identical across engines. */
  def madByKey(tx: DataFrame, key: String = "category",
               valCol: String = "amount"): DataFrame = {
    val med = tx.groupBy(col(key))
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
      .localCheckpoint()  // key-sized; broadcast below, kept in output
    tx.join(broadcast(med), Seq(key))
      .groupBy(col(key), col("med"))
      .agg(expr(s"percentile(abs($valCol - med), 0.5)").as("mad"),
           count(lit(1)).as("n"))
      .select(col(key), col("med"), col("mad"), col("n"))
  }
}

/** The collected report fields handed to the enrichment step. */
final case class ReportFields(
    beginDate: String, endDate: String, totalSpent: Double,
    totalTransactions: Long, topCategories: Seq[String])

/** §2.10: the reference's Gemini executive-summary call
  * (transformer.py:245-278) is a driver-side, single-row,
  * post-aggregation step — NOT a per-row UDF. Behind a function value so
  * tests (and the zero-egress environment) use the deterministic stub,
  * mirroring the reference's own fallback-on-error behavior
  * (transformer.py:276-278). */
object Summarizer {
  val stub: ReportFields => String = r =>
    s"Between ${r.beginDate} and ${r.endDate} you spent ${r.totalSpent} " +
      s"across ${r.totalTransactions} transactions; top categories: " +
      r.topCategories.mkString(", ") + "."
}
