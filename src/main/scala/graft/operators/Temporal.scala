package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's inventory — the shapes a
  * period-report engine grows into at scale (SURVEY §2.5's "absent"
  * list, implemented Spark-first).
  *
  * The as-of join follows preference order (a) from the build contract:
  * composed from built-ins (union + window) rather than a custom
  * physical operator — one shuffle on (key), no O(n·m) inequality join.
  */
object Temporal {

  /** AS-OF JOIN: for each left row, the single right row with the
    * greatest `rightTs <= leftTs` for the same key. Implemented as the
    * classic union-tag-window plan:
    *   union(left tagged 0, right tagged 1)
    *   -> window per key ordered by (ts, tag desc):
    *      last non-null right payload at or before each left row
    * Cost: ONE shuffle on the key (the window partition), linear scan
    * per partition — versus a BroadcastNestedLoop inequality join's
    * O(left × right). This is the 100 TB-safe shape.
    *
    * left must have (key, ts [+ payload]); right (key, ts, rightVal).
    * Output: left columns + `asof_ts` + `asof_val` (null if no prior
    * right row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, leftTs: String, rightTs: String,
               rightVal: String): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightVal, forward = false)

  /** Forward AS-OF JOIN: for each left row, the single right row with
    * the SMALLEST `rightTs >= leftTs` for the same key (the "next
    * quote/next event" lookup). Same union-tag-window shape scanned in
    * descending time order — still ONE shuffle on the key. */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      key: String, leftTs: String, rightTs: String,
                      rightVal: String): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, rightVal, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame,
                       key: String, leftTs: String, rightTs: String,
                       rightVal: String, forward: Boolean): DataFrame = {
    val l = left.withColumn("_tag", lit(0))
      .withColumn("_ts", col(leftTs))
      .withColumn("_rts", lit(null).cast(right.schema(rightTs).dataType))
      .withColumn("_rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(
      col(key),
      lit(1).as("_tag"),
      col(rightTs).as("_ts"),
      col(rightTs).as("_rts"),
      col(rightVal).as("_rv"))
    val lCols = left.columns.toSeq
    // Align schemas: right side carries nulls for left payload columns.
    val rAligned = lCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((lCols.map(col) :+ col("_tag") :+ col("_ts") :+ col("_rts") :+ col("_rv")): _*)
    val unioned = l.select((lCols.map(col) :+ col("_tag") :+ col("_ts") :+ col("_rts") :+ col("_rv")): _*)
      .unionByName(rAligned)
    // Window: right rows (tag 1) sort BEFORE left rows at equal ts so a
    // right row at exactly leftTs is visible (<=/>= semantics). The
    // forward variant scans time DESCENDING — "last right seen" then
    // means "nearest right at-or-after".
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("_ts").desc else col("_ts").asc, col("_tag").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .withColumn("asof_val", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
      .drop("_tag", "_ts", "_rts", "_rv")
  }

  /** Sessionization: gap-based session ids per user — a new session
    * starts when the gap to the previous event exceeds `gapMinutes`.
    * One shuffle (window by user); session_id = cumulative count of
    * session starts, stable and deterministic. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(wRun))
      .drop("_prev_ts", "_new_session")
  }

  /** Session summary: per (user, session) — span, event count, value
    * sum (decimal-exact). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapMinutes: Int): DataFrame =
    sessionize(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(14,2)")).cast("double").as("session_value"))

  /** Running (cumulative) daily spend per category — frame-spec window
    * (rowsBetween unbounded preceding), decimal-exact. */
  def runningDailySpend(tx: DataFrame): DataFrame = {
    val daily = tx.groupBy(col("category"), col("txn_date"))
      .agg(sum(col("amount").cast("decimal(14,2)")).as("day_total"))
    val w = Window.partitionBy(col("category")).orderBy(col("txn_date").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("running_total", sum(col("day_total")).over(w).cast("double"))
      .withColumn("day_total", col("day_total").cast("double"))
  }

  /** CUBE over (category, txn_date) — full grouping-sets coverage
    * (SURVEY §2.4 "absent" row). Two-phase like
    * Relational.rollupQtyByFlagStatus: groupBy the finest grouping
    * first so Expand (×4 grouping sets for CUBE) multiplies only the
    * tiny pre-aggregate, never the input scan; decimal partial sums
    * re-aggregate exactly. */
  def cubeSpend(tx: DataFrame): DataFrame = {
    val pre = tx.groupBy(col("category"), col("txn_date"))
      .agg(sum(col("amount").cast("decimal(14,2)")).as("_ts"),
           count(lit(1)).as("_n"))
    pre.cube(col("category"), col("txn_date"))
      .agg(sum(col("_ts")).cast("double").as("total_spent"),
           sum(col("_n")).as("n"))
  }

  /** Explicit GROUPING SETS — the full grouping-sets family alongside
    * rollup/cube, same two-phase shape (Expand only ever multiplies
    * the tiny pre-aggregate; decimal partial sums re-aggregate
    * exactly). Sets: (category), (vendor), (category, vendor), (). */
  def groupingSetsSpend(tx: DataFrame): DataFrame = {
    val pre = tx.groupBy(col("category"), col("vendor"))
      .agg(sum(col("amount").cast("decimal(14,2)")).as("_ts"),
           count(lit(1)).as("_n"))
    pre.groupingSets(
        Seq(Seq(col("category")), Seq(col("vendor")),
          Seq(col("category"), col("vendor")), Seq.empty),
        col("category"), col("vendor"))
      .agg(sum(col("_ts")).cast("double").as("total_spent"),
           sum(col("_n")).as("n"))
  }

  /** Moving k-day spend per category — a RANGE frame over the day
    * offset (gaps in the calendar contribute nothing, unlike a ROWS
    * frame which would span k previous PRESENT days). One shuffle on
    * category; the frame arithmetic is engine-portable integer day
    * offsets, sums decimal-exact. */
  def movingDailySpend(tx: DataFrame, days: Int): DataFrame = {
    val daily = tx.groupBy(col("category"), col("txn_date"))
      .agg(sum(col("amount").cast("decimal(14,2)")).as("day_total"))
      .withColumn("_day", datediff(col("txn_date"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("category")).orderBy(col("_day"))
      .rangeBetween(-(days - 1).toLong, 0)
    daily
      .withColumn("moving_total", sum(col("day_total")).over(w).cast("double"))
      .withColumn("day_total", col("day_total").cast("double"))
      .select(col("category"), col("txn_date"), col("day_total"), col("moving_total"))
  }

  /** Running distinct-entity count per day — "how many unique users
    * have we EVER seen, by day": windowed COUNT(DISTINCT) is
    * unsupported and would be quadratic anyway; the scalable identity
    * is first-seen day per entity (one key-keyed min) → per-day
    * first-seen counts → a running sum over the day-cardinality
    * frame. Integer arithmetic throughout. Days with no first-seens
    * emit no row (the cumulative count is carried by later rows). */
  def cumulativeDistinct(events: DataFrame, key: String, tsCol: String): DataFrame = {
    val firstSeen = events
      .groupBy(col(key))
      .agg(min(to_date(col(tsCol))).as("first_day"))
    val w = Window.orderBy(col("first_day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstSeen.groupBy(col("first_day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("n_cumulative", sum(col("n_new")).over(w).cast("long"))
      .select(col("first_day"), col("n_new"), col("n_cumulative"))
  }

  /** Time-weighted average value per key — the irregular-sampling mean
    * a plain avg() gets wrong: each observation holds until the NEXT
    * one, so it is weighted by its holding duration (lead(ts) - ts in
    * exact microseconds). Keys with fewer than two events emit no row
    * (no holding interval exists). One key-partitioned sort feeds the
    * lead window and the aggregation; value×duration products stay in
    * exact DECIMAL×BIGINT arithmetic and the ONE double division per
    * key happens off exact operands (engine-portable). Durations are
    * MILLISECONDS via integer division of the µs delta: µs-scale
    * products push the weighted sums past 2^53, where decimal→double
    * casts stop being exactly representable and the engines' cast
    * roundings diverge (the known 2^53 gate class) — ms keeps every
    * sum exactly representable at any fixture scale. A key with ≥2
    * events that ALL share one timestamp has zero total holding time:
    * no time-weighted mean exists (0/0), so the key emits no row —
    * the same contract as <2 events, and it keeps NaN (a cross-engine
    * rendering hazard) out of the gated output. */
  def timeWeightedValue(events: DataFrame, key: String, tsCol: String,
                        valCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).asc, col("event_id").asc)
    val us = unix_micros(col(tsCol))
    events
      // floor((µs delta)/1000) == the integer // : deltas are exact
      // doubles far below 2^53 and non-multiples of 1000 sit ≥0.001
      // from the next integer (≫ one ulp), multiples divide exactly
      .withColumn("_dur", floor((lead(us, 1).over(w) - us) / lit(1000)).cast("long"))
      .filter(col("_dur").isNotNull)
      .groupBy(col(key))
      .agg(
        sum(col(valCol).cast("decimal(14,2)") * col("_dur")).as("_wsum"),
        sum(col("_dur")).as("_dsum"),
        count(lit(1)).as("n_intervals"))
      .filter(col("_dsum") > 0)
      .select(col(key),
        (col("_wsum").cast("double") / col("_dsum").cast("double")).as("tw_avg"),
        col("n_intervals"))
  }

  /** LOCF gap-fill — time-series regularization: per (category, day)
    * over the corpus's full [min, max] date span, the daily spend with
    * missing days filled by the last observed day's total
    * (last-observation-carried-forward). The dense grid is
    * calendar × category dictionary — metadata-sized relative to the
    * fact table — so the crossJoin is a broadcast of two tiny sides;
    * the fact table contributes one grouped aggregation and the
    * carry-forward is a per-category ordered window (one shuffle on
    * the dictionary key). Sums stay in DECIMAL until the final cast;
    * days before a category's first observation stay NULL (there is
    * nothing to carry). */
  def locfDailySpend(tx: DataFrame): DataFrame = {
    val daily = tx.groupBy(col("category"), col("txn_date"))
      .agg(sum(col("amount").cast("decimal(14,2)")).as("_day"))
    val span = tx.agg(min(col("txn_date")).as("_mn"), max(col("txn_date")).as("_mx"))
    val days = span.select(explode(expr("sequence(_mn, _mx, interval 1 day)")).as("txn_date"))
    val cats = tx.select(col("category")).distinct()
    val w = Window.partitionBy(col("category")).orderBy(col("txn_date").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.crossJoin(cats)
      .join(daily, Seq("category", "txn_date"), "left")
      .withColumn("_filled", last(col("_day"), ignoreNulls = true).over(w))
      .select(col("category"), col("txn_date"),
        col("_day").cast("double").as("day_total"),
        col("_filled").cast("double").as("filled_total"))
  }

  /** RANGE (interval) JOIN, bucketed: count points whose timestamp
    * falls inside each [start, end) interval — with NO equi key. The
    * naive plan is a BroadcastNestedLoop O(points × intervals); the
    * scalable form maps both sides onto day buckets (an interval of
    * bounded length covers few buckets), equi-joins on the bucket, and
    * post-filters exact containment — O(points + intervals·buckets)
    * with an ordinary hash join. `maxDays` is ENFORCED, and the
    * enforcement is VISIBLE: intervals spanning >= maxDays are not
    * counted (the bucket fan-out is one row per covered day, so an
    * unbounded interval would silently explode the join input) but
    * they are still emitted, with `n_points = NULL` as the sentinel —
    * callers see exactly which intervals exceeded the bound instead of
    * silently receiving fewer rows. NULL cannot collide with a real
    * count: zero-point intervals produce no row at all (inner join).
    * Callers wanting long intervals counted must raise the bound
    * explicitly. */
  def countPointsInIntervals(points: DataFrame, tsCol: String,
                             intervals: DataFrame, maxDays: Int): DataFrame = {
    val p = points.select(to_date(col(tsCol)).as("bucket"), col(tsCol).as("_pts"))
    val span = datediff(to_date(col("ival_end")), to_date(col("ival_start")))
    val i = intervals
      .filter(span < maxDays)
      .withColumn("bucket",
        explode(expr("sequence(to_date(ival_start), to_date(ival_end), interval 1 day)")))
    val counted = i.join(p, Seq("bucket"))
      .filter(col("_pts") >= col("ival_start") && col("_pts") < col("ival_end"))
      .groupBy(col("ival_id"), col("ival_start"), col("ival_end"))
      .agg(count(lit(1)).as("n_points"))
    val excluded = intervals
      .filter(span >= maxDays)
      .select(col("ival_id"), col("ival_start"), col("ival_end"),
        lit(null).cast("long").as("n_points"))
    counted.unionByName(excluded)
  }

  /** Ordered event funnel — sequential step conversion: a user reaches
    * step i only via a step-i event that happens AFTER a completed
    * step-(i-1) chain (strict sequencing, not per-step minima — a
    * purchase before any view does not count a purchase-step user).
    *
    * Single user-keyed shuffle: chained running-min window columns over
    * one (user, ts)-sorted pass — `_r(i)` at a row is the earliest
    * completion of the step-i chain at-or-before that row, and each
    * step-i event qualifies iff `_r(i-1)` is already non-null. Spark
    * plans the chain as stacked Window operators over the SAME
    * partitioning and sort, so adding steps adds no exchange. Ties at
    * identical timestamps resolve by (ts, type) order — deterministic
    * and mirrored by the oracle. Output: one row per step with user
    * counts and conversion fractions (double divisions of exact
    * integers; step-0's frac_of_prev is literal 1.0). */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id",
             tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(typeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s && col(s"_r${i - 1}").isNotNull
      df = df.withColumn(s"_r$i", min(when(cond, col(tsCol))).over(w))
    }
    val perUser = df.groupBy(col(userCol))
      .agg(min(col("_r0")).as("_t0"),
        steps.indices.tail.map(i => min(col(s"_r$i")).as(s"_t$i")): _*)
    val counts = perUser
      .agg(count(col("_t0")).as("n0"),
        steps.indices.tail.map(i => count(col(s"_t$i")).as(s"n$i")): _*)
      .localCheckpoint()  // one row; consumed once per step below
    // 0/0 (an empty funnel) must be NaN like DuckDB's double division,
    // not an ANSI DIVIDE_BY_ZERO throw; counts satisfy n_i <= n_{i-1},
    // so a zero divisor always means a zero dividend.
    def frac(num: Column, den: Column): Column =
      when(den === 0L, lit(Double.NaN)).otherwise(num.cast("double") / den)
    steps.zipWithIndex.map { case (s, i) =>
      counts.select(
        lit(i.toLong).as("step_idx"), lit(s).as("step"),
        col(s"n$i").as("n_users"),
        frac(col(s"n$i"), col("n0")).as("frac_of_first"),
        (if (i == 0) lit(1.0)
         else frac(col(s"n$i"), col(s"n${i - 1}"))).as("frac_of_prev"))
    }.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention — the activation/stickiness matrix every
    * product-analytics surface computes over an events stream: users
    * are cohorted by the ISO week (Monday-truncated in both Spark and
    * DuckDB) of their FIRST event, and each (cohort_week, week_offset)
    * cell counts the cohort's users active in that later week.
    *
    * Single user-keyed shuffle: one aggregation collects each user's
    * first week AND distinct active-week set together (the set is
    * bounded by the calendar, not the event count), one explode turns
    * the set into (cohort, offset) rows, and one aggregation over the
    * calendar-sized cell space counts them. The naive 3-shuffle form
    * (min-per-user, distinct user-weeks, re-join on user) shuffles the
    * events twice; this shuffles them once. Cohort sizes are the
    * offset-0 cells themselves (every user is active in their own first
    * week by construction), broadcast back onto the matrix — no second
    * pass over events. Offsets are exact integer division of
    * day-differences between week starts; retention is a single double
    * division of exact integers (engine-portable). */
  def retentionCohorts(events: DataFrame,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val week = date_trunc("week", col(tsCol)).cast("date")
    val cells = events
      .select(col(userCol).as("_u"), week.as("_week"))
      .groupBy(col("_u"))
      .agg(min(col("_week")).as("cohort_week"),
           collect_set(col("_week")).as("_weeks"))
      .select(col("cohort_week"), explode(col("_weeks")).as("_week"))
      .withColumn("week_offset",
        expr("CAST(datediff(_week, cohort_week) DIV 7 AS BIGINT)"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .localCheckpoint()  // calendar² rows; two consumers below
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("n_cohort"))
    cells.join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
  }

  /** Basket co-occurrence — association mining over per-(user, day)
    * event-type baskets: for each unordered type pair (a < b), the
    * number of baskets containing BOTH, each type's basket support,
    * and the lift n_ab·N / (n_a·n_b) — like `collocations`' PMI, kept
    * log-free as ONE IEEE division of two exact BIGINT products so the
    * oracle reproduces it bit-for-bit. The basket frame (distinct
    * user-day-type) is checkpointed once and feeds all four consumers
    * (both self-join sides, supports, basket count); the self-join is
    * keyed on (user, day) and each basket holds at most |type| rows,
    * so the pair fan-out is bounded by the TYPE dictionary, never
    * basket-quadratic in data. */
  def basketCooccurrence(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String): DataFrame = {
    val b = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_day"),
        col(typeCol).as("_t"))
      .distinct()
      .localCheckpoint()
    val nBaskets = b.select(col("_u"), col("_day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val support = b.groupBy(col("_t")).agg(count(lit(1)).as("n_t"))
    val pairs = b.as("x")
      .join(b.as("y"),
        col("x._u") === col("y._u") && col("x._day") === col("y._day") &&
          col("x._t") < col("y._t"))
      .groupBy(col("x._t").as("type_a"), col("y._t").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(support.select(col("_t").as("type_a"),
        col("n_t").as("n_a"))), Seq("type_a"))
      .join(broadcast(support.select(col("_t").as("type_b"),
        col("n_t").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift",
        (col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"), col("lift"))
  }

  /** Lag-k autocorrelation of each key's DAILY total series — the
    * seasonality detector behind `seasonalAnomalies`' fixed weekday
    * model: autocorr at lag 7 ≈ 1 means a strong weekly cycle. Pairs
    * (value_{t−k}, value_t) align only where a row EXACTLY k calendar
    * days earlier exists (lag(k) + datediff guard — row-offset lag
    * alone would silently misalign across gaps). Pearson over the
    * pairs follows the q_corr_lineitem discipline: decimal-exact
    * moment sums (order-independent), every double a fixed mirrored
    * combination of exact operands, degenerate variances emit NULL.
    * One keys×days grid agg + one key window + a key-sized final agg. */
  def lagAutocorr(tx: DataFrame, keyCol: String, dateCol: String,
                  amtCol: String, lagDays: Int): DataFrame = {
    def d2(c: Column) = c.cast("string").cast("double")
    val daily = tx.groupBy(col(keyCol), col(dateCol).as("day"))
      .agg(sum(col(amtCol).cast("decimal(14,2)")).cast("decimal(14,2)").as("_y"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    val pairs = daily
      .withColumn("_xday", lag(col("day"), lagDays).over(w))
      .withColumn("_x", lag(col("_y"), lagDays).over(w))
      .filter(col("_x").isNotNull &&
        datediff(col("day"), col("_xday")) === lagDays)
    val agg = pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum((col("_x") * col("_y")).cast("decimal(34,4)")).as("_sxy"),
        sum((col("_x") * col("_x")).cast("decimal(34,4)")).as("_sxx"),
        sum((col("_y") * col("_y")).cast("decimal(34,4)")).as("_syy"))
    val n = col("n_pairs").cast("double")
    val varx = n * d2(col("_sxx")) - d2(col("_sx")) * d2(col("_sx"))
    val vary = n * d2(col("_syy")) - d2(col("_sy")) * d2(col("_sy"))
    agg.filter(col("n_pairs") >= 2)
      .select(col(keyCol), col("n_pairs"),
        when(varx > 0 && vary > 0,
          (n * d2(col("_sxy")) - d2(col("_sx")) * d2(col("_sy"))) /
            (sqrt(varx) * sqrt(vary))).as("autocorr"))
  }

  /** Conversion lag — funnel timing: for each user, the time from the
    * FIRST `fromType` event to the first `toType` event AT OR AFTER it
    * (a later conversion still counts even when an earlier stray
    * `toType` predates the first touch), rolled up into a whole-day
    * lag histogram with the exact mean lag per bucket. All arithmetic
    * is integer µs→sec→day floor division (`div`), so the oracle
    * reproduces the buckets bit-for-bit; the single mean division is
    * the only FP op. Scale: first-touch agg, the conversion join, and
    * the per-user min all key on the user — one user shuffle reused
    * across the chain — and the histogram agg is day-bucket-sized. */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String,
                    toType: String): DataFrame = {
    val e = events.select(col(userCol).as("_u"), col(tsCol).as("_ts"),
      col(typeCol).as("_t"))
    val first = e.filter(col("_t") === fromType)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_t0"))
    val lags = e.filter(col("_t") === toType)
      .join(first, Seq("_u"))
      .filter(col("_ts") >= col("_t0"))
      .groupBy(col("_u"), col("_t0")).agg(min(col("_ts")).as("_t1"))
      .withColumn("_lag_sec",
        expr("(unix_micros(_t1) - unix_micros(_t0)) div 1000000"))
    lags
      .groupBy(expr("_lag_sec div 86400").as("lag_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_lag_sec")).as("_s"))
      .withColumn("avg_lag_sec",
        col("_s").cast("double") / col("n_users").cast("double"))
      .select(col("lag_days"), col("n_users"), col("avg_lag_sec"))
  }

  /** Frequent 3-step behavioral paths — sequence mining: the top-k
    * (t1, t2, t3) windows of three CONSECUTIVE events in each user's
    * stream, ordered by the same total (ts, event_id) order every
    * temporal operator here uses. One user-keyed window (two leads
    * share it), one type³-bounded count agg, and a deterministic
    * top-k (count desc, path asc) that plans as TakeOrderedAndProject
    * — no global sort. */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col("event_id").asc)
    events
      .select(col(userCol), col(tsCol), col("event_id"),
        col(typeCol).as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1").asc, col("t2").asc, col("t3").asc)
      .limit(k)
  }

  /** Event transition matrix — Markov-style behavioral analytics: per
    * ordered user stream, the count of each (prev_type → next_type)
    * step and its share of all transitions leaving prev_type (the
    * empirical transition probability). The per-user order is the
    * TOTAL (ts, event_id) order — same-timestamp ties break on the
    * unique event id, so each lag pair is deterministic and
    * engine-portable (the oracle mirrors the tie-break and the µs
    * truncation). Share is one division of two exact counts — a
    * fixed IEEE expression identical in both engines.
    * Shape: ONE user-keyed sort window produces the pairs, one
    * (prev, next) hash agg counts them; the per-prev totals frame is
    * type²-sized and broadcast back — the event stream shuffles
    * once on user and once into the tiny count grid. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col("event_id").asc)
    val counts = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("_prev").as("prev_type"), col(typeCol).as("next_type"),
        col("n"))
      .localCheckpoint()  // type²-sized; shared by totals + the join
    val totals = counts.groupBy(col("prev_type")).agg(sum(col("n")).as("_tot"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .withColumn("share", col("n").cast("double") / col("_tot").cast("double"))
      .drop("_tot")
  }

  /** Peak concurrency — the sweep-line interval-stacking operator
    * ("max concurrent sessions/users"): each interval emits +1 at its
    * start and -1 at its (exclusive) end; the running sum of deltas in
    * (t, delta) order is the instantaneous concurrency (at a shared
    * instant the -1s order before the +1s, i.e. level = intervals with
    * start <= t < end), and the per-day output is the MAX level over
    * that day's boundary instants plus the day's interval-start count.
    * Ties beyond (t, delta) need no break: a run of equal (t, delta)
    * deltas contributes the same prefix-value SET under any
    * permutation, so per-day max is order-invariant — deterministic
    * and engine-portable without a total order.
    * Shape: the global prefix sum is the `globalRank` pattern — range
    * partition on (t, delta), per-partition window sums, per-partition
    * delta totals folded into metadata-sized offsets (one long per
    * partition) broadcast back — no single-partition window; then one
    * day-keyed agg. */
  def peakConcurrency(intervals: DataFrame, startCol: String,
                      endCol: String): DataFrame = {
    val spark = intervals.sparkSession
    import spark.implicits._
    val deltas = intervals.select(col(startCol).as("t"), lit(1L).as("d"))
      .unionAll(intervals.select(col(endCol).as("t"), lit(-1L).as("d")))
    val sortCols = Seq(col("t").asc, col("d").asc)
    val parted = deltas.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = parted.groupBy(col("_pid")).agg(sum(col("d")).as("_pd"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = parts.map { case (pid, s) => val o = acc; acc += s; (pid, o) }
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.withColumn("_run", sum(col("d")).over(w))
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn("_lvl", col("_off") + col("_run"))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("_lvl")).as("peak_concurrent"),
           sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"))
  }

  /** OHLC downsampling — the time-series "resample to bars" operator:
    * per (key, day) the opening/closing values by event time plus
    * high/low/count/total. Open and close are `min_by`/`max_by` over
    * the TOTAL order (ts, event_id) — same-timestamp ties break on the
    * unique event id, so the bar is deterministic and engine-portable
    * (the oracle mirrors the tie-break via dual row_numbers). Values
    * aggregate in exact DECIMAL; doubles only at the output edge.
    * Shape: ONE hash aggregation keyed on (key, day) — min_by/max_by
    * are ordinary partial-merge aggregates, so bars build map-side;
    * no window, no sort, no per-key partition. */
  def ohlcBars(events: DataFrame, key: String, ts: String,
               value: String): DataFrame = {
    val v = col(value).cast("decimal(14,2)")
    val ord = struct(col(ts), col("event_id"))
    events
      .groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(
        min_by(v, ord).cast("double").as("open"),
        max(v).cast("double").as("high"),
        min(v).cast("double").as("low"),
        max_by(v, ord).cast("double").as("close"),
        count(lit(1)).as("n_events"),
        sum(v).cast("double").as("total_value"))
  }
}
