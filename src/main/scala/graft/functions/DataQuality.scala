package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-health diagnostics — the monitoring queries a training-data
  * pipeline runs on every snapshot before it ships: value-outlier
  * detection, categorical distribution drift between time slices,
  * per-source duplication rates, and per-key coverage gaps.
  *
  * All four are oracle-gated, which constrains the arithmetic:
  * moments are summed exactly in DECIMAL space (order-independent),
  * every double expression is a fixed left-to-right combination of
  * exact operands (IEEE +,-,*,/,sqrt are correctly rounded in both
  * engines, so identical operands give identical bits), and scores are
  * log-free by design (transcendentals diverge cross-engine — same
  * rationale as Collocations' lift).
  */
object DataQuality {

  /** Referential-integrity audit — per foreign-key relation, the child
    * row count and the number of ORPHANS (child rows whose key has no
    * parent): the join-soundness check a lakehouse runs before
    * promoting a snapshot, since every downstream inner join silently
    * DROPS orphaned rows. `relations` is (name, child, fkCol, parent,
    * pkCol).
    *
    * One-scan discipline (the Profiler rule, r13): relations sharing a
    * CHILD plan fuse onto a single scan of it — the child's fk columns
    * left-join every parent's DISTINCT key projection in one chain,
    * then ONE aggregate emits the shared row count plus a null-count
    * per relation (a fact that is child to 3 dims, like lineitem, is
    * read once instead of 6 times — 3 scalar counts + 3 anti probes in
    * the r12 shape). The parent-side distinct makes the left-join
    * count-exact under ANY input (a duplicated parent key can never
    * multiply child rows, so n_child reads off the same aggregate),
    * and its exchange co-partitions the parent for the join it feeds.
    * Orphan semantics are unchanged: distinct does not affect
    * match-existence, so the DuckDB oracle keeps its plain LEFT JOIN
    * per relation. Output: one (relation, n_child, n_orphans) row per
    * relation, exploded from the per-child 1-row aggregate. */
  def referentialIntegrity(relations: Seq[(String, DataFrame, String,
      DataFrame, String)]): DataFrame = {
    // Group relations on the child's analyzed plan (sameResult), in
    // first-appearance order so the output row order is stable.
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(DataFrame, scala.collection.mutable.ArrayBuffer[(String, String, DataFrame, String)])]
    relations.foreach { case (name, child, fkCol, parent, pkCol) =>
      groups.find(_._1.queryExecution.analyzed
          .sameResult(child.queryExecution.analyzed)) match {
        case Some((_, rels)) => rels += ((name, fkCol, parent, pkCol))
        case None => groups += ((child,
          scala.collection.mutable.ArrayBuffer((name, fkCol, parent, pkCol))))
      }
    }
    groups.toList.map { case (child, relsBuf) =>
      val rels = relsBuf.toList
      val fks = rels.map(_._2).distinct
      val joined = rels.zipWithIndex.foldLeft(
          child.select(fks.map(col): _*)) {
        case (acc, ((_, fkCol, parent, pkCol), i)) =>
          acc.join(parent.select(col(pkCol).as(s"_pk$i")).distinct(),
            col(fkCol) === col(s"_pk$i"), "left")
      }
      // coalesce: sum over an EMPTY child is NULL, but the audit row
      // for an empty table is (name, 0, 0)
      val aggCols = count(lit(1)).as("n_child") +:
        rels.indices.map(i =>
          coalesce(sum(when(col(s"_pk$i").isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"_o$i"))
      val one = joined.agg(aggCols.head, aggCols.tail: _*)
      one.select(explode(array(rels.zipWithIndex.map { case ((name, _, _, _), i) =>
          struct(lit(name).as("relation"), col("n_child"),
            col(s"_o$i").as("n_orphans"))
        }: _*)).as("_r"))
        .select(col("_r.relation"), col("_r.n_child"), col("_r.n_orphans"))
    }.reduce(_.unionByName(_))
  }

  /** Z-score outliers per group: rows whose value sits more than
    * `zThreshold` sample standard deviations from their group mean.
    * Two passes over the fact: one grouped moment aggregation
    * (decimal Σx, Σx² — tiny output, broadcast back), one map-side
    * filter. No window, no sort; at 100 TB the stats side is
    * KB-sized and the flagging pass is embarrassingly parallel.
    * Degenerate groups (n<2 or zero variance) flag nothing. */
  def outliers(tx: DataFrame, groupCol: String, valueCol: String,
               zThreshold: Double): DataFrame = {
    // q_spend_stats' exact-moment discipline, same operand order in
    // both engines: (n*ssq - s*s) / (n*(n-1)); ssq goes decimal ->
    // string -> double so the conversion stays bit-identical past 2^53.
    val x = col(valueCol).cast("decimal(14,2)")
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val ssqD = col("ssq").cast("string").cast("double")
    val stats = tx.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("s"),
      sum((x * x).cast("decimal(30,4)")).as("ssq"))
      .withColumn("mean", sD / nD)
      .withColumn("stddev",
        when(col("n") > 1,
          sqrt((nD * ssqD - sD * sD) / (nD * (nD - 1.0)))))
      .select(col(groupCol), col("mean"), col("stddev"))
    tx.join(broadcast(stats), Seq(groupCol))
      .withColumn("z", (col(valueCol) - col("mean")) / col("stddev"))
      .filter(col("stddev") > 0.0 && abs(col("z")) > zThreshold)
      .select(col(groupCol), col(valueCol), col("z"))
  }

  /** Robust (MAD) outlier DETECTION — the median-based sibling of
    * `outliers`, extending `SpendingReport.madByKey`'s per-group
    * median/MAD summary with the flag pass q_mad lacks: the count of
    * rows beyond k·MAD. Unlike the z-score, one wild value cannot
    * inflate the scale estimate and mask every other outlier
    * (breakdown point 50% vs 0% — spec plants a point the 2σ rule
    * misses). The k·MAD comparison is the same fixed IEEE expression
    * over the already-oracle-gated median/MAD doubles in both
    * engines, so the flag is deterministic cross-engine. One extra
    * scan over madByKey's two, with only the group-sized stats frame
    * crossing the wire (broadcast back; the data shuffles only for
    * the group aggs). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double): DataFrame = {
    val stats = graft.operators.SpendingReport.madByKey(df, groupCol, valueCol)
    df.join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"), col("n"))
      .agg(sum(when(abs(col(valueCol).cast("double") - col("med"))
                      > col("mad") * k, 1L)
        .otherwise(0L)).as("n_outliers"))
  }

  /** Categorical distribution drift between two halves of a time
    * range: per key, the share in the early half vs the late half and
    * the absolute share difference (summing abs_diff across keys gives
    * total-variation distance ×2 — kept per-key so the output names
    * WHICH categories moved). Cutoff = midpoint day of the observed
    * range, so the query is scale- and window-agnostic. Log-free on
    * purpose: KL/PMI-style scores are not oracle-gateable.
    * Keys absent from a half get share 0.0 (a key appearing/vanishing
    * IS drift, not an error). One grouped agg + a scalar broadcast. */
  def categoricalDrift(tx: DataFrame, dateCol: String,
                       keyCol: String): DataFrame = {
    val bounds = tx.agg(
      min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
      .withColumn("cutoff",
        // floor, not cast: cast(14.5 AS INT) truncates in Spark but
        // ROUNDS in DuckDB — floor is identical in both
        date_add(col("d0"),
          floor(datediff(col("d1"), col("d0")) / 2).cast("int")))
      .select("cutoff")
    val tagged = tx.join(broadcast(bounds))
      .withColumn("is_early", col(dateCol) <= col("cutoff"))
    // key-cardinality-sized; checkpointed because BOTH the totals agg
    // and the final join consume it — without this the fact is scanned
    // and aggregated twice (once per consumer subtree)
    val counts = tagged.groupBy(col(keyCol)).agg(
      sum(when(col("is_early"), 1L).otherwise(0L)).as("n_early"),
      sum(when(col("is_early"), 0L).otherwise(1L)).as("n_late"))
      .localCheckpoint()
    val totals = counts.agg(
      sum(col("n_early")).as("tot_early"), sum(col("n_late")).as("tot_late"))
    counts.join(broadcast(totals))
      .withColumn("share_early",
        col("n_early").cast("double") / col("tot_early"))
      .withColumn("share_late",
        col("n_late").cast("double") / col("tot_late"))
      .withColumn("abs_diff", abs(col("share_early") - col("share_late")))
      .select(col(keyCol), col("n_early"), col("n_late"),
        col("share_early"), col("share_late"), col("abs_diff"))
  }

  /** Duplication rate per corpus slice: fraction of rows whose exact
    * content digest appears earlier in the same slice (1 - distinct
    * digests / rows). The digest (md5 of the content) is computed
    * map-side so the heavy text column never shuffles — the grouped
    * count-distinct moves 16-byte digests only. */
  def dupRate(docs: DataFrame, sliceCols: Seq[String],
              contentCol: String): DataFrame = {
    val slice = sliceCols.map(col)
    docs
      .select(slice :+ md5(col(contentCol)).as("digest"): _*)
      .groupBy(slice: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("digest")).as("n_distinct"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_distinct").cast("double") / col("n_rows"))
  }

  /** Event-rate spike detection: per (type, day), today's event count
    * against the mean of the trailing `trailingDays` OBSERVED days
    * (rows-based frame — calendar gaps are `dateGaps`' job, not
    * this one's). `rate_ratio` = n · trailing_days / trailing_sum is
    * a single IEEE division over exact integer operands, so the output
    * is engine-portable; a z-score over so few points would not be
    * robust and a Poisson tail needs transcendentals. Days with fewer
    * than `minTrailingDays` of history emit no row (a ratio against
    * one noisy day is a false alarm, not a baseline).
    *
    * Shape: one (type, day) count aggregation, one type-partitioned
    * window — two keyed exchanges, both over the DAILY GRID (types ×
    * days), never over raw events. At 100 TB the grid is KB-sized. */
  def rateSpikes(events: DataFrame, typeCol: String, tsCol: String,
                 trailingDays: Int = 7, minTrailingDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(-trailingDays, -1)
    daily
      .withColumn("trailing_sum", sum(col("n_events")).over(w))
      .withColumn("trailing_days", count(col("n_events")).over(w))
      .filter(col("trailing_days") >= minTrailingDays && col("trailing_sum") > 0)
      .withColumn("rate_ratio",
        (col("n_events") * col("trailing_days")).cast("double")
          / col("trailing_sum").cast("double"))
      .select(col(typeCol), col("day"), col("n_events"),
        col("trailing_sum"), col("trailing_days"), col("rate_ratio"))
  }

  /** Coverage gaps: for each key, the calendar days inside the
    * table's GLOBAL [min,max] date range with no row for that key,
    * as (key, n_missing, first_missing, last_missing). The expected
    * grid is dimension-sized (keys × days — never fact-sized), built
    * with sequence+explode and anti-joined against the observed
    * (key, day) pairs; keys with full coverage emit no row. */
  def dateGaps(tx: DataFrame, dateCol: String, keyCol: String): DataFrame = {
    val span = tx.agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
    val keys = tx.select(col(keyCol)).distinct()
    val expected = keys.join(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val observed = tx.select(col(keyCol), col(dateCol).as("day")).distinct()
    expected.join(observed, Seq(keyCol, "day"), "left_anti")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_missing"),
        min(col("day")).as("first_missing"),
        max(col("day")).as("last_missing"))
  }

  /** Seasonal anomaly detection — day-of-week baselines: a (key, day)
    * is anomalous when its daily total exceeds TWICE the key's
    * average for that weekday, tested in the exact scale-free multiply
    * form `cents·n_days > 2·cents_total` (never a division in the
    * predicate — the TPC-H Q11 lesson: a fixed fraction-of-total
    * threshold flips as N grows, and FP division order diverges
    * cross-engine). Daily totals are decimal-exact cents; the two
    * output averages/ratios are single mirrored FP divisions at the
    * edge. The daily grid is keys×days-sized (never fact-sized), one
    * checkpoint feeds the baseline agg and the flag join. */
  def seasonalAnomalies(tx: DataFrame, keyCol: String, dateCol: String,
                        amtCol: String): DataFrame = {
    val daily = tx.groupBy(col(keyCol), col(dateCol).as("day"))
      .agg(sum(col(amtCol).cast("decimal(14,2)")).as("_t"))
      .withColumn("_c", (col("_t") * 100).cast("long"))
      .withColumn("dow", expr(s"weekday(day) + 1").cast("long"))
      .localCheckpoint()
    val base = daily.groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("_c")).as("_ctot"))
    daily.join(base, Seq(keyCol, "dow"))
      .filter(col("_c") * col("n_days") > col("_ctot") * 2)
      .select(col(keyCol), col("day"), col("dow"),
        col("_t").cast("double").as("day_total"),
        when(col("_ctot") =!= 0L,
          (col("_c") * col("n_days")).cast("double") /
            col("_ctot").cast("double")).as("ratio"),
        col("n_days"))
  }

  /** Benford first-digit audit — fraud/synthetic-data screening: the
    * distribution of the first digit of each positive amount (taken
    * over exact integer cents = floor(amount·100), the engine's
    * standard float-quantize discipline, so both engines see the same
    * integers and string heads) against the Benford expectation
    * log10(1+1/d), shipped as integer-ppm literals on BOTH sides so no
    * log is ever evaluated. One fact-side digit agg (9 groups,
    * map-side partials do all the work); the share divisions run on
    * the 9-row frame. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val expectedPpm = typedlit(Map(
      "1" -> 301030L, "2" -> 176091L, "3" -> 124939L, "4" -> 96910L,
      "5" -> 79181L, "6" -> 66947L, "7" -> 57992L, "8" -> 51153L,
      "9" -> 45757L))
    val counts = df
      .select(floor(col(valueCol).cast("double") * 100.0).cast("long").as("_c"))
      .filter(col("_c") > 0L)
      .select(substring(col("_c").cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .localCheckpoint()  // 9-row frame, shared by the total and the output
    val total = counts.agg(sum(col("n")).as("_tot"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("_tot").cast("double"))
      .withColumn("expected_ppm", element_at(expectedPpm, col("digit")))
      .select(col("digit"), col("n"), col("share"), col("expected_ppm"))
  }

  /** Categorical concentration per group — Gini impurity
    * `1 - Σ(cᵢ/n)²` and the Herfindahl–Hirschman index, the two
    * standard "is this slice dominated by a few values?" diagnostics a
    * pipeline runs before trusting a stratification key. Both are
    * log-free by design (entropy would need a transcendental): the
    * squared-count sum is an exact BIGINT, the impurity is ONE double
    * division of exact operands `(n² - Σcᵢ²)/n²`, and the HHI is the
    * exact integer `Σcᵢ²·10⁶ div n²` (truncating div mirrors DuckDB
    * `//`). BIGINT squares hold to n ≈ 3·10⁹ rows per group; past
    * that, lift `_ssq`/`n²` to DECIMAL(38,0) — same formulas.
    * Shape: one (group, value) hash agg collapsing to cardinality
    * size, then one group-keyed agg to group count — both partial-agg
    * map-side; nothing global. */
  def concentration(df: DataFrame, groupCol: String,
                    subCol: String): DataFrame = {
    val cnt = df.groupBy(col(groupCol), col(subCol))
      .agg(count(lit(1)).as("_c"))
    cnt.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("_c") * col("_c")).as("_ssq"))
      .select(col(groupCol),
        col("n_rows"), col("n_distinct"),
        ((col("n_rows") * col("n_rows") - col("_ssq")).cast("double") /
          (col("n_rows") * col("n_rows")).cast("double")).as("gini_impurity"),
        expr("(_ssq * 1000000) div (n_rows * n_rows)").as("hhi_ppm"))
  }
}
