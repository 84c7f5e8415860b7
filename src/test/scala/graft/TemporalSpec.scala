package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest at-or-before match per key; null when no prior") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // after r1 -> r1
      (2L, 10L, ts("2024-01-01 12:00:00")),   // exactly at r2 -> r2 (<= semantics)
      (3L, 10L, ts("2024-01-01 09:00:00")),   // before anything -> null
      (4L, 20L, ts("2024-01-01 23:00:00"))    // other key, no rights -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),  // r1
      (10L, ts("2024-01-01 12:00:00"), 2.0)   // r2
    ).toDF("user_id", "ts", "pvalue")
    val out = Temporal.asOfJoin(left, right, "user_id", "ts", "ts", "pvalue")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Double]("asof_val"))).toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("session_window batch semantics: merge under gap, break at exactly gap") {
    // pins the exact-gap edge the q_session_window oracle must mirror
    // (measured, not assumed): an event EXACTLY `gap` after the
    // previous one still MERGES — windows [t, t+gap] coalesce when
    // they touch, so a session breaks only when diff > gap
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:29:59")),   // < gap -> same session
      (3L, ts("2024-01-01 10:59:59")),   // chained: still same session
      (4L, ts("2024-01-01 11:29:59")),   // EXACTLY gap after #3 -> still merges
      (5L, ts("2024-01-01 13:00:00"))    // > gap -> new session
    ).toDF("event_id", "ts").withColumn("user_id", lit(7L))
    val out = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().select(col("session_window.start").cast("string"), col("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "2024-01-01 10:00:00" -> 4L,
      "2024-01-01 13:00:00" -> 1L), s"got $out")
  }

  test("cumulativeDistinct: first-seen identity, repeat visits never recount") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-03 10:00:00"), 1L),   // repeat: not a new user
      (3L, ts("2024-01-01 11:00:00"), 2L),
      (4L, ts("2024-01-04 10:00:00"), 3L)
    ).toDF("event_id", "ts", "user_id")
    val out = Temporal.cumulativeDistinct(ev, "user_id", "ts").collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "2024-01-01" -> ((2L, 2L)),   // users 1,2 first seen
      "2024-01-04" -> ((1L, 3L))))  // user 3; day 3's repeat emits no row
  }

  test("timeWeightedValue: duration-weighted mean, single-event keys emit nothing") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),  // held 1s
      (2L, ts("2024-01-01 10:00:01"), 1L, 20.0),  // held 3s
      (3L, ts("2024-01-01 10:00:04"), 1L, 99.0),  // last: no interval
      (4L, ts("2024-01-01 12:00:00"), 2L, 5.0)    // lone event: no row
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Temporal.timeWeightedValue(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // (10*1000 + 20*3000) / 4000 ms = 17.5, over 2 intervals
    assert(out == Map(1L -> ((17.5, 2L))))
  }

  test("locfDailySpend: gaps carry the last observed total; leading days stay null") {
    val tx = Seq(
      ("2024-01-01", "food", 10.0),
      ("2024-01-01", "food", 2.5),     // same-day rows aggregate first
      ("2024-01-04", "food", 7.0),     // days 2-3 are gaps -> carry 12.5
      ("2024-01-02", "rent", 100.0)    // rent starts day 2 -> day 1 null
    ).toDF("dt", "category", "amount")
      .selectExpr("to_date(dt) AS txn_date", "category", "amount")
    val out = Temporal.locfDailySpend(tx).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((Option(r.getAs[java.lang.Double]("day_total")),
          Option(r.getAs[java.lang.Double]("filled_total"))))).toMap
    assert(out.size == 8, "dense grid: 4 days x 2 categories")
    assert(out(("food", "2024-01-01")) == ((Some(12.5), Some(12.5))))
    assert(out(("food", "2024-01-02")) == ((None, Some(12.5))), "gap carries forward")
    assert(out(("food", "2024-01-03")) == ((None, Some(12.5))))
    assert(out(("food", "2024-01-04")) == ((Some(7.0), Some(7.0))), "new observation resets")
    assert(out(("rent", "2024-01-01")) == ((None, None)), "before first observation: nothing to carry")
    assert(out(("rent", "2024-01-04")) == ((None, Some(100.0))))
  }

  test("asOfJoinForward: earliest at-or-after match; null when none follows") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
                   (2L, 1L, ts("2024-01-01 12:00:00")),
                   (3L, 2L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0),   // == left 1 ts -> visible
                    (1L, ts("2024-01-01 11:00:00"), 7.0))   // after left 1, before left 2
      .toDF("user_id", "ts", "pvalue")
    val out = Temporal.asOfJoinForward(left, right, "user_id", "ts", "ts", "pvalue")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[java.sql.Timestamp]("asof_ts")), Option(r.getAs[Double]("asof_val")))).toMap
    assert(out(1L) == (Some(ts("2024-01-01 10:00:00")), Some(5.0)))  // at == ts, not 11:00
    assert(out(2L) == (None, None))                                   // nothing follows
    assert(out(3L) == (None, None))                                   // other user
  }

  test("sessionize: gap over threshold starts a new session") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),   // 10 min gap -> same session
      (1L, ts("2024-01-01 11:00:00"), 3.0),   // 50 min gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 4.0)    // other user -> own session 1
    ).toDF("user_id", "ts", "value")
    val out = Temporal.sessionStats(e, "user_id", "ts", "value", 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(out((1L, 1L)) == (2L, 3.0))
    assert(out((1L, 2L)) == (1L, 3.0))
    assert(out((2L, 1L)) == (1L, 4.0))
  }

  test("runningDailySpend accumulates per category in date order") {
    val tx = Seq(
      ("2024-01-01", "food", 10.0), ("2024-01-02", "food", 5.0),
      ("2024-01-03", "food", 1.0), ("2024-01-01", "rent", 100.0)
    ).toDF("dt", "category", "amount")
      .selectExpr("to_date(dt) AS txn_date", "category", "amount")
    val out = Temporal.runningDailySpend(tx)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(3)).toMap
    assert(out(("food", "2024-01-03")) == 16.0)
    assert(out(("rent", "2024-01-01")) == 100.0)
  }

  test("range join: boundary containment is [start, end)") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // == start -> in
      (2L, ts("2024-01-01 23:59:59")),  // inside
      (3L, ts("2024-01-02 00:00:00")),  // == end -> out
      (4L, ts("2023-12-31 23:59:59"))   // before -> out
    ).toDF("event_id", "ts")
    val intervals = Seq((7L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("ival_id", "ival_start", "ival_end")
    val out = Temporal.countPointsInIntervals(points, "ts", intervals, 2).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_points") == 2L)
  }

  test("range join: intervals exceeding maxDays surface as NULL-sentinel rows") {
    val points = Seq(
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-03 12:00:00"))
    ).toDF("event_id", "ts")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),  // 1 day: counted
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00"))   // 5 days: excluded
    ).toDF("ival_id", "ival_start", "ival_end")
    val out = Temporal.countPointsInIntervals(points, "ts", intervals, 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // the oversized interval is NOT silently dropped: it appears with the
    // NULL sentinel (a real zero-count interval produces no row at all,
    // so NULL unambiguously means "excluded by the bound")
    assert(out == Map(1L -> Some(1L), 2L -> None), s"got $out")
  }

  test("movingDailySpend: RANGE frame skips calendar gaps") {
    // food has days 1, 2, 5: the 3-day window ending day 5 covers
    // days 3..5 — only day 5 itself (days 1-2 are OUTSIDE the range,
    // a ROWS frame would wrongly include them)
    val tx = Seq(
      ("2024-01-01", "food", 10.0), ("2024-01-02", "food", 5.0),
      ("2024-01-05", "food", 1.0)
    ).toDF("dt", "category", "amount")
      .selectExpr("to_date(dt) AS txn_date", "category", "amount")
    val out = Temporal.movingDailySpend(tx, 3)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).toMap
    assert(out("2024-01-01") == 10.0)
    assert(out("2024-01-02") == 15.0)   // days 1+2 within 3-day range
    assert(out("2024-01-05") == 1.0)    // gap: days 3-4 empty, 1-2 out of range
  }

  test("groupingSetsSpend: named sets only, no unrequested combinations") {
    val tx = Seq(
      ("2024-01-01", "food", "v1", 10.0), ("2024-01-02", "rent", "v2", 5.0)
    ).toDF("dt", "category", "vendor", "amount")
      .selectExpr("to_date(dt) AS txn_date", "category", "vendor", "amount")
    val out = Temporal.groupingSetsSpend(tx).collect()
    // (category)x2 + (vendor)x2 + (category,vendor)x2 + grand = 7
    assert(out.length == 7, s"got ${out.length}: ${out.toSeq}")
    val grand = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getDouble(2) == 15.0 && grand.getLong(3) == 2L)
  }

  test("cubeSpend emits all grouping sets incl. grand total") {
    val tx = Seq(("2024-01-01", "food", 10.0), ("2024-01-02", "rent", 5.0))
      .toDF("dt", "category", "amount")
      .selectExpr("to_date(dt) AS txn_date", "category", "amount")
    val out = Temporal.cubeSpend(tx).collect()
    assert(out.length == 7)  // 2 observed cells + 2 cat margins + 2 date margins + grand total
    val grand = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getDouble(2) == 15.0 && grand.getLong(3) == 2L)
  }

  test("funnel: strict sequencing — out-of-order steps do not count") {
    // u1 completes view->click->purchase in order
    // u2 purchases BEFORE clicking: reaches view+click, not purchase
    // u3 clicks before viewing, views later, never clicks again:
    //    reaches view only (the early click precedes its chain)
    // u4 only errors: reaches nothing
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-02 09:00:00"), "view"),
      (2L, ts("2024-01-02 09:30:00"), "purchase"),
      (2L, ts("2024-01-02 10:00:00"), "click"),
      (3L, ts("2024-01-03 08:00:00"), "click"),
      (3L, ts("2024-01-03 09:00:00"), "view"),
      (4L, ts("2024-01-04 07:00:00"), "error")
    ).toDF("user_id", "ts", "event_type")
    val out = Temporal.funnel(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("view") == ((0L, 3L, 1.0, 1.0)))
    assert(out("click") == ((1L, 2L, 2.0 / 3.0, 2.0 / 3.0)))
    assert(out("purchase") == ((2L, 1L, 1.0 / 3.0, 0.5)))
    intercept[IllegalArgumentException](Temporal.funnel(ev, Seq("view")))
    intercept[IllegalArgumentException](Temporal.funnel(ev, Seq("view", "view")))
  }

  test("scd2: episodes collapse no-op changes, null-safe, open current row") {
    import graft.operators.Relational
    val ch = Seq(
      (1L, "2024-01-01", Some(10.0)),
      (1L, "2024-01-02", Some(10.0)),   // no-op change -> collapsed
      (1L, "2024-01-03", Some(20.0)),   // new episode
      (1L, "2024-01-04", None),         // change to NULL = new episode
      (1L, "2024-01-05", None),         // null -> null is a no-op (null-safe)
      (2L, "2024-01-01", Some(5.0))     // single-episode key
    ).toDF("user_id", "dt", "value")
      .selectExpr("user_id", "to_date(dt) AS day", "value")
    val out = Relational.scd2(ch, "user_id", "day", "value").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, Some(10.0), "2024-01-01", Some("2024-01-03"), false),
      (1L, Some(20.0), "2024-01-03", Some("2024-01-04"), false),
      (1L, None, "2024-01-04", None, true),
      (2L, Some(5.0), "2024-01-01", None, true)))
    // the two windows share one exchange (filter preserves the sort)
    val plan = Relational.scd2(ch, "user_id", "day", "value")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }

  test("funnel and retentionCohorts are partition-count invariant") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    def fcanon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(fcanon(Temporal.funnel(ev, Seq("view", "click", "purchase"))) ==
      fcanon(Temporal.funnel(ev.repartition(13), Seq("view", "click", "purchase"))))
    def rcanon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(rcanon(Temporal.retentionCohorts(ev)) ==
      rcanon(Temporal.retentionCohorts(ev.repartition(17))))
  }

  test("retentionCohorts: first-week cohorts, gap weeks, no double-count") {
    // Mondays: 2024-01-01 (w0), 01-08 (w1), 01-15 (w2)
    // u1: two events in w0 (counted once), then w1, w2
    // u2: w0 and w2 only (gap at w1)
    // u3: first seen w1 -> its own cohort
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")), (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-17 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Temporal.retentionCohorts(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(
      ("2024-01-01", 0L), ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-08", 0L)))
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1L)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2L)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-08", 0L)) == ((1L, 1L, 1.0)))
  }

  test("basketCooccurrence: distinct per-basket types, exact lift, a<b orientation") {
    val ev = Seq(
      // u1 day1 basket {a,b,c} — the duplicate 'a' must count once
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "a"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "b"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "c"),
      // u1 day2 basket {a}
      (5L, ts("2024-01-02 09:00:00"), 1L, "a"),
      // u2 day1 basket {a,b}
      (6L, ts("2024-01-01 11:00:00"), 2L, "a"),
      (7L, ts("2024-01-01 11:05:00"), 2L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.basketCooccurrence(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // N=3 baskets; supports a=3 b=2 c=1
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 2L, 3L, 1.0)),
      ("a", "c") -> ((1L, 3L, 1L, 3L, 1.0)),
      ("b", "c") -> ((1L, 2L, 1L, 3L, 1.5))), s"got $out")
  }

  test("lagAutocorr: linear series -> 1, calendar gaps drop pairs, constant -> null") {
    val tx = ((1 to 5) ++ (7 to 10)).map(i =>
        (f"2024-01-$i%02d", "lin", i.toDouble)) ++
      (1 to 4).map(i => (f"2024-01-$i%02d", "flat", 5.0))
    val df = tx.toDF("dt", "category", "amount")
      .select(to_date(col("dt")).as("txn_date"), col("category"), col("amount"))
    val out = Temporal.lagAutocorr(df, "category", "txn_date", "amount", 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // 9 days minus the 5->7 gap pair = 7 aligned pairs; x=t-1 vs y=t
    // perfectly linear -> r = 1 (up to one sqrt*sqrt rounding)
    val (nLin, rLin) = out("lin")
    assert(nLin == 7L, s"got $out")
    assert(math.abs(rLin.get - 1.0) < 1e-12, s"got $out")
    // constant series: zero variance -> NULL, never NaN
    assert(out("flat") == ((3L, None)), s"got $out")
  }

  test("conversionLag: stray early purchase ignored, at-or-after conversion, day buckets") {
    val ev = Seq(
      // u1: purchase BEFORE the first view (must not count), then view,
      // then converting purchase 2d + 1h after it -> day bucket 2
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase"),
      (2L, ts("2024-01-02 00:00:00"), 1L, "view"),
      (3L, ts("2024-01-04 01:00:00"), 1L, "purchase"),
      // u2: view only -> no conversion row
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      // u3: purchase at the SAME instant as the first view -> lag 0
      (5L, ts("2024-01-05 12:00:00"), 3L, "view"),
      (6L, ts("2024-01-05 12:00:00"), 3L, "purchase"),
      // u4: purchase with no view at all -> no first touch
      (7L, ts("2024-01-01 00:00:00"), 4L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.conversionLag(ev, "user_id", "ts", "event_type",
        "view", "purchase")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(2L -> ((1L, 176400.0)), 0L -> ((1L, 0.0))), s"got $out")
  }

  test("pathTrigrams: consecutive 3-windows per user, (n desc, path asc) top-k") {
    val ev = Seq(
      // u1: a b a b a -> (a,b,a) (b,a,b) (a,b,a)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "b"),
      (5L, ts("2024-01-01 10:04:00"), 1L, "a"),
      // u2: a b a -> (a,b,a); streams never concatenate across users
      (6L, ts("2024-01-01 11:00:00"), 2L, "a"),
      (7L, ts("2024-01-01 11:01:00"), 2L, "b"),
      (8L, ts("2024-01-01 11:02:00"), 2L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.pathTrigrams(ev, "user_id", "ts", "event_type", 25)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", "a", 3L), ("b", "a", "b", 1L)), s"got ${out.toSeq}")
  }

  test("eventTransitions: lag pairs over the total (ts, event_id) order, per-prev shares") {
    val ev = Seq(
      // u1 in (ts, event_id) order: a, b(e2), b(e3 same ts), c
      // -> a→b, b→b, b→c
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:05:00"), 1L, "b"),
      (4L, ts("2024-01-01 10:10:00"), 1L, "c"),
      // u2: a -> c
      (5L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (6L, ts("2024-01-01 09:30:00"), 2L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Temporal.eventTransitions(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5)), ("b", "c") -> ((1L, 0.5))), s"got $out")
  }

  test("peakConcurrency: sweep-line max with exclusive ends (-1 before +1 at shared instants)") {
    val iv = Seq(
      (ts("2024-01-01 09:00:00"), ts("2024-01-01 10:30:00")), // E
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // A
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")), // B starts AS E ends
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00")), // C starts AS A ends
      (ts("2024-01-02 09:00:00"), ts("2024-01-02 09:30:00"))  // next day
    ).toDF("s_start", "s_end")
    val out = Temporal.peakConcurrency(iv, "s_start", "s_end")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // handoffs at 10:30 and 11:00 must NOT stack: peak is 2, not 3
    assert(out("2024-01-01") == ((2L, 4L)), s"got $out")
    assert(out("2024-01-02") == ((1L, 1L)), s"got $out")
  }

  test("ohlcBars: open/close by event time, same-timestamp ties break on event_id") {
    val ev = Seq(
      // user 1, one day: open=5 (earliest), close=7 (tie at 10:05
      // broken by event_id: 4 > 3), high=20, low=2
      (1L, ts("2024-01-01 10:00:00"), 1L, 5.0),
      (2L, ts("2024-01-01 10:02:00"), 1L, 20.0),
      (5L, ts("2024-01-01 10:03:00"), 1L, 2.0),
      (3L, ts("2024-01-01 10:05:00"), 1L, 9.0),
      (4L, ts("2024-01-01 10:05:00"), 1L, 7.0),
      // user 1, next day: single event -> all four equal
      (6L, ts("2024-01-02 09:00:00"), 1L, 3.5)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Temporal.ohlcBars(ev, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(out((1L, "2024-01-01")) == ((5.0, 20.0, 2.0, 7.0, 5L, 43.0)), s"got $out")
    assert(out((1L, "2024-01-02")) == ((3.5, 3.5, 3.5, 3.5, 1L, 3.5)), s"got $out")
  }
}
