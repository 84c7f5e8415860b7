package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def txOf(rows: (String, String, Double)*): DataFrame =
    rows.toDF("dt", "category", "amount")
      .select(to_date(col("dt")).as("txn_date"), col("category"),
        col("amount"))

  test("outliers flags the planted point and nothing in degenerate groups") {
    // 'a': tight cluster + one far point; 'b': n=1; 'c': zero variance
    val tx = txOf(
      ("2024-01-01", "a", 10.0), ("2024-01-02", "a", 10.5),
      ("2024-01-03", "a", 9.5), ("2024-01-04", "a", 10.2),
      ("2024-01-05", "a", 9.8), ("2024-01-06", "a", 100.0),
      ("2024-01-01", "b", 5.0),
      ("2024-01-01", "c", 7.0), ("2024-01-02", "c", 7.0))
    val out = DataQuality.outliers(tx, "category", "amount", 2.0)
      .select("category", "amount").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("a", 100.0)))
  }

  test("madOutliers: robust scale catches the point the z-score masks; even-n interpolates") {
    val tx = txOf(
      // 'a' odd n: median 3, |dev| [2,1,0,1,97] -> MAD 1; only 100.0
      // exceeds 3·MAD. The z-score at the same data has stddev ≈ 43,
      // z(100) ≈ 1.8 — a 2σ rule misses it (masking).
      ("2024-01-01", "a", 1.0), ("2024-01-02", "a", 2.0),
      ("2024-01-03", "a", 3.0), ("2024-01-04", "a", 4.0),
      ("2024-01-05", "a", 100.0),
      // 'b' even n: median (2+3)/2 = 2.5, |dev| [1.5,.5,.5,7.5] ->
      // MAD (.5+1.5)/2 = 1.0; only 10.0 exceeds 3
      ("2024-01-01", "b", 1.0), ("2024-01-02", "b", 2.0),
      ("2024-01-03", "b", 3.0), ("2024-01-04", "b", 10.0))
    val out = DataQuality.madOutliers(tx, "category", "amount", 3.0)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 3.0, 1.0, 5L, 1L)), s"got $out")
    assert(out("b") == (("b", 2.5, 1.0, 4L, 1L)), s"got $out")
    assert(DataQuality.outliers(tx, "category", "amount", 2.0)
      .filter(col("category") === "a").count() == 0,
      "precondition: the 2σ z-rule must mask 'a''s planted outlier")
  }

  test("drift: vanished key keeps share 0 in the late half") {
    // 4 days: cutoff = d0 + floor(3/2) = day 2 -> early = days 1-2
    val tx = txOf(
      ("2024-01-01", "x", 1.0), ("2024-01-02", "x", 1.0),
      ("2024-01-03", "y", 1.0), ("2024-01-04", "y", 1.0),
      ("2024-01-01", "y", 1.0))
    val d = DataQuality.categoricalDrift(tx, "txn_date", "category")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(d("x")._2 == 2 && d("x")._3 == 0 && d("x")._5 == 0.0)
    assert(d("y")._2 == 1 && d("y")._3 == 2)
    assert(math.abs(d("x")._6 - (2.0 / 3.0)) < 1e-15)
  }

  test("dupRate: exact duplicates counted per slice, clean slice is 0") {
    val docs = Seq(
      (1L, "en", "web", "same text"), (2L, "en", "web", "same text"),
      (3L, "en", "web", "other"), (4L, "fr", "web", "unique a"),
      (5L, "fr", "web", "unique b")
    ).toDF("doc_id", "lang", "source", "text")
    val r = DataQuality.dupRate(docs, Seq("lang", "source"), "text")
      .select("lang", "n_rows", "n_distinct", "dup_rate")
      .as[(String, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(r("en")._2 == 3 && r("en")._3 == 2 && math.abs(r("en")._4 - 1.0 / 3.0) < 1e-15)
    assert(r("fr")._4 == 0.0)
  }

  test("dateGaps finds interior and boundary holes, skips full keys") {
    // global range 01-01..01-04; u1 full; u2 missing 01-02 and 01-04
    val tx = txOf(
      ("2024-01-01", "u1", 1.0), ("2024-01-02", "u1", 1.0),
      ("2024-01-03", "u1", 1.0), ("2024-01-04", "u1", 1.0),
      ("2024-01-01", "u2", 1.0), ("2024-01-03", "u2", 1.0))
      .withColumnRenamed("category", "vendor")
    val g = DataQuality.dateGaps(tx, "txn_date", "vendor")
      .as[(String, Long, java.sql.Date, java.sql.Date)].collect()
    assert(g.length == 1)
    val (v, n, first, last) = g.head
    assert(v == "u2" && n == 2 &&
      first.toString == "2024-01-02" && last.toString == "2024-01-04")
  }

  test("rateSpikes: planted spike flagged, short history excluded") {
    val ev = (Seq.fill(1)("2024-01-01") ++ Seq.fill(1)("2024-01-02") ++
      Seq.fill(1)("2024-01-03") ++ Seq.fill(1)("2024-01-04") ++
      Seq.fill(9)("2024-01-05"))
      .zipWithIndex.map { case (d, i) => (i.toLong, s"$d 12:00:00", "login") }
      .toDF("event_id", "ts_s", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("event_type"))
    val out = DataQuality.rateSpikes(ev, "event_type", "ts",
        trailingDays = 7, minTrailingDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // days 1-2 lack 2 trailing days; day3: 1*2/2=1.0; day4: 1*3/3=1.0;
    // day5 spike: 9*4/4=9.0
    assert(out.toSeq == Seq(
      ("2024-01-03", 1L, 2L, 2L, 1.0),
      ("2024-01-04", 1L, 3L, 3L, 1.0),
      ("2024-01-05", 9L, 4L, 4L, 9.0)))
  }

  test("all four handle empty input") {
    val empty = txOf().withColumnRenamed("category", "vendor")
      .withColumn("category", col("vendor"))
    assert(DataQuality.outliers(empty, "category", "amount", 2.0).count() == 0)
    assert(DataQuality.madOutliers(empty, "category", "amount", 3.0).count() == 0)
    assert(DataQuality.categoricalDrift(empty, "txn_date", "category").count() == 0)
    assert(DataQuality.dateGaps(empty, "txn_date", "vendor").count() == 0)
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "source", "text")
    assert(DataQuality.dupRate(emptyDocs, Seq("lang", "source"), "text").count() == 0)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("event_id", "ts", "event_type")
    assert(DataQuality.rateSpikes(emptyEv, "event_type", "ts").count() == 0)
  }

  test("seasonalAnomalies: 2x-the-dow-average day flagged via exact multiply") {
    // three Mondays for one vendor: 10, 10, 100 -> ctot = 12000 cents;
    // only the 100 day trips 10000*3 > 2*12000 (ratio 2.5). A flat
    // vendor (all equal) never flips the predicate.
    val tx = Seq(
      ("2024-01-01", "v1", 10.0), ("2024-01-08", "v1", 10.0),
      ("2024-01-15", "v1", 100.0),
      ("2024-01-01", "v2", 7.0), ("2024-01-08", "v2", 7.0))
      .toDF("dt", "vendor", "amount")
      .select(to_date(col("dt")).as("txn_date"), col("vendor"), col("amount"))
    val out = DataQuality.seasonalAnomalies(tx, "vendor", "txn_date", "amount")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == Seq(("v1", "2024-01-15", 1L, 100.0, 2.5, 3L)), s"got ${out.toSeq}")
  }

  test("benfordDigits: integer-cents first digit, shares, ppm lookup") {
    // cents: 12345 -> '1'; 999 -> '9'; 1900 -> '1'; 0 and negatives drop
    val df = Seq(123.45, 9.99, 0.004, 19.0, -5.0).toDF("amount")
    val out = DataQuality.benfordDigits(df, "amount").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out == Map(
      "1" -> ((2L, 2.0 / 3.0, 301030L)),
      "9" -> ((1L, 1.0 / 3.0, 45757L))), s"got $out")
  }

  test("concentration: exact Gini impurity and truncating HHI ppm") {
    // A: counts {x:2, y:1} -> n=3, ssq=5, gini=(9-5)/9, hhi=5e6 div 9;
    // B: single value -> impurity 0, HHI exactly 1e6
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "z"))
      .toDF("source", "lang")
    val out = DataQuality.concentration(df, "source", "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("A") == ((3L, 2L, 4.0 / 9.0, 555555L)), s"got $out")
    assert(out("B") == ((1L, 1L, 0.0, 1000000L)), s"got $out")
  }

  test("hashedQualityScore equals a driver-side hashing-trick reference") {
    import graft.functions.TextAnalysis
    val docs = Seq((1L, "Alpha beta GAMMA", "en"), (2L, "x", "fr"), (3L, "", "en"),
        (4L, " a b\n", "en")) // space-trim + trailing-\n edge: tokens ["a","b",""]
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.hashedQualityScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def w(feat: String): Long = {
      val bucket = java.lang.Long.parseLong(md5hex(feat).take(8), 16) % (1L << 20)
      java.lang.Long.parseLong(md5hex("w" + bucket).take(8), 16) % 2001L - 1000L
    }
    def ref(text: String): (Long, Long, Long) = {
      // mirror ENGINE semantics (and the DuckDB oracle's): Spark trim
      // strips SPACES only (Java String.trim would also strip \n and
      // controls <= U+0020) and split keeps trailing empties
      val toks = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      val feats = toks.toSeq ++ toks.toSeq.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val s = feats.map(w).sum
      (feats.length.toLong, s, if (s >= 0) 1L else 0L)
    }
    assert(got(1L) == ref("Alpha beta GAMMA"), s"got $got")
    assert(got(2L) == ref("x"))
    assert(got(3L) == ref(""), "empty text must score the single empty token")
    assert(got(4L) == ref(" a b\n"), s"trim/split edge diverged: $got")
    assert(got(4L)._1 == 5L, "expected tokens [a, b, \"\"] -> 3 unigrams + 2 bigrams")
  }

  test("hashedQualityScoreWith: stub-derived table reproduces the in-row stub; missing buckets weigh 0") {
    import graft.functions.TextAnalysis
    val docs = Seq((1L, "Alpha beta GAMMA", "en"), (2L, "x", "fr"), (3L, "", "en"),
        (4L, " a b\n", "en"), (5L, "alpha beta alpha beta gamma", "de"))
      .toDF("doc_id", "text", "lang")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "n_feats", "w_sum", "score", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).sortBy(_._1).toSeq
    // the salt-"w" table IS the stub's weight vector -> exact equality
    // of the whole output (including score doubles: same integer
    // operands, one identical division)
    val viaTable = rows(TextAnalysis.hashedQualityScoreWith(docs,
      TextAnalysis.stubWeightTable(docs, "w")))
    val viaStub = rows(TextAnalysis.hashedQualityScore(docs))
    assert(viaTable == viaStub,
      s"trained-weight path diverged from stub:\n$viaTable\nvs\n$viaStub")
    // missing buckets weigh 0: an empty table scores every doc 0/keep
    val empty = spark.range(0).select(col("id").as("bucket"), col("id").as("w"))
    val zeroed = rows(TextAnalysis.hashedQualityScoreWith(docs, empty))
    assert(zeroed.forall(r => r._4 == 0L && r._6 == 1L),
      s"empty weight table must score 0 and keep all: $zeroed")
    // n_feats preserved from the base row even with no weights
    assert(zeroed.map(z => (z._1, z._3)) == viaStub.map(v => (v._1, v._3)))
    // a different salt is a genuinely different weight vector
    val w2 = rows(TextAnalysis.hashedQualityScoreWith(docs,
      TextAnalysis.stubWeightTable(docs, "w2")))
    assert(w2.map(_._4) != viaStub.map(_._4),
      "salt w2 must produce different weight sums than the stub")
  }

  test("trainQualityWeights: fitted count-ratio table beats the stub on a held-out planted set") {
    import graft.functions.TextAnalysis
    // Two disjoint vocabularies; labels follow the vocabulary. The
    // held-out docs are UNSEEN combinations drawn from the same pools,
    // so a trainer that learns per-bucket polarity classifies them
    // perfectly while the md5-salt stub weights sit near chance.
    val goodVocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val badVocab = Vector("zork", "quux", "blarg", "snarf", "grue", "yuzz")
    def doc(vocab: Vector[String], seed: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(12)(vocab(r.nextInt(vocab.size))).mkString(" ")
    }
    val train = ((0 until 20).map(i => (i.toLong, doc(goodVocab, i), 1L)) ++
                 (20 until 40).map(i => (i.toLong, doc(badVocab, i), 0L)))
      .toDF("doc_id", "text", "label")
    val held = ((100 until 110).map(i => (i.toLong, doc(goodVocab, 1000 + i), 1L)) ++
                (110 until 120).map(i => (i.toLong, doc(badVocab, 1000 + i), 0L)))
      .toDF("doc_id", "text", "label")
    val w = TextAnalysis.trainQualityWeights(train)
    // pure-polarity sample: every fitted weight saturates at ±1000
    assert(w.collect().forall(r => math.abs(r.getLong(1)) == 1000L))
    def accuracy(weights: org.apache.spark.sql.DataFrame): Double = {
      val scored = TextAnalysis.hashedQualityScoreWith(
        held.withColumn("lang", lit("en")), weights)
      val hits = scored.join(held.select(col("doc_id"), col("label")), Seq("doc_id"))
        .filter(col("keep") === col("label")).count()
      hits.toDouble / 20.0
    }
    val accTrained = accuracy(w)
    val accStub = accuracy(TextAnalysis.stubWeightTable(
      held.withColumn("lang", lit("en")), "w"))
    assert(accTrained == 1.0,
      s"disjoint-vocabulary held-out set must classify perfectly, got $accTrained")
    assert(accTrained > accStub,
      s"trained table ($accTrained) must beat the salt stub ($accStub)")
  }
}
