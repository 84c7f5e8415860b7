package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("SpaceSaving guarantees hold under eviction pressure") {
    // 40-term vocab, capacity 16 -> constant eviction; one planted
    // heavy hitter at ~20% frequency must be reported, with count in
    // [true, true + n/m].
    val stream = (1 to 4000).map { i =>
      if (i % 5 == 0) "HEAVY" else s"t${i % 39}"
    }
    val docs = stream.grouped(100).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = HeavyHitters.topDocTerms(docs, capacity = 16, k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains("heavy"), s"heavy hitter missing: $out")
    val (cnt, err) = out("heavy")
    val trueCount = 800L
    assert(cnt >= trueCount, s"SpaceSaving must over-estimate: $cnt < $trueCount")
    assert(cnt - err <= trueCount, s"count - error must lower-bound truth: $cnt - $err > $trueCount")
  }

  test("merge of two full buffers with disjoint rare terms over-estimates") {
    // Regression for the merge substitution direction: a term missing
    // from buffer a could have been evicted there with count up to
    // minA, so its merged count must add minA (not minB). Two full
    // buffers with DIFFERENT minimums + disjoint rare terms expose a
    // swap: with the wrong substitution some merged count drops below
    // the true count, violating the over-estimate guarantee.
    val agg = HeavyHitters.aggregator(capacity = 4, k = 16)
    // a sees: x1..x4 (mins differ from b's); b sees: y1..y4
    val streamA = Seq.fill(10)("common") ++ Seq("a1", "a1", "a1", "a2", "a2", "a3")
    val streamB = Seq.fill(7)("common") ++ Seq("b1", "b1", "b2", "b2", "b2", "b2", "b3")
    val bufA = streamA.foldLeft(agg.zero)(agg.reduce)
    val bufB = streamB.foldLeft(agg.zero)(agg.reduce)
    assert(bufA.size == 4 && bufB.size == 4) // both full -> nonzero mins
    val merged = agg.merge(bufA, bufB) // immutable buffers: no defensive copy needed
    val trueCounts = (streamA ++ streamB).groupBy(identity).view.mapValues(_.size.toLong)
    merged.foreach { case (t, (c, e)) =>
      assert(c >= trueCounts.getOrElse(t, 0L),
        s"merged count for '$t' under-estimates: $c < ${trueCounts.getOrElse(t, 0L)} (merged=$merged)")
      assert(c - e <= trueCounts.getOrElse(t, 0L),
        s"count - error must lower-bound truth for '$t': $c - $e")
    }
    // the planted heavy term survives with an exact-or-over count
    assert(merged.contains("common") && merged("common")._1 >= 17L)
  }

  test("exact when capacity exceeds vocabulary") {
    val docs = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val out = HeavyHitters.topDocTerms(docs, capacity = 10, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
