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

  test("exact when capacity exceeds vocabulary") {
    val docs = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val out = HeavyHitters.topDocTerms(docs, capacity = 10, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
