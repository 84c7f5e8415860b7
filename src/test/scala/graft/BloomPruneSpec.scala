package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private def fact(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "payload")

  test("bloomSemiJoin is row-exact vs the plain semi join") {
    val f = fact(500)
    val dim = Seq(3L, 7L, 250L, 499L, 9999L).toDF("dk")
    val viaBloom = BloomPrune.bloomSemiJoin(f, "k", dim, "dk", expectedItems = 100L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val plain = f.join(dim, f("k") === dim("dk"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == plain && plain == Seq(3L, 7L, 250L, 499L))
  }

  test("prunedCandidates never loses a true match and actually prunes") {
    val f = fact(2000)
    val dim = Seq(10L, 20L, 30L).toDF("dk")
    val cand = BloomPrune.prunedCandidates(f, "k", dim, "dk", expectedItems = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(Set(10L, 20L, 30L).subsetOf(cand), "bloom must have no false negatives")
    // 3 true keys among 2000; at the default ~3% fpp the candidate set
    // must be a small fraction of the fact table (generous 20% bound
    // keeps the test deterministic-in-practice for this fixed fixture)
    assert(cand.size < 400, s"bloom pruned nothing: ${cand.size} of 2000 rows survive")
  }

  test("bloomSemiJoin works when factKey == dimKey (natural key)") {
    val f = fact(200)
    val dim = Seq(5L, 42L, 7777L).toDF("k")
    val got = BloomPrune.bloomSemiJoin(f, "k", dim, "k", expectedItems = 100L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(5L, 42L), s"same-named join key must not be ambiguous: $got")
  }

  test("empty dim prunes everything; result is empty, not an error") {
    val f = fact(50)
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomPrune.bloomSemiJoin(f, "k", dim, "dk", expectedItems = 10L).isEmpty)
  }

  test("probe column evaluates inside whole-stage codegen (no fallback)") {
    // spark.range keeps a real scan in the plan (a local Seq would be
    // constant-folded into a LocalTableScan, hiding the codegen story)
    val f = spark.range(100).select(col("id").as("k"))
    val bloom = BloomPrune.buildBloom(Seq(1L, 2L).toDF("dk"), "dk", 10L)
    val plan = f.filter(BloomPrune.mightContain(bloom, col("k")))
      .queryExecution.executedPlan.toString
    // codegen spans show as "*(n)" stage prefixes on the Filter line
    assert(plan.linesIterator.exists(l => l.contains("Filter might_contain") && l.contains("*(")),
      s"probe fell out of codegen:\n$plan")
  }
}
