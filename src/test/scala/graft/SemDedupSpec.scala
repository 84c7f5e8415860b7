package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Synthetic

/** SemDeDup invariants (the oracle gates the full summary; these pin
  * the semantic properties the summary can't see). */
class SemDedupSpec extends SparkSpec {

  test("semDedup: partition of the corpus; planted exact dups dropped; impossible threshold keeps all") {
    val emb = Synthetic.embeddings(spark, 400, nLabels = 8)
    val out = Similarity.semDedup(emb, 8, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // every vector exactly once
    assert(out.length == 400 && out.map(_._1).distinct.length == 400)
    // planted structure: id % 50 == 1 duplicates id-1 EXACTLY (same
    // embedding -> same cell by the deterministic argmin, cosine 1.0
    // >= 0.99) -> the higher id must be dropped, its base kept
    val kept = out.filter(_._3).map(_._1).toSet
    val planted = (0L until 400L).filter(id => id % 50 == 1)
    planted.foreach { id =>
      assert(!kept.contains(id), s"planted dup $id survived")
      // at 0.99 only the exact planted pairs fire, so every base survives
      assert(kept.contains(id - 1), s"base ${id - 1} unexpectedly dropped")
    }
    // threshold above 1.0 can never fire -> everything kept
    val all = Similarity.semDedup(emb, 8, 2, 1.01)
    assert(all.filter(!col("kept")).count() == 0)
    // repartition-invariant
    val again = Similarity.semDedup(emb.repartition(7), 8, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)
    assert(again.toSeq == out.sortBy(_._1).toSeq)
  }

  test("autoSemDedupK: constant cell occupancy; auto path equals pinned k") {
    // k = ceil(n / targetCell): occupancy stays ~targetCell as n grows
    assert(Similarity.autoSemDedupK(0) == 1)
    assert(Similarity.autoSemDedupK(64) == 1)
    assert(Similarity.autoSemDedupK(65) == 2)
    assert(Similarity.autoSemDedupK(500) == 8)   // the gated testdata point
    assert(Similarity.autoSemDedupK(2000) == 32) // sf0.1 bench point
    assert(Similarity.autoSemDedupK(2000000) == 31250)
    // 10x corpus at constant occupancy: k grows 10x, cells stay ~64
    val k1 = Similarity.autoSemDedupK(100000)
    val k10 = Similarity.autoSemDedupK(1000000)
    assert(k10 >= 9 * k1 && k10 <= 11 * k1)
    // k <= 0 auto-sizes from the measured corpus: 400 vecs -> k = 7,
    // and the result must EQUAL the explicitly pinned k = 7 run
    val emb = Synthetic.embeddings(spark, 400, nLabels = 8)
    val auto = Similarity.semDedup(emb, 0, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)
    val pinned = Similarity.semDedup(emb, Similarity.autoSemDedupK(400), 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)
    assert(Similarity.autoSemDedupK(400) == 7)
    assert(auto.toSeq == pinned.toSeq)
    // partition of the corpus holds on the auto path too
    assert(auto.length == 400 && auto.map(_._1).distinct.length == 400)
  }

  test("semDedupHier: planted exact dups co-cell and dropped; cells bounded by k1*k2; auto sizing") {
    val emb = Synthetic.embeddings(spark, 400, nLabels = 8)
    val out = Similarity.semDedupHier(emb, 3, 3, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // partition of the corpus; cell ids live in [0, k1*k2)
    assert(out.length == 400 && out.map(_._1).distinct.length == 400)
    assert(out.forall(r => r._2 >= 0 && r._2 < 9))
    // a vector and its EXACT duplicate take the same path through both
    // levels (deterministic argmin on identical dims), so every
    // planted pair is co-cell and the higher id drops at 0.99
    val byId = out.map(r => r._1 -> r).toMap
    (0L until 400L).filter(_ % 50 == 1).foreach { id =>
      assert(byId(id)._2 == byId(id - 1)._2,
        s"exact dup $id landed in a different cell than its base")
      assert(!byId(id)._3, s"planted dup $id survived")
      assert(byId(id - 1)._3, s"base ${id - 1} unexpectedly dropped")
    }
    // impossible threshold keeps everything
    assert(Similarity.semDedupHier(emb, 3, 3, 2, 1.01)
      .filter(!col("kept")).count() == 0)
    // k <= 0 auto-sizes both levels: 400 vecs -> ceil(sqrt(400/64)) = 3,
    // and must equal the explicitly pinned (3, 3) run
    assert(Similarity.autoSemDedupHierK(400) == 3)
    assert(Similarity.autoSemDedupHierK(500) == 3)    // the gated point
    assert(Similarity.autoSemDedupHierK(2000000) == 177) // vs flat 31250
    val auto = Similarity.semDedupHier(emb, 0, 0, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(auto.toSeq == out.sortBy(_._1).toSeq)
    // repartition-invariant, like the flat form
    val again = Similarity.semDedupHier(emb.repartition(7), 3, 3, 2, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(again.toSeq == out.sortBy(_._1).toSeq)
  }
}
