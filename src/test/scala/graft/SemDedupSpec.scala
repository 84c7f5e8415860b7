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
}
