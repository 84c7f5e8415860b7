package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deterministic code-point sweep for the BPE trainer: the engine must
  * agree with a textbook driver-side trainer for words containing ANY
  * char — including the Unicode line terminators (u0085, u2028, u2029)
  * that Java's "." skips without DOTALL (they are not Java \s, so they
  * sit INSIDE words; an unwrapped one would glue onto its neighboring
  * symbol on the train side while the apply-side \S wrap and the
  * DuckDB oracle's RE2 "." treat them as ordinary chars). Complements
  * GraftProps' randomized property, which found this class of
  * divergence by shrinking into control characters. */
class BpeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def referenceBpe(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    def spaceTrim(s: String) = s.replaceAll("^ +| +$", "")
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(t => spaceTrim(t.toLowerCase(java.util.Locale.ROOT)).split("\\s+", -1).toSeq)
      .groupBy(identity).map { case (w, ws) => w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))) -> ws.length.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var dry = false
    while (out.length < nMerges && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val max = counts.values.max
        val (l, r) = counts.toSeq.collect { case (p, c) if c == max => p }.min(TestRefs.utf8PairOrd)
        out += ((l, r, max))
        vocab = vocab.groupBy { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length)
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          b.result()
        }.map { case (merged, entries) => merged -> entries.values.sum }
      }
    }
    out.toSeq
  }

  test("bpeTrain agrees with the reference for every low/control/terminator code point") {
    def hex(s: String) = s.map(c => f"u${c.toInt}%04x").mkString(" ")
    val suspects = (0 to 0x30).map(_.toChar) ++ (0x7f to 0xa0).map(_.toChar) ++
      Seq('', ' ', ' ', ' ', ' ', '　')
    val diverged = suspects.flatMap { c =>
      val texts = Seq("a" + c, "a")
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(d, 1).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val ref = referenceBpe(texts, 1)
      if (got == ref) None
      else Some(s"c=${f"u${c.toInt}%04x"} got=${got.map(t => (hex(t._1), hex(t._2), t._3))} " +
        s"ref=${ref.map(t => (hex(t._1), hex(t._2), t._3))}")
    }
    assert(diverged.isEmpty, diverged.mkString("; "))
  }
}
