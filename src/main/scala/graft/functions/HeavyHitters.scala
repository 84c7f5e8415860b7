package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters: approximate top-k most frequent terms in
  * one pass with bounded memory — the custom typed Aggregator the
  * engine exposes for corpus-vocabulary analysis at 100 TB, where an
  * exact groupBy on tokens shuffles the full token stream and a
  * capacity-bounded sketch does not.
  *
  * Guarantees (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", ICDT 2005): with capacity m over n
  * items, every reported count over-estimates by at most n/m, and any
  * item with true frequency > n/m is guaranteed present.
  *
  * The buffer is a plain (term -> (count, error)) map capped at
  * `capacity`; merge is the standard pairwise SpaceSaving union. The
  * buffer is encoded with a Catalyst ExpressionEncoder (MapType of
  * string -> struct), NOT Kryo: Kryo's FieldSerializer needs
  * `--add-opens java.base/java.nio` on JDK 17+, so a Kryo buffer makes
  * the operator fail under any launcher that doesn't add Spark's
  * module opens, and its opaque binary blob defeats Tungsten anyway.
  */
object HeavyHitters {

  type Buf = Map[String, (Long, Long)] // term -> (count, maxError)

  final case class TermCount(term: String, count: Long, max_error: Long)

  def aggregator(capacity: Int, k: Int): Aggregator[String, Buf, Seq[TermCount]] =
    new Aggregator[String, Buf, Seq[TermCount]] {

      override def zero: Buf = Map.empty

      override def reduce(b: Buf, term: String): Buf =
        b.get(term) match {
          case Some((c, e)) => b.updated(term, (c + 1, e))
          case None if b.size < capacity => b.updated(term, (1L, 0L))
          case None =>
            // evict the current minimum; its count becomes the error bound
            val (minTerm, (minC, _)) = b.minBy { case (t, (c, _)) => (c, t) }
            (b - minTerm).updated(term, (minC + 1, minC))
        }

      override def merge(a: Buf, b: Buf): Buf = {
        // standard union: add counts for shared terms; a term missing
        // from a full buffer could have been evicted with count up to
        // that buffer's OWN minimum — substitute minA for terms absent
        // from a, minB for terms absent from b (both upper bounds, so
        // the over-estimate guarantee survives the merge)
        val minA = if (a.size < capacity) 0L else a.values.map(_._1).min
        val minB = if (b.size < capacity) 0L else b.values.map(_._1).min
        val union = (a.keySet ++ b.keySet).iterator.map { t =>
          val (ca, ea) = a.getOrElse(t, (minA, minA))
          val (cb, eb) = b.getOrElse(t, (minB, minB))
          t -> (ca + cb, ea + eb)
        }.toSeq
        // keep the top `capacity` by count (tie-break on term for determinism)
        union.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity).toMap
      }

      override def finish(b: Buf): Seq[TermCount] =
        b.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
          .map { case (t, (c, e)) => TermCount(t, c, e) }

      override def bufferEncoder: Encoder[Buf] =
        ExpressionEncoder[Buf]()
      override def outputEncoder: Encoder[Seq[TermCount]] =
        ExpressionEncoder[Seq[TermCount]]()
    }

  /** Heavy-hitter terms over the documents corpus: explode tokens,
    * run the sketch as a typed aggregation, return one row per
    * reported term (term, count, max_error). */
  def topDocTerms(docs: org.apache.spark.sql.DataFrame,
                  capacity: Int, k: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tokens = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .as[String]
    tokens.select(aggregator(capacity, k).toColumn.name("hh"))
      .select(explode(col("hh")).as("t"))
      .select(col("t.term").as("term"), col("t.count").as("count"),
        col("t.max_error").as("max_error"))
  }
}
