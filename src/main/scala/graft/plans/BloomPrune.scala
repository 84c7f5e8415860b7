package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.GraftSqlBridge

/** Explicit bloom-filter semi-join pruning — the operator form of the
  * runtime filter Spark's AQE injects for selective joins, exposed so a
  * pipeline can apply it deliberately (AQE only triggers on its own
  * selectivity heuristics, and only inside one query's plan — this form
  * also lets the built filter be REUSED across queries of a session).
  *
  * The 100 TB case: semi-join a huge fact table against a dim whose
  * row set is too large to broadcast-hash-join but whose KEY SET fits
  * a bloom filter (millions of keys ≈ ~1 MB at 3% fpp). The bloom
  * prunes fact rows BEFORE the join exchange, so the shuffle moves
  * only candidate rows (matches + fpp·non-matches) instead of the full
  * fact table; the exact semi join afterwards removes the false
  * positives, so the RESULT is exact regardless of fpp.
  *
  * Mechanics reuse Spark's own runtime-filter expressions (the same
  * hash discipline `InjectRuntimeFilter` uses, so build and probe
  * agree): build = `BloomFilterAggregate` over `xxhash64(key)` on the
  * dim side — distributed partial blooms OR-merged, one sketch
  * collected to the driver; probe = `BloomFilterMightContain` with the
  * serialized sketch embedded as a binary literal (shipped once per
  * task like any literal, evaluated codegen'd per row).
  */
object BloomPrune {

  /** Serialized bloom filter over `xxhash64(dim(key))`.
    * `expectedItems` sizes the sketch (and therefore the binary
    * literal embedded in the probe plan — ~1.2 bytes/item at the
    * default fpp); pass `autoSize` to size it from an exact count of
    * the dim side (one extra pushdown-friendly job — the standard
    * sizing pass, and what keeps a 100 TB plan from carrying a
    * megabyte literal for a 30k-key dim). Must stay within
    * spark.sql.optimizer.runtime.bloomFilter.maxNumItems (4M default);
    * at larger key cardinality raise the conf or shard the filter. */
  val autoSize: Long = -1L

  def buildBloom(dim: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val n =
      if (expectedItems > 0) expectedItems
      else math.max(1000L, dim.count())
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(col(key))),
      Literal(n)).toAggregateExpression()
    dim.select(GraftSqlBridge.column(agg)).head().getAs[Array[Byte]](0)
  }

  /** Membership probe column against a serialized bloom. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftSqlBridge.expression(xxhash64(key))))

  /** The fact rows surviving the bloom probe: a SUPERSET of the true
    * semi-join result (false positives possible, false negatives not).
    * Exposed for tests and for callers that follow with their own
    * exact verification. */
  def prunedCandidates(fact: DataFrame, factKey: String,
                       dim: DataFrame, dimKey: String,
                       expectedItems: Long = autoSize): DataFrame =
    fact.filter(mightContain(buildBloom(dim, dimKey, expectedItems), col(factKey)))

  /** Exact semi join with bloom pre-pruning: bloom-filter the fact
    * scan, then exact left-semi join the survivors against the dim
    * keys. Equivalent to `fact SEMI JOIN dim` row-for-row; the bloom
    * only shrinks what reaches the join exchange. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedItems: Long = autoSize): DataFrame = {
    val candidates = prunedCandidates(fact, factKey, dim, dimKey, expectedItems)
    // Bind the join condition to each side explicitly: an unqualified
    // col(dimKey) is ambiguous when factKey == dimKey (the usual
    // natural-keyed case) and analysis would fail.
    val dk = dim.select(col(dimKey)).distinct()
    candidates.join(dk, candidates(factKey) === dk(dimKey), "left_semi")
  }
}
