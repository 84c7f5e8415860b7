package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.util.sketch.BloomFilter

/** Column builders over Spark's native bloom-filter expressions — the
  * same codegen'd machinery Catalyst's runtime-filter join pruning
  * uses (`InjectRuntimeFilter`), exposed for library operators that
  * build and probe a set-membership sketch explicitly (incremental
  * ingestion dedup). Both sides hash through `xxhash64`, matching the
  * aggregate's LongType input contract; no UDFs anywhere. */
object Bloom {

  /** Aggregate a LongType column into a serialized bloom filter
    * (BinaryType, one value). Sized by `optimalNumOfBits(expectedItems,
    * fpp)` — bounded driver memory regardless of input row count. */
  def bloom_agg(values: Column, expectedItems: Long, fpp: Double): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(values),
        Literal(expectedItems),
        Literal(BloomFilter.optimalNumOfBits(expectedItems, fpp)))
        .toAggregateExpression())

  /** Probe a serialized bloom filter (a literal binary) with a
    * LongType value: false means definitely-absent, true means
    * possibly-present — exactness downstream comes from verifying the
    * trues, never from trusting them. */
  def might_contain(bloom: Column, value: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(value)))
}
