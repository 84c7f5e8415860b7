package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{HeavyHitters, TextAnalysis}

/** Continuous corpus heavy hitters: the streaming form of
  * `HeavyHitters.topDocTerms` (SpaceSaving, Metwally et al. 2005).
  *
  * Distribution: state lives per SHARD (`xxhash64(term) pmod nShards`),
  * each shard holding one capacity-bounded SpaceSaving buffer in
  * `flatMapGroupsWithState` — never a single global-key bottleneck.
  * Every term is routed to exactly ONE shard, so each shard's buffer
  * is an independent SpaceSaving sketch over a disjoint term
  * substream: per-shard counts keep the n_shard/capacity
  * over-estimate bound, and merging shard outputs (disjoint term
  * sets — a plain union + global top-k, no pairwise sketch merge) is
  * exact over the sketches. State per shard is O(capacity); total
  * state O(nShards·capacity) regardless of stream length — the
  * bounded-state requirement for running forever.
  *
  * Emits each updated shard's CURRENT top-k per micro-batch
  * (update-mode rows keyed by (shard, term)); `mergedTopK` folds the
  * latest shard snapshots into the global top-k.
  */
object StreamingHeavyHitters {

  final case class ShardTop(shard: Long, term: String, count: Long, max_error: Long)

  /** Per-shard SpaceSaving update: fold the batch's terms into the
    * buffer with the SAME reduce step as the batch aggregator (one
    * code path, one semantics), then report the shard's top-k. */
  private def updateShard(capacity: Int, k: Int)(
      shard: Long,
      rows: Iterator[(Long, String)],
      state: GroupState[HeavyHitters.Buf]): Iterator[ShardTop] = {
    val agg = HeavyHitters.aggregator(capacity, k)
    val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
      case (b, (_, term)) => agg.reduce(b, term)
    }
    state.update(buf)
    agg.finish(buf).iterator.map(t => ShardTop(shard, t.term, t.count, t.max_error))
  }

  /** Wire over a documents stream (doc_id, text, ...): explode tokens,
    * shard by term hash, maintain per-shard SpaceSaving state. */
  def shardedTopTerms(docs: DataFrame, nShards: Int, capacity: Int,
                      k: Int): Dataset[ShardTop] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .select(pmod(xxhash64(col("term")), lit(nShards.toLong)).as("shard"), col("term"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        updateShard(capacity, k))
  }

  /** Global top-k from per-(shard, term) snapshot rows (as landed by an
    * update-mode memory/Delta sink). Update-mode sinks append one row
    * per state UPDATE, so the same term can appear once per generation
    * — first reduce to the latest generation per (shard, term), then
    * take the global top-k. SpaceSaving counts are monotone per term
    * within a shard (a re-admitted term enters at the then-current
    * min+1, which is ≥ its count at eviction), so "latest" = max count;
    * the struct-max carries that generation's max_error along. Shards
    * own disjoint term sets, so after the reduce the global view is a
    * plain union + top-k — no cross-shard reconciliation. */
  def mergedTopK(snapshot: DataFrame, k: Int): DataFrame =
    snapshot
      .groupBy(col("shard"), col("term"))
      .agg(max(struct(col("count"), col("max_error"))).as("_m"))
      .select(col("term"), col("_m.count").as("count"), col("_m.max_error").as("max_error"))
      .orderBy(col("count").desc, col("term").asc)
      .limit(k)
}
