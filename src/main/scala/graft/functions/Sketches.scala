package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch ALGEBRA — the re-aggregation story behind approximate
  * distinct counts at 100 TB: a KB-sized Datasketches HLL sketch per
  * (range, slice) is computed once at ingest, and any range's distinct
  * count is answered by UNIONING its slices' sketches — register-wise
  * max, so union-of-sketches ≡ sketch-of-union — without rescanning a
  * byte of raw data. `q_approx_distinct` gates the single-shot
  * estimator; this family gates the MERGE. */
object Sketches {

  /** Per-range distinct counts three ways: exact (the gate column),
    * the merged per-slice sketch union's estimate, and the direct
    * whole-range sketch's estimate. Emits one row per range with the
    * exact count plus two 0/1 flags the oracle hashes against literal
    * truth — `est_ok` (the merged estimate is within `relErr` of
    * exact: the sketch honors its documented error bound through the
    * union) and `merge_ok` (merged estimate matches the direct
    * whole-range sketch's estimate within the same `relErr` band —
    * the mergeability law itself, which is what licenses precomputing
    * slice sketches at ingest). merge_ok is TWO-REGIME (r15 advice —
    * the flat ±2 floor let a 2-row range pass with ~100% divergence):
    * below 64 exact keys both sketches are sparse-mode EXACT, so the
    * gate demands est == direct bit-for-bit; at 64+ the band
    * max(n·relErr, 2) absorbs only the sparse→dense promotion
    * boundary, where a union-built vs a directly-built sketch can
    * promote at slightly different cardinalities — a representation
    * detail, not an estimator defect. Scale shape: the slice sketch
    * table is (ranges × slices)-sized with KB rows; the union agg
    * moves sketches, never keys. */
  def mergedDistinct(df: DataFrame, sliceCol: Column, rangeCol: Column,
                     key: Column, relErr: Double = 0.05): DataFrame = {
    val base = df.select(sliceCol.as("_slice"), rangeCol.as("_range"),
      key.as("_key"))
    val sliceSketches = base.groupBy(col("_range"), col("_slice"))
      .agg(hll_sketch_agg(col("_key")).as("_sk"))
    val merged = sliceSketches.groupBy(col("_range"))
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"))).as("_est"))
    val direct = base.groupBy(col("_range"))
      .agg(countDistinct(col("_key")).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("_key"))).as("_direct"))
    merged.join(direct, Seq("_range"))
      .select(col("_range").as("range_key"), col("n_exact"),
        when(abs(col("_est") - col("n_exact")).cast("double")
               <= col("n_exact").cast("double") * relErr, 1L)
          .otherwise(0L).as("est_ok"),
        when((col("n_exact") < 64 && col("_est") === col("_direct")) ||
               (col("n_exact") >= 64 &&
                 abs(col("_est") - col("_direct")).cast("double")
                   <= greatest(col("n_exact").cast("double") * relErr, lit(2.0))), 1L)
          .otherwise(0L).as("merge_ok"))
  }

  /** KLL quantile-sketch MERGE — the percentile sibling of
    * `mergedDistinct`: a KB-sized KLL sketch of a value column per
    * (range, slice) at ingest, merged per range to answer any range's
    * quantiles without re-scanning values. The gate is the published
    * guarantee itself: for each probe probability p, the EXACT
    * normalized MID-rank of the merged sketch's returned quantile —
    * (|v < q| + |v ≤ q|) / 2n, which stays well-defined under heavy
    * ties where the plain ≤-rank of a legitimately-returned quantile
    * can exceed any tolerance (r14 advice) — must sit
    * within `rankTol` of p. KLL's compaction is randomized, so the
    * flag uses the q_approx_distinct margin discipline — `rankTol` =
    * 0.10 ≈ 6× the k=200 sketch's 1.65% rank error, making a flag flip
    * astronomically unlikely while still failing RED on a broken
    * estimator (a random value misses a 10% window easily). One
    * sketch-agg pass + one flag pass over the fact; only sketches and
    * range-keyed scalars cross the wire. */
  def mergedQuantiles(df: DataFrame, sliceCol: Column, rangeCol: Column,
                      value: Column, probs: Seq[Double],
                      rankTol: Double = 0.10): DataFrame = {
    val base = df.select(sliceCol.as("_slice"), rangeCol.as("_range"),
      value.cast("double").as("_v"))
    val sliceSk = base.groupBy(col("_range"), col("_slice"))
      .agg(kll_sketch_agg_double(col("_v")).as("_sk"))
    val ests = sliceSk.groupBy(col("_range"))
      .agg(kll_merge_agg_double(col("_sk")).as("_msk"))
      .select(col("_range") +: probs.indices.map(i =>
        kll_sketch_get_quantile_double(col("_msk"), lit(probs(i)))
          .as(s"_q$i")): _*)
    val rankAggs = count(lit(1)).as("n_rows") +: probs.indices.flatMap(i => Seq(
      sum(when(col("_v") < col(s"_q$i"), 1L).otherwise(0L)).as(s"_lo$i"),
      sum(when(col("_v") <= col(s"_q$i"), 1L).otherwise(0L)).as(s"_hi$i")))
    // Two probs rounding to the same percent would collide on ok_q<p>;
    // disambiguate with the probe index (r14 advice).
    val rawNames = probs.map(p => s"ok_q${(p * 100).round}")
    val okNames = rawNames.zipWithIndex.map { case (nm, i) =>
      if (rawNames.count(_ == nm) > 1) s"${nm}_$i" else nm }
    base.join(broadcast(ests), Seq("_range"))
      .groupBy(col("_range"))
      .agg(rankAggs.head, rankAggs.tail: _*)
      .select(col("_range").as("range_key") +: col("n_rows") +:
        probs.zipWithIndex.map { case (p, i) =>
          when(abs((col(s"_lo$i") + col(s"_hi$i")).cast("double")
                     / (lit(2.0) * col("n_rows").cast("double")) - p)
                 <= rankTol, 1L)
            .otherwise(0L).as(okNames(i))
        }: _*)
  }

  /** Count-Min frequency estimates — the FREQUENCY rung of the sketch
    * family (HLL: distincts, theta: set ops, KLL: quantiles, CMS:
    * per-key counts): one mergeable KB-sized sketch answers "how often
    * does key x occur" for ANY x, the primitive behind streaming
    * heavy-hitter confirmation and per-key rate limiting at 100 TB.
    * The sketch aggregates distributed (Spark's codegen'd
    * `count_min_sketch` with a FIXED seed, so estimates are
    * deterministic per dataset); only the sketch itself — one binary
    * row — and the key dictionary's exact counts reach the driver
    * (metadata-sized, the AQE-class collect the repo's prefix-sum
    * operators already document). Per key the gate row carries the
    * exact count plus the two CMS laws as 0/1 flags: `over_ok`
    * (est ≥ exact — CMS NEVER undercounts, a structural guarantee)
    * and `bound_ok` (est ≤ exact + 2·eps·N — twice the documented
    * overcount slack, the margin discipline for the hash-collision
    * tail; fixed seed ⟹ the flag is stable run to run).
    *
    * Probe-dictionary cap (CONTRACT CHANGE r15, was a hard refusal in
    * r14): when the key has more than `maxKeys` distinct values, the
    * result is the DETERMINISTIC top-`maxKeys` dictionary (count DESC,
    * key ASC — the heavy-hitter prefix, which is what a CMS probe set
    * means) with `truncated` = 1 on every row; at or below the cap the
    * full dictionary comes back with `truncated` = 0. Driver transfer
    * stays bounded at maxKeys+1 rows via a top-k sort-limit either
    * way; callers that previously collected larger dictionaries now
    * get the capped prefix plus the flag instead of an exception. */
  def cmsFrequencies(df: DataFrame, key: Column, eps: Double = 0.001,
                     confidence: Double = 0.99, seed: Int = 42,
                     maxKeys: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.agg(
      count_min_sketch(key, lit(eps), lit(confidence), lit(seed)).as("_sk"),
      count(lit(1)).as("_n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(row.getAs[Array[Byte]]("_sk"))
    val slack = math.ceil(2.0 * eps * row.getLong(1)).toLong
    // The probe-key dictionary reaches the driver, so it must BE a
    // dictionary: a top-k sort-limit bounds the collect at maxKeys + 1
    // rows regardless of key cardinality, and the (count DESC, key ASC)
    // order makes the kept prefix the deterministic heavy-hitter set
    // rather than an arbitrary subset. CMS itself stays fully
    // distributed at any scale.
    val exactAll = df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc)
      .limit(maxKeys + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val truncated = if (exactAll.length > maxKeys) 1L else 0L
    exactAll.take(maxKeys).toSeq.map { case (k, n) =>
      val est = cms.estimateCount(k)
      (k, n, if (est >= n) 1L else 0L, if (est <= n + slack) 1L else 0L,
        truncated)
    }.toDF("key", "n_exact", "over_ok", "bound_ok", "truncated")
  }

  /** Theta-sketch SET operations — what HLL cannot do: distinct
    * INTERSECTION and DIFFERENCE across audiences without holding the
    * key sets (audience overlap, incremental-ingest novelty, consent
    * subtraction — the segment arithmetic a 100 TB events store
    * answers from KB-sized sketches). One pass over the fact builds
    * both audience sketches AND the exact reference counts
    * (conditional distinct aggs); the output row carries the exact
    * |A|, |B|, |A∩B|, |A∪B| plus bounded-error 0/1 flags for the
    * sketch estimates of ∩, ∪ and A∖B, which the oracle hashes
    * against literal truth (the q_approx_distinct contract). Below
    * the sketch's nominal-entry budget theta estimates are EXACT, so
    * the gated flags are deterministic with margin to spare. */
  def thetaSetOps(df: DataFrame, key: Column, inA: Column, inB: Column,
                  relErr: Double = 0.05, absSlack: Long = 2L): DataFrame = {
    def ok(est: Column, exact: Column): Column =
      when(abs(est.cast("double") - exact.cast("double"))
             <= greatest(exact.cast("double") * relErr, lit(absSlack.toDouble)),
        1L).otherwise(0L)
    // Dedup the key ONCE, then count flags (r15): the previous three
    // count(DISTINCT …) in one aggregate planned an Expand that
    // tripled every fact row before a (gid, key)-keyed dedup — the
    // 32× scale probe measured the gate super-linear on a growing key
    // population. One key-keyed aggregation replaces it, and the theta
    // sketches build over the deduped keys UNCHANGED: theta updates
    // are idempotent per key, so the sketch over the distinct key set
    // is bit-identical to the one over the multiset.
    val flags = df.groupBy(key.as("_k"))
      .agg(max(when(inA, 1L).otherwise(0L)).as("_a"),
        max(when(inB, 1L).otherwise(0L)).as("_b"))
    flags.agg(
        theta_sketch_agg(when(col("_a") === 1, col("_k"))).as("_ska"),
        theta_sketch_agg(when(col("_b") === 1, col("_k"))).as("_skb"),
        sum(col("_a")).as("n_a"),
        sum(col("_b")).as("n_b"),
        sum(when(col("_a") === 1 || col("_b") === 1, 1L).otherwise(0L)).as("n_union"))
      .withColumn("n_inter", col("n_a") + col("n_b") - col("n_union"))
      .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
        ok(theta_sketch_estimate(theta_intersection(col("_ska"), col("_skb"))),
          col("n_inter")).as("inter_ok"),
        ok(theta_sketch_estimate(theta_union(col("_ska"), col("_skb"))),
          col("n_union")).as("union_ok"),
        ok(theta_sketch_estimate(theta_difference(col("_ska"), col("_skb"))),
          col("n_a") - col("n_inter")).as("diff_ok"))
  }
}
