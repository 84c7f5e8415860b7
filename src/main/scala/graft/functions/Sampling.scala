package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — reproducibility
  * primitives for training-data pipelines. Membership is a pure
  * function of a key column (md5-derived integer), NOT rand(): the
  * same row lands in the same sample/split on every run, every
  * engine, every cluster size, and under task retries. At 100 TB this
  * also means a sample can be recomputed from scratch instead of
  * stored.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from a key column —
    * the first 8 md5 hex chars as an integer (engine-portable: DuckDB
    * computes the identical value via CAST('0x'||substr(md5(..)..) AS
    * BIGINT)). */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep ~pct percent of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 100) < pct)

  /** Assign train/val/test splits by key: `valPct` and `testPct`
    * percent go to val/test, the rest to train. */
  def withSplit(df: DataFrame, keyCol: String, valPct: Int, testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), 100) < valPct, lit("val"))
        .when(hashBucket(col(keyCol), 100) < valPct + testPct, lit("test"))
        .otherwise(lit("train")))

  /** Stratified deterministic sample: the SAME per-key rule inside
    * every stratum — stratum sizes stay proportional without a
    * per-stratum pass (keys are uniform within strata). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       pct: Int): DataFrame =
    deterministicSample(df, keyCol, pct)

  /** Per-stratum sampling fractions — the rebalancing primitive for
    * training mixes (e.g. downsample the dominant language, keep all
    * of a rare one). Same deterministic per-key rule; a stratum absent
    * from `fractions` is dropped entirely (fraction 0). Single
    * map-side filter, no shuffle, retry-stable, recomputable. */
  def stratifiedSampleByFractions(df: DataFrame, keyCol: String,
                                  strataCol: String,
                                  fractions: Map[String, Int]): DataFrame = {
    val pctCol = fractions.foldLeft(lit(0)) { case (acc, (stratum, pct)) =>
      when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < pctCol)
  }
}
