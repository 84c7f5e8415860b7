package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep a training-data pipeline
  * runs before ingestion: per column, row/null/distinct counts and
  * string-rendered min/max (typed min/max, rendered after — string
  * ordering would corrupt numeric columns).
  *
  * ONE scan for all columns: every stat lives in a single aggregate,
  * then the 1-row result is exploded long-form (fixed output schema
  * regardless of the profiled table). The multiple exact
  * `countDistinct`s plan via Expand — input rows duplicate per distinct
  * group but each duplicate carries only its own column, so total
  * volume ≈ one projected scan; at 100 TB that beats the N full scans
  * of the one-aggregation-per-column form this replaces. Swap
  * `approx_count_distinct` in where exactness isn't gated and the
  * Expand disappears entirely. */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val rows = columns.map { c =>
      struct(
        lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_null_$c").as("n_null"), col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"), col(s"_max_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
