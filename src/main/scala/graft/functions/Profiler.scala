package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep a training-data pipeline
  * runs before ingestion: per column, row/null/distinct counts and
  * string-rendered min/max. One aggregation pass per column, unioned
  * long-form so the output schema is fixed regardless of the profiled
  * table (the same every-column-scan shape Spark's summary() uses, but
  * deterministic and oracle-friendly: no percentile sketches). */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
}
