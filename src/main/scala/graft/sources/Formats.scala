package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond the corpus's parquet: CSV and ORC
  * read/write with schema-stable roundtrips, and bucketed tables for
  * shuffle-free co-located joins.
  *
  * The reference ingests HTTP+JSON and writes Snowflake only
  * (SURVEY §2.1); an engine replacing it needs the standard lake
  * formats. Parquet stays the canonical store (Tables).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  /** CSV re-read with the writer's schema (CSV is typeless; the schema
    * must travel alongside — here taken from the source frame). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write both sides of a join bucketed by the join key into the
    * session catalog: subsequent equi-joins on that key are
    * co-partitioned — SortMergeJoin WITHOUT a shuffle Exchange on
    * either side. This is the at-rest co-location strategy for the
    * 100 TB fact-fact joins AQE cannot broadcast. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"table name must be a bare identifier (no path separators), got '$table'")
    val spark = df.sparkSession
    // A stale warehouse directory from a previous session (fresh
    // in-memory metastore has no entry for it) makes saveAsTable fail
    // with locationAlreadyExists even in Overwrite mode — drop both
    // the catalog entry and the orphaned location first.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Resolve the warehouse dir with Hadoop Path semantics and delete
    // ONLY the table's own subdirectory — guarded so a misconfigured
    // warehouse value can never aim the recursive delete anywhere
    // else. Through LakeFs (r18): the warehouse may live on the
    // cluster's default FS, where a java.io.File delete would silently
    // miss the stale location and saveAsTable would still fail.
    val whDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(whDir, table)
    val isTableDir = loc.getParent == whDir && loc.getName == table
    if (isTableDir) graft.LakeFs.delete(loc.toString)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Small-file compaction — the table-maintenance pass a parquet lake
    * runs continuously at 100 TB: rewrite a directory into files of
    * roughly `targetBytes`, sized from the MEASURED input bytes so the
    * output file count tracks data volume, not the historical write
    * pattern (a streaming sink's thousand 100 KB files become a
    * handful of right-sized ones; scans stop paying per-file open +
    * footer cost). `repartition(n)` balances bytes across the output
    * files — `coalesce` would be shuffle-free but inherits the input's
    * skew, which is the problem being fixed. The rewrite is staged and
    * swapped with the backup discipline of the MERGE sinks, on the
    * Hadoop FS API via `LakeFs` (r18 — the pass its own scaladoc calls
    * 100 TB-critical previously ran `java.io.File` + `ATOMIC_MOVE`,
    * i.e. local-disk only): loud-fail renames, and
    * `recoverCompact(dir)` on entry restores the invariant after a
    * crash at ANY swap point (a leftover `_old` with the live dir
    * missing holds the complete pre-compact table and is re-promoted;
    * a stale `_compacting` or post-swap `_old` is dropped). Readers
    * only ever see the old complete table or the new one. Returns the
    * output file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    recoverCompact(dir)
    def parquetFiles(d: String): Seq[org.apache.hadoop.fs.FileStatus] =
      graft.LakeFs.list(d)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = parquetFiles(dir).map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val staged = dir + "_compacting"
    val bak = dir + "_old"
    spark.read.parquet(dir).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    crashPoint(0)
    graft.LakeFs.move(dir, bak)
    crashPoint(1)
    graft.LakeFs.move(staged, dir)
    crashPoint(2)
    graft.LakeFs.delete(bak)
    parquetFiles(dir).size
  }

  /** Restore the `compact` directory invariant after a crash at any
    * point of its swap sequence (invoked on entry by `compact`; safe
    * to call any time the directory is quiescent). */
  def recoverCompact(dir: String): Unit = {
    if (!graft.LakeFs.exists(dir) && graft.LakeFs.exists(dir + "_old"))
      // crash between the two swap renames: the backup holds the
      // complete pre-compact table — promote it (the compaction
      // simply re-runs)
      graft.LakeFs.move(dir + "_old", dir)
    else
      // swap completed but cleanup crashed: the live dir is the
      // compacted table and the backup is redundant
      graft.LakeFs.delete(dir + "_old")
    // an unswapped staged rewrite is never promoted — incomplete or
    // superseded; the next compact re-writes it
    graft.LakeFs.delete(dir + "_compacting")
  }

  /** Test seam: throw after swap stage `n` of `compact` (0 = staged
    * rewrite written, 1 = live dir moved to backup, 2 = staged dir
    * promoted to live) — the crash-matrix spec drives every point and
    * asserts `recoverCompact` + re-run converge to the golden result. */
  private[graft] var crashAfterStage: Option[Int] = None
  private def crashPoint(stage: Int): Unit =
    if (crashAfterStage.contains(stage))
      throw new IllegalStateException(s"injected crash after compact stage $stage")

  /** Morton (Z-order) value of two bucketized non-negative ints: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure bitwise
    * column expressions — codegen'd, map-side. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  private def bucketize(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val range = (mx - mn).cast("double")
    when(range === 0.0, lit(0L))
      .otherwise(((c - mn).cast("double") / range * ((1L << bits) - 1)).cast("long"))
  }

  /** Z-order layout: cluster rows so that per-file min/max statistics
    * prune scans on EITHER of two columns — the multi-dimensional
    * data-skipping layout (Delta/Iceberg's OPTIMIZE ZORDER, public
    * semantics) that a single-column sort cannot give. Each column is
    * scaled onto a 2^bits grid between its own min and max (one
    * broadcast stats row), the Morton interleave of the two grid
    * coordinates becomes the clustering key, and rows are
    * range-partitioned + locally sorted by it — so every output
    * partition covers a compact tile of the (a, b) plane and a range
    * predicate on either column overlaps only the tiles it crosses.
    * Write the result with any sink above; at 100 TB this is the
    * difference between scanning a row-group strip and scanning the
    * table for the second column's predicates. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
               partitions: Int, bits: Int = 16): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val stats = df.agg(
      min(col(colA)).as("_mna"), max(col(colA)).as("_mxa"),
      min(col(colB)).as("_mnb"), max(col(colB)).as("_mxb"))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue(
        bucketize(col(colA), col("_mna"), col("_mxa"), bits),
        bucketize(col(colB), col("_mnb"), col("_mxb"), bits), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_mna", "_mxa", "_mnb", "_mxb")
  }
}
