package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
    // Resolve the warehouse dir with Hadoop Path semantics (handles
    // plain paths, file: URIs, AND unescaped characters like spaces
    // that java.net.URI rejects), then delete ONLY the table's own
    // subdirectory — guarded so a misconfigured warehouse value can
    // never aim the recursive delete anywhere else.
    val whDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath
    val loc = new java.io.File(whDir, table)
    val isTableDir =
      loc.getCanonicalFile.getParentFile == new java.io.File(whDir).getCanonicalFile &&
        loc.getCanonicalFile.getName == table
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      if (f.exists()) f.delete()
    }
    if (isTableDir) rm(loc)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
