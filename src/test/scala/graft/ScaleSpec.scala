package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ReportUpsert, Skew}

class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def reports(rows: (String, Double, String, Long)*): DataFrame =
    rows.toSeq.toDF("dt", "total_spent", "version", "total_transactions")
      .selectExpr("to_date(dt) AS begin_date", "to_date(dt) AS end_date",
        "total_spent", "version", "total_transactions")

  test("partitioned merge rewrites only touched date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/reports"
    ReportUpsert.mergeIntoPartitioned(dir,
      reports(("2024-01-01", 10.0, "v1", 5L), ("2024-01-02", 20.0, "v1", 8L)))
    val p1 = new java.io.File(s"$dir/begin_date=2024-01-01")
    val p2 = new java.io.File(s"$dir/begin_date=2024-01-02")
    assert(p1.exists() && p2.exists())
    val p2FilesBefore = p2.listFiles().map(_.getName).toSet

    // Second batch touches only 2024-01-01 (grown) + a new date.
    ReportUpsert.mergeIntoPartitioned(dir,
      reports(("2024-01-01", 12.0, "v2", 9L), ("2024-01-03", 3.0, "v2", 1L)))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[java.sql.Date]("begin_date").toString ->
        (r.getAs[String]("version"), r.getAs[Long]("total_transactions"))).toMap
    assert(out("2024-01-01") == ("v2", 9L))   // grown -> updated
    assert(out("2024-01-02") == ("v1", 8L))   // untouched partition intact
    assert(out("2024-01-03") == ("v2", 1L))   // new partition inserted
    // untouched partition files were not rewritten
    assert(p2.listFiles().map(_.getName).toSet == p2FilesBefore)
  }

  test("partitioned merge no-ops on equal counts (P5 guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part2").toString + "/reports"
    ReportUpsert.mergeIntoPartitioned(dir, reports(("2024-01-01", 10.0, "v1", 5L)))
    ReportUpsert.mergeIntoPartitioned(dir, reports(("2024-01-01", 11.0, "replay", 5L)))
    val row = spark.read.parquet(dir).collect().head
    assert(row.getAs[String]("version") == "v1")
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 90% of left rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", "payload", 8)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 901)
  }

  test("saltedSum equals direct decimal sum") {
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i / 100.0))
      .toDF("k", "v").withColumn("rowid", monotonically_increasing_id())
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, "k", "v", "rowid", 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }
}
