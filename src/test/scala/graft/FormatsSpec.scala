package graft

import org.apache.spark.sql.functions._
import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.001")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("CSV roundtrip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/li"
    val src = li.limit(500)
    Formats.writeCsv(src, dir)
    val back = Formats.readCsv(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(canon(back) == canon(src))
  }

  test("ORC roundtrip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/li"
    val src = li.limit(500)
    Formats.writeOrc(src, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema == src.schema)
    assert(canon(back) == canon(src))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Formats.writeBucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
      Formats.writeBucketed(Tables.orders(spark, "/root/testdata/sf0.001")
        .select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
