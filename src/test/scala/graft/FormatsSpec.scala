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

  test("compact: many small files become few sized ones, content byte-identical") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate a streaming sink's fragmentation: 64 tiny files
    li.repartition(64).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before == 64)
    val checksumBefore = graft.functions.Checksum.tableChecksum(
      li.sparkSession.read.parquet(dir), li.columns.map(org.apache.spark.sql.functions.col).toSeq)
      .head().toSeq
    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val after = graft.sources.Formats.compact(spark, dir, targetBytes = totalBytes / 4 + 1)
    assert(after <= 4, s"expected <= 4 files, got $after")
    assert(after == new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet")))
    // order-independent checksum proves content identity, not just counts
    val checksumAfter = graft.functions.Checksum.tableChecksum(
      spark.read.parquet(dir), li.columns.map(org.apache.spark.sql.functions.col).toSeq)
      .head().toSeq
    assert(checksumAfter == checksumBefore)
    assert(!new java.io.File(dir + "_old").exists() &&
      !new java.io.File(dir + "_compacting").exists(), "staging cleaned up")
  }

  test("compact crash MATRIX: recover + re-run converge at every swap point (file: URIs)") {
    // The staged-swap sequence has three inter-stage crash points
    // (staged written / live→backup / staged→live). At EVERY point, a
    // re-run after the crash must converge to the same compacted
    // content, with no staging litter — exercised against
    // scheme-qualified file: URIs so the paths travel the Hadoop FS
    // resolution (the r18 port off java.io.File), like the OCC matrix.
    val src = li.limit(800).localCheckpoint()
    val cols = src.columns.map(col).toSeq
    def checksum(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      graft.functions.Checksum.tableChecksum(df, cols).head().toSeq
    val golden = checksum(src)
    for (stage <- 0 to 2) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_cc$stage").toString
      val dir = "file:" + base + "/t"
      src.repartition(16).write.parquet(dir)
      Formats.crashAfterStage = Some(stage)
      try {
        val e = intercept[IllegalStateException] {
          Formats.compact(spark, dir, targetBytes = Long.MaxValue)
        }
        assert(e.getMessage.contains("injected crash"), e.getMessage)
      } finally Formats.crashAfterStage = None
      // a reader arriving between crash and re-run must see a complete
      // table (recoverCompact restores it without re-running compact)
      Formats.recoverCompact(dir)
      assert(checksum(spark.read.parquet(dir)) == golden,
        s"stage $stage: recovered table must be complete")
      val after = Formats.compact(spark, dir, targetBytes = Long.MaxValue)
      assert(after == 1, s"stage $stage: expected 1 output file, got $after")
      assert(checksum(spark.read.parquet(dir)) == golden,
        s"stage $stage: content must survive the crash + re-run")
      assert(!graft.LakeFs.exists(dir + "_old") &&
        !graft.LakeFs.exists(dir + "_compacting"),
        s"stage $stage: staging litter must be cleaned up")
    }
  }

  test("renameNoReplace on file: scheme is an atomic hard-link CAS — one winner under a race") {
    // RawLocalFs implements Rename.NONE as exists-check + POSIX rename
    // (silently replacing), so two racing claimants could both "win"
    // in the TOCTOU window. The file: branch uses link(2) (EEXIST is
    // atomic in the kernel): race N claimants, exactly one wins, and
    // the published file holds the winner's content.
    val base = java.nio.file.Files.createTempDirectory("graft_cas").toString
    val dst = s"file:$base/lock"
    val n = 16
    val claims = (0 until n).map { i =>
      val c = s"file:$base/claim_$i"
      graft.LakeFs.writeUtf8(c, s"writer-$i")
      c
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val wins = claims.zipWithIndex.map { case (c, i) =>
      Future { gate.await(); (i, graft.LakeFs.renameNoReplace(c, dst)) }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(wins), 60.seconds)
    val winners = results.filter(_._2)
    assert(winners.size == 1, s"expected exactly one CAS winner, got $winners")
    assert(graft.LakeFs.readUtf8(dst) == s"writer-${winners.head._1}",
      "published content must be the winner's")
    // losers' claims remain for the caller to clean; the winner's is consumed
    assert(!graft.LakeFs.exists(claims(winners.head._1)))
    // no ORPHANED ChecksumFs .crc siblings: FileContext.create writes
    // one per claim on file:, and the link-based CAS must clean the
    // winner's (losers' stay PAIRED with their live claim files until
    // the caller's crc-aware delete removes both)
    val dir = new java.io.File(base)
    val names = dir.listFiles().map(_.getName).toSet
    val orphanCrcs = names.filter(n => n.startsWith(".") && n.endsWith(".crc"))
      .filterNot(n => names.contains(n.stripPrefix(".").stripSuffix(".crc")))
    assert(orphanCrcs.isEmpty, s"orphaned crc siblings: $orphanCrcs")
  }

  test("zValue interleaves bits; zOrdered tiles prune BOTH columns' predicates") {
    import spark.implicits._
    // zValue: a=0b101, b=0b011 -> z = a bits at even, b bits at odd
    //   positions = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Formats.zValue(col("a"), col("b"), 3)).head().getLong(0)
    assert(z == 27L)
    // 64x64 uniform grid, 16 partitions. Z-order tiles the plane, so a
    // strip predicate on EITHER axis overlaps few partitions; an
    // a-sorted layout prunes only a-predicates.
    val grid = spark.range(4096)
      .selectExpr("id % 64 AS a", "id DIV 64 AS b", "id")
    def overlapping(df: org.apache.spark.sql.DataFrame,
                    c: String, lo: Long, hi: Long): Int =
      df.groupBy(spark_partition_id().as("p"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi)
        .count().toInt
    val zed = Formats.zOrdered(grid, "a", "b", 16, bits = 6)
      .localCheckpoint()
    val aSorted = grid.repartitionByRange(16, col("a")).localCheckpoint()
    // a-sorted: perfect on a, useless on b (every partition spans all b)
    assert(overlapping(aSorted, "a", 0, 15) <= 5)
    assert(overlapping(aSorted, "b", 0, 15) == 16)
    // z-ordered: compact tiles — BOTH axes prune to a fraction
    assert(overlapping(zed, "a", 0, 15) <= 8)
    assert(overlapping(zed, "b", 0, 15) <= 8)
  }
}
