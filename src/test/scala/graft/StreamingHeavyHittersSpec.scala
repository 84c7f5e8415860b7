package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingHeavyHitters

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: java.nio.file.Path, name: String,
                         rows: Seq[(Long, String)]): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_shh_stage").toString + "/d"
    rows.toDF("doc_id", "text").write.parquet(stage)
    new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, dir.resolve(s"$name$i.parquet"))
      }
  }

  test("sharded SpaceSaving state accumulates across micro-batches") {
    val landing = java.nio.file.Files.createTempDirectory("graft_shh")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shh_ck").toString
    writeBatch(landing, "b1", Seq((1L, "heavy heavy heavy rare1 rare2")))
    // one continuous query, two micro-batches: the second lands while
    // the query runs, so state carries across trigger boundaries
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(landing.toString)
    val q = StreamingHeavyHitters.shardedTopTerms(stream, nShards = 4,
        capacity = 8, k = 5)
      .writeStream.outputMode("update")
      .format("memory").queryName("shh_test")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    writeBatch(landing, "b2", Seq((2L, "heavy heavy other other other words")))
    q.processAllAvailable()
    q.stop()
    // feed mergedTopK the RAW appended update-mode rows — a term
    // updated in both micro-batches appears once per generation, and
    // the reduce to the latest generation per (shard, term) is
    // mergedTopK's own job
    val snapshot = spark.table("shh_test")
      .toDF("shard", "term", "count", "max_error")
    val top = StreamingHeavyHitters.mergedTopK(snapshot, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'heavy' seen 5 times ACROSS batches: state must have carried
    // batch 1's count into batch 2, and the stale batch-1 generation
    // row (count 3) must not shadow or duplicate the latest one
    assert(top.contains("heavy") && top("heavy") >= 5L,
      s"cross-batch accumulation lost counts: $top")
    val rows = spark.table("shh_test").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
    // 'heavy' really was updated in two generations — the dedup had
    // real work to do
    assert(rows.count(_._1._2 == "heavy") >= 2,
      s"expected multiple update-mode generations for 'heavy': ${rows.toSeq}")
    // every term lives in exactly one shard (disjoint substreams)
    val shardsPerTerm = rows.map(_._1).groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(shardsPerTerm.values.forall(_.size == 1),
      s"a term must hash to exactly one shard: $shardsPerTerm")
  }

  test("over-estimate guarantee survives eviction under streaming pressure") {
    val landing = java.nio.file.Files.createTempDirectory("graft_shh2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shh2_ck").toString
    // 30 distinct fillers vs capacity 8 forces evictions; planted term
    // appears 12 times
    val fillers = (1 to 30).map(i => s"f$i").mkString(" ")
    writeBatch(landing, "b1",
      Seq((1L, (Seq.fill(12)("planted") :+ fillers).mkString(" "))))
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(landing.toString)
    val q = StreamingHeavyHitters.shardedTopTerms(stream, nShards = 2,
        capacity = 8, k = 8)
      .writeStream.outputMode("update")
      .format("memory").queryName("shh_test2")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("shh_test2").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.contains("planted"), s"heavy term evicted: ${out.keySet}")
    val (c, e) = out("planted")
    assert(c >= 12L, s"SpaceSaving must over-estimate: $c < 12")
    assert(c - e <= 12L, s"count - error must lower-bound truth: $c - $e > 12")
  }
}
