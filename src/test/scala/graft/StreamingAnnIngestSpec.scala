package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.streaming.StreamingAnnIngest

class StreamingAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*): DataFrame =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  private val seed = Seq(
    (0L, Seq(1f, 0f, 1f, 0f), 0), (1L, Seq(0.95f, 0f, 1f, 0f), 0),
    (2L, Seq(0f, 1f, 0f, 1f), 0), (3L, Seq(0f, 0.95f, 0f, 1f), 0))

  test("pqEncode against pqTrain's centroids reproduces pqTrain's codes") {
    val e = emb(seed: _*)
    val (codes, cents) = Similarity.pqTrain(e, m = 2, ksub = 2, iters = 1)
    val re = Similarity.pqEncode(e, cents)
    val a = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val b = re.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("streamed batches encode against the FIXED codebooks; replay is idempotent") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_annix").toString + "/ix"
    val landing = java.nio.file.Files.createTempDirectory("graft_annix_land")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_annix_ck").toString
    StreamingAnnIngest.buildIndex(emb(seed: _*), indexDir, m = 2, ksub = 2, iters = 1)
    // a new vector identical to seed 0 must get seed 0's exact codes
    val stage = java.nio.file.Files.createTempDirectory("graft_annix_stage").toString + "/d"
    emb((100L, Seq(1f, 0f, 1f, 0f), 0), (101L, Seq(0f, 1f, 0f, 1f), 0))
      .write.parquet(stage)
    new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, landing.resolve(s"b$i.parquet"))
      }
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .parquet(landing.toString)
    val q = StreamingAnnIngest.start(stream, indexDir, ckpt)
    q.processAllAvailable(); q.stop()
    // codeIndex emits the ARRAY form (vec_id, carr) the search scans
    val ix = StreamingAnnIngest.codeIndex(spark, indexDir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(ix.keySet == Set(0L, 1L, 2L, 3L, 100L, 101L),
      s"seed + streamed vectors must all be indexed: ${ix.keys}")
    assert(ix(100L) == ix(0L),
      "identical vector must adopt the seed's codes (same codebook generation)")
    assert(ix(101L) == ix(2L))
    // replay: re-encode the same batch id -> identical rows, no dupes
    val n1 = StreamingAnnIngest.codeIndex(spark, indexDir).count()
    StreamingAnnIngest.ingestBatch(
      emb((100L, Seq(1f, 0f, 1f, 0f), 0), (101L, Seq(0f, 1f, 0f, 1f), 0)).toDF(),
      indexDir, batchId = 0L)
    val n2 = StreamingAnnIngest.codeIndex(spark, indexDir).count()
    assert(n1 == n2, s"replay must overwrite its own batch dir, not append: $n1 -> $n2")
  }

  test("fresh checkpoint over an index with streamed batches is refused") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_anng").toString + "/ix"
    val landing = java.nio.file.Files.createTempDirectory("graft_anng_land")
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft_anng_ck1").toString
    StreamingAnnIngest.buildIndex(emb(seed: _*), indexDir, m = 2, ksub = 2, iters = 1)
    val stage = java.nio.file.Files.createTempDirectory("graft_anng_stage").toString + "/d"
    emb((100L, Seq(1f, 0f, 1f, 0f), 0)).write.parquet(stage)
    new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.copy(f.toPath, landing.resolve(f.getName)))
    def stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .parquet(landing.toString)
    val q1 = StreamingAnnIngest.start(stream, indexDir, ckpt1)
    q1.processAllAvailable(); q1.stop()
    // restart with the ORIGINAL checkpoint: fine (it owns the batch ids)
    val q2 = StreamingAnnIngest.start(stream, indexDir, ckpt1)
    q2.processAllAvailable(); q2.stop()
    // a NEW checkpoint would re-number batches from 0 over batch=1 — refuse
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_anng_ck2").toString
    val e = intercept[IllegalArgumentException] {
      StreamingAnnIngest.start(stream, indexDir, ckpt2)
    }
    assert(e.getMessage.contains("fresh checkpoint"), e.getMessage)
    // a vec_id landed twice (replayed batch) still yields ONE code
    // array in the served index (the latest-generation reduction runs
    // before the array collect)
    val ix = StreamingAnnIngest.codeIndex(spark, indexDir)
    val perKey = ix.groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(perKey == 0L, "codeIndex must serve one code array per vec_id")
  }

  test("streaming PQ search answers query batches from the landed index") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_anns").toString + "/ix"
    val qLanding = java.nio.file.Files.createTempDirectory("graft_anns_q")
    val outDir = java.nio.file.Files.createTempDirectory("graft_anns_out").toString + "/res"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anns_ck").toString
    StreamingAnnIngest.buildIndex(emb(seed: _*), indexDir, m = 2, ksub = 2, iters = 2)
    // query = near-copy of seed cluster A; its ADC top hit must come
    // from that cluster (codes of A differ from B's after convergence)
    val stage = java.nio.file.Files.createTempDirectory("graft_anns_stage").toString + "/d"
    emb((500L, Seq(0.97f, 0f, 1f, 0f), 0)).write.parquet(stage)
    new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.copy(f.toPath, qLanding.resolve(f.getName)))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .parquet(qLanding.toString)
    val q = StreamingAnnIngest.searchStream(stream, indexDir, k = 2, outDir, ckpt)
    q.processAllAvailable(); q.stop()
    val res = spark.read.parquet(outDir)
      .orderBy("query_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.nonEmpty && res.forall(_._1 == 500L))
    val top = res.filter(_._2 == 1L).map(_._3).toSet
    assert(top.subsetOf(Set(0L, 1L)),
      s"nearest must be in the query's own cluster {0,1}: $res")
  }
}

class StreamingGraphIngestSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamingGraphIngest

  private def emb(rows: (Long, Seq[Float], Int)*): DataFrame =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  // two well-separated clusters of six
  private def cluster(cx: Float, cy: Float, ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) =>
      (id, Seq(cx + 0.01f * i, cy - 0.01f * i, cx, cy), 0) }
  private val seed = cluster(1f, 0f, 0L to 5L) ++ cluster(0f, 1f, 6L to 11L)

  test("graph ingest: the walk-insert links a twin at distance 0; store searchable across generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gix").toString + "/ix"
    StreamingGraphIngest.buildIndex(emb(seed: _*), dir, k = 3, rounds = 2)
    // wave 1: exact twins of node 0 and node 6 arrive
    StreamingGraphIngest.ingestBatch(
      emb((100L, Seq(1f, 0f, 1f, 0f), 0), (101L, Seq(0f, 1f, 0f, 1f), 0)),
      dir, batchId = 0, k = 3, hops = 3, beam = 3)
    val g = StreamingGraphIngest.graphStore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every seed node and both arrivals have lists
    assert(g.map(_._1).toSet == (0L to 11L).toSet ++ Set(100L, 101L))
    // the insert-by-search found the exact twin: rank 1 at distance 0
    val top100 = g.filter(t => t._1 == 100L && t._2 == 1L).head
    assert(top100._3 == 0L && top100._4 == 0L,
      s"twin of node 0 must link it first at distance 0: $top100")
    val top101 = g.filter(t => t._1 == 101L && t._2 == 1L).head
    assert(top101._3 == 6L && top101._4 == 0L, s"$top101")
    // wave 2 from the OTHER cluster; then the full store serves a
    // query that should land in wave-1's node (cross-generation reach)
    StreamingGraphIngest.ingestBatch(
      emb((200L, Seq(0.99f, 0.01f, 1f, 0f), 0)),
      dir, batchId = 1, k = 3, hops = 3, beam = 3)
    val hits = StreamingGraphIngest.search(spark, dir,
        emb((900L, Seq(1f, 0f, 1f, 0f), 0)), k = 3, hops = 3, beam = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // nearest should include node 0 and its streamed twin 100
    assert(hits.values.toSet.intersect(Set(0L, 100L)).nonEmpty,
      s"search over the full store must reach streamed generations: $hits")
  }

  test("graph ingest: replay is idempotent; behind-frontier generations are refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gir").toString + "/ix"
    StreamingGraphIngest.buildIndex(emb(seed: _*), dir, k = 3, rounds = 1)
    val wave = emb((100L, Seq(1f, 0f, 1f, 0f), 0))
    StreamingGraphIngest.ingestBatch(wave, dir, 0, 3, 3, 3)
    StreamingGraphIngest.ingestBatch(
      emb((200L, Seq(0f, 1f, 0f, 1f), 0)), dir, 1, 3, 3, 3)
    def storeRows() = StreamingGraphIngest.graphStore(spark, dir)
      .withColumn("batch", col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted.toSeq
    val before = storeRows()
    // a foreachBatch replay of generation 2 (batchId 1) recomputes
    // identical rows from identical pre-generation inputs
    StreamingGraphIngest.ingestBatch(
      emb((200L, Seq(0f, 1f, 0f, 1f), 0)), dir, 1, 3, 3, 3)
    val after = storeRows()
    assert(before == after, "replay must rewrite its own generation bit-identically")
    // a batch id BEHIND the frontier is a different checkpoint — refuse
    val e = intercept[IllegalArgumentException] {
      StreamingGraphIngest.ingestBatch(wave, dir, -1, 3, 3, 3)
    }
    assert(e.getMessage.contains("frontier"), e.getMessage)
  }

  test("graph ingest: incremental store navigates like the offline rebuild on planted structure") {
    val dirInc = java.nio.file.Files.createTempDirectory("graft_gin").toString + "/ix"
    val all = seed ++ Seq((100L, Seq(1f, 0f, 1f, 0f), 0), (101L, Seq(0f, 1f, 0f, 1f), 0))
    StreamingGraphIngest.buildIndex(emb(seed: _*), dirInc, k = 3, rounds = 2)
    StreamingGraphIngest.ingestBatch(
      emb((100L, Seq(1f, 0f, 1f, 0f), 0), (101L, Seq(0f, 1f, 0f, 1f), 0)),
      dirInc, 0, 3, 3, 3)
    val dirFull = java.nio.file.Files.createTempDirectory("graft_gfu").toString + "/ix"
    StreamingGraphIngest.buildIndex(emb(all: _*), dirFull, k = 3, rounds = 2)
    def top1(dir: String, q: (Long, Seq[Float], Int)): Long =
      StreamingGraphIngest.search(spark, dir, emb(q), k = 1, hops = 3, beam = 3)
        .collect().head.getLong(2)
    // both stores route cluster-A and cluster-B probes to the same
    // cluster (the navigability the incremental insert must preserve)
    val probeA = (900L, Seq(0.99f, 0f, 1f, 0f), 0)
    val probeB = (901L, Seq(0f, 0.99f, 0f, 1f), 0)
    val aInc = top1(dirInc, probeA); val aFull = top1(dirFull, probeA)
    val bInc = top1(dirInc, probeB); val bFull = top1(dirFull, probeB)
    val clusterA = (0L to 5L).toSet + 100L
    val clusterB = (6L to 11L).toSet + 101L
    assert(clusterA(aInc) && clusterA(aFull), s"A-probe: inc=$aInc full=$aFull")
    assert(clusterB(bInc) && clusterB(bFull), s"B-probe: inc=$bInc full=$bFull")
  }
}
