package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StoreCompaction, StreamingAnnIngest, StreamingMediaIngest, StreamingNearDupIngest}

/** The streaming-store compaction contract: consolidating committed
  * `batch=<id>` generations must change NOTHING observable — corpus,
  * index rows (modulo the batch attribution), probe decisions, the
  * replay frontier, the idempotence guards — while collapsing the
  * per-tick directory count the probe reads pay for. */
class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog again and again"
  private val near2 = "the quick brown fox jumps over the lazy dog again and once"
  private val near3 = "the quick brown fox jumps over the lazy dog again and thrice"
  private val other = "completely different content with no shared shingles at all here"
  private val fresh = "some entirely new material about streaming signature indexes landing"

  private def batchDirs(store: String): Seq[String] = {
    val d = new java.io.File(store)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("batch=")).sorted
  }

  test("near-dup store compaction: same corpus, same probe decisions, frontier kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_nd").toString
    def ingest(id: Long, rows: (Long, String)*): Unit =
      StreamingNearDupIngest.ingestBatch(
        rows.toSeq.toDF("doc_id", "text"), dir, id, 3, 8, 4, 0.5)
    def docIds = StreamingNearDupIngest.corpus(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    ingest(0L, 1L -> near1, 3L -> other)
    ingest(1L, 11L -> fresh)
    ingest(2L, 21L -> "yet more wholly disjoint prose about directory compaction passes")
    val sigRowsBefore = StreamingNearDupIngest.sigStore(spark, dir, 8)
      .drop("batch").collect().map(_.toSeq).toSet
    val postRowsBefore = StreamingNearDupIngest.postStore(spark, dir)
      .drop("batch").collect().map(_.toSeq).toSet
    val idsBefore = docIds
    StoreCompaction.compactNearDupStore(spark, dir)
    // batches 0 and 1 consolidated into batch=1; the frontier dir
    // (batch=2) untouched — maxLandedBatch (the replay/fresh-checkpoint
    // guard) is unchanged
    assert(batchDirs(s"$dir/sigs") == Seq("batch=1", "batch=2"), batchDirs(s"$dir/sigs"))
    assert(batchDirs(s"$dir/docs") == Seq("batch=1", "batch=2"))
    assert(batchDirs(s"$dir/post") == Seq("batch=1", "batch=2"))
    assert(StreamingNearDupIngest.maxLandedBatch(dir) == 2L)
    assert(docIds == idsBefore)
    assert(StreamingNearDupIngest.sigStore(spark, dir, 8)
      .drop("batch").collect().map(_.toSeq).toSet == sigRowsBefore)
    assert(StreamingNearDupIngest.postStore(spark, dir)
      .drop("batch").collect().map(_.toSeq).toSet == postRowsBefore)
    // probe decisions against the compacted index are unchanged: a
    // near-dup of a COMPACTED doc still rejects, fresh content lands
    ingest(3L, 30L -> near2, 31L -> "brand new words that match nothing previously landed")
    assert(docIds == idsBefore :+ 31L)
    // replay of the frontier batch stays idempotent
    ingest(3L, 30L -> near2, 31L -> "brand new words that match nothing previously landed")
    assert(docIds == idsBefore :+ 31L)
    // and the single-writer frontier guard still fires
    intercept[IllegalArgumentException] { ingest(1L, 99L -> fresh) }
  }

  test("compaction interleaves mid-stream: the resumed checkpoint probes the compacted index") {
    // ONE checkpointed streaming query lands three micro-batch waves;
    // the stream pauses (single-writer window between micro-batches),
    // the generation-count trigger compacts; the SAME checkpoint then
    // resumes and the next micro-batch must (a) clear the frontier
    // guard — batch ids continue past the untouched frontier dir —
    // and (b) probe-reject a near-dup of a doc whose rows now live
    // only in the consolidated generation.
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_compact_live")
    val landing = base.toString + "/landing"
    val store = base.toString + "/store"
    val ck = base.toString + "/ck"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def wave(rows: (Long, String)*): Unit = rows.toSeq.toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(landing)
    def stream() = StreamingNearDupIngest.start(
      spark.readStream.schema(schema).parquet(landing), store, ck)
    def docIds = StreamingNearDupIngest.corpus(spark, store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    wave(1L -> near1, 3L -> other)
    val q1 = stream(); q1.processAllAvailable()
    wave(11L -> fresh); q1.processAllAvailable()
    wave(21L -> "yet more wholly disjoint prose about live compaction windows")
    q1.processAllAvailable(); q1.stop()
    assert(batchDirs(s"$store/sigs") == Seq("batch=0", "batch=1", "batch=2"))
    val idsBefore = docIds
    // under threshold -> no-op; at threshold -> compacts
    assert(!StoreCompaction.compactNearDupStoreEvery(spark, store, 4))
    assert(batchDirs(s"$store/sigs") == Seq("batch=0", "batch=1", "batch=2"))
    assert(StoreCompaction.compactNearDupStoreEvery(spark, store, 3))
    assert(batchDirs(s"$store/sigs") == Seq("batch=1", "batch=2"))
    assert(StreamingNearDupIngest.maxLandedBatch(store) == 2L)
    assert(docIds == idsBefore)
    // resume the SAME checkpoint over the compacted store: the next
    // micro-batch id (3) clears the untouched frontier (2), the
    // near-dup of compacted doc 1 is probe-rejected, fresh lands
    wave(30L -> near2, 31L -> "brand new words that match nothing previously landed")
    val q2 = stream(); q2.processAllAvailable(); q2.stop()
    assert(docIds == idsBefore :+ 31L,
      s"resumed stream must reject the near-dup of a compacted doc: $docIds")
  }

  test("compaction recovery: a crashed swap is rolled back, then compacts cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_rec").toString
    def ingest(id: Long, rows: (Long, String)*): Unit =
      StreamingNearDupIngest.ingestBatch(
        rows.toSeq.toDF("doc_id", "text"), dir, id, 3, 8, 4, 0.5)
    ingest(0L, 1L -> near1, 3L -> other)
    ingest(1L, 11L -> fresh)
    ingest(2L, 21L -> "frontier content that stays out of every compaction")
    val before = StreamingNearDupIngest.sigStore(spark, dir, 8)
      .drop("batch").collect().map(_.toSeq).toSet
    // Simulate a crash mid-swap: batch=0 already retired (invisible to
    // readers), the temp dir written but never renamed in.
    assert(new java.io.File(s"$dir/sigs/batch=0")
      .renameTo(new java.io.File(s"$dir/sigs/_retired_batch=0")))
    val tmp = new java.io.File(s"$dir/sigs/_tmp_compact"); tmp.mkdirs()
    // The crashed state hides batch 0's rows; compaction must first
    // RESTORE it (the swap never completed), then compact normally.
    StoreCompaction.compactNearDupStore(spark, dir)
    assert(batchDirs(s"$dir/sigs") == Seq("batch=1", "batch=2"))
    assert(StreamingNearDupIngest.sigStore(spark, dir, 8)
      .drop("batch").collect().map(_.toSeq).toSet == before,
      "recovery + compaction must preserve every signature row")
    assert(!new java.io.File(s"$dir/sigs/_tmp_compact").exists())
    assert(!new java.io.File(s"$dir/sigs/_retired_batch=0").exists())
  }

  test("media store compaction: fp index rows identical, digest probe still rejects") {
    val rnd = new scala.util.Random(3)
    def payload() = Array.fill(512)(rnd.nextInt(256).toByte)
    val a = payload(); val b = payload(); val c = payload(); val d = payload()
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_media").toString
    def ingest(id: Long, rows: (Long, Array[Byte])*): Unit =
      StreamingMediaIngest.ingestBatch(
        rows.toSeq.map { case (i, p) => (i, "image", p) }
          .toDF("id", "modality", "content"), dir, id, 3)
    ingest(0L, 1L -> a, 2L -> b)
    ingest(1L, 10L -> c)
    ingest(2L, 20L -> d)
    val fpBefore = StreamingMediaIngest.fpStore(spark, dir)
      .drop("batch").collect().map(_.toSeq).toSet
    val statsBefore = StreamingMediaIngest.stats(spark, dir)
      .collect().map(_.toSeq).toSet
    StoreCompaction.compactMediaStore(spark, dir)
    assert(batchDirs(s"$dir/fp") == Seq("batch=1", "batch=2"))
    assert(StreamingMediaIngest.fpStore(spark, dir)
      .drop("batch").collect().map(_.toSeq).toSet == fpBefore)
    // the per-batch admission ledger is an audit log — NOT compacted
    assert(batchDirs(s"$dir/stats").size == 3)
    assert(StreamingMediaIngest.stats(spark, dir)
      .collect().map(_.toSeq).toSet == statsBefore)
    // exact dups of COMPACTED payloads still digest-reject; near-dups
    // of compacted fingerprints still Hamming-reject
    ingest(3L, 30L -> a.clone(), 31L -> payload())
    assert(StreamingMediaIngest.corpus(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L, 20L, 31L))
  }

  test("cluster-store compaction: labeling invariant, resumed recurrence correct") {
    import graft.streaming.StreamingClusterIngest
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_cluster").toString
    def ingest(id: Long, rows: (Long, String)*): Unit =
      StreamingClusterIngest.ingestBatch(
        rows.toSeq.toDF("doc_id", "text"), dir, id, 3, 8, 4, 0.5)
    def labelMap = StreamingClusterIngest.labels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ingest(0L, 1L -> near1, 2L -> near2, 3L -> other)
    ingest(1L, 11L -> fresh)
    ingest(2L, 21L -> "frontier content outside every compaction")
    val before = labelMap
    assert(!StoreCompaction.compactClusterStoreEvery(spark, dir, 4))
    assert(StoreCompaction.compactClusterStoreEvery(spark, dir, 3))
    // append stores consolidated; labels pruned to the newest two gens
    assert(batchDirs(s"$dir/sigs") == Seq("batch=1", "batch=2"))
    assert(batchDirs(s"$dir/dig") == Seq("batch=1", "batch=2"))
    val gens = new java.io.File(s"$dir/labels").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens == Seq("gen=1", "gen=2"), gens)
    assert(labelMap == before, "compaction must not change the labeling")
    // the recurrence continues over the compacted store: a near-dup of
    // a doc whose rows live only in the consolidated generation joins
    // its cluster; replay of the new frontier is idempotent
    ingest(3L, 30L -> near3)
    assert(labelMap == before + (30L -> 1L), s"$labelMap")
    ingest(3L, 30L -> near3)
    assert(labelMap == before + (30L -> 1L))
  }

  test("cluster-store compaction crash MATRIX: restore-or-finish at every inter-stage point") {
    import graft.streaming.StreamingClusterIngest
    // Every (sub-store × stage) crash point of the MULTI-store swap:
    // when the injected kill lands in sub-store S after stage N,
    // earlier sub-stores are fully compacted, S sits in the partial
    // state stage N leaves (temp only / first-retired / all-retired /
    // installed-uncleaned), later sub-stores and labels are untouched.
    // The re-run must recover AND finish: final on-disk state and the
    // labeling must equal the never-crashed golden compaction, for all
    // 16 points.
    val base = java.nio.file.Files.createTempDirectory("graft_crash_matrix").toString
    def ingest(dir: String, id: Long, rows: (Long, String)*): Unit =
      StreamingClusterIngest.ingestBatch(
        rows.toSeq.toDF("doc_id", "text"), dir, id, 3, 8, 4, 0.5)
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    def snapshot(dir: String): (Map[String, (Seq[String], Set[Seq[Any]])], Seq[String], Map[Long, Long]) = {
      val subs = Seq("docs", "sigs", "post", "dig").map { s =>
        s -> ((batchDirs(s"$dir/$s"),
          spark.read.parquet(s"$dir/$s").drop("batch")
            .collect().map(_.toSeq).toSet))
      }.toMap
      val gens = new java.io.File(s"$dir/labels").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
      val labels = StreamingClusterIngest.labels(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (subs, gens, labels)
    }
    val proto = s"$base/proto"
    ingest(proto, 0L, 1L -> near1, 2L -> near2, 3L -> other)
    ingest(proto, 1L, 11L -> fresh)
    ingest(proto, 2L, 21L -> "frontier content outside every compaction")
    val golden = s"$base/golden"
    copyDir(proto, golden)
    StoreCompaction.compactClusterStore(spark, golden)
    val goldenState = snapshot(golden)
    for (sub <- Seq("docs", "sigs", "post", "dig"); stage <- 1 to 4) {
      val dir = s"$base/case_${sub}_$stage"
      copyDir(proto, dir)
      StoreCompaction.crashAfterStage = Some((s"/$sub", stage))
      try {
        val e = intercept[IllegalStateException] {
          StoreCompaction.compactClusterStore(spark, dir)
        }
        assert(e.getMessage.contains("injected crash"), e.getMessage)
      } finally StoreCompaction.crashAfterStage = None
      // the re-run must recover the crashed sub-store and finish the
      // whole multi-store pass — idempotently
      StoreCompaction.compactClusterStore(spark, dir)
      assert(snapshot(dir) == goldenState,
        s"crash in $sub after stage $stage: recovered state must equal the golden compaction")
      // no swap debris may survive recovery
      Seq("docs", "sigs", "post", "dig").foreach { s =>
        val names = new java.io.File(s"$dir/$s").listFiles().map(_.getName)
        assert(!names.exists(n => n.startsWith("_tmp_compact") || n.startsWith("_retired_")),
          s"$s after $sub/$stage: $names")
      }
    }
    // one recovered store keeps answering the recurrence correctly:
    // a near-dup of a doc whose rows live only in the consolidated
    // generation joins its cluster, idempotently under replay
    val live = s"$base/case_post_3"
    val before = goldenState._3
    ingest(live, 3L, 30L -> near3)
    def labelMap = StreamingClusterIngest.labels(spark, live)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap == before + (30L -> 1L), s"$labelMap")
    ingest(live, 3L, 30L -> near3)
    assert(labelMap == before + (30L -> 1L))
  }

  test("ANN code-index compaction: codeIndex identical, later generations still win") {
    def emb(rows: (Long, Seq[Float], Int)*) =
      rows.toSeq.toDF("vec_id", "embedding", "label")
    val seed = Seq(
      (0L, Seq(1f, 0f, 1f, 0f), 0), (1L, Seq(0.95f, 0f, 1f, 0f), 0),
      (2L, Seq(0f, 1f, 0f, 1f), 0), (3L, Seq(0f, 0.95f, 0f, 1f), 0))
    val ix = java.nio.file.Files.createTempDirectory("graft_compact_ann").toString + "/ix"
    StreamingAnnIngest.buildIndex(emb(seed: _*), ix, m = 2, ksub = 2, iters = 1)
    // batch=1 lands vec 100 near cluster A; batch=2 RE-INGESTS vec 100
    // near cluster B (latest generation must win) and lands vec 101;
    // batch=3 is the frontier
    StreamingAnnIngest.ingestBatch(emb((100L, Seq(1f, 0f, 1f, 0f), 0)).toDF(), ix, 0L)
    StreamingAnnIngest.ingestBatch(
      emb((100L, Seq(0f, 1f, 0f, 1f), 0), (101L, Seq(1f, 0f, 1f, 0f), 0)).toDF(), ix, 1L)
    StreamingAnnIngest.ingestBatch(emb((102L, Seq(0f, 1f, 0f, 1f), 0)).toDF(), ix, 2L)
    // codeIndex emits the ARRAY form (vec_id, carr)
    def index = StreamingAnnIngest.codeIndex(spark, ix)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val before = index
    // generation-count trigger: no-op below its threshold, compacts at it
    val gens = batchDirs(s"$ix/codes").size
    assert(!StoreCompaction.compactAnnIndexEvery(spark, ix, gens + 1))
    assert(batchDirs(s"$ix/codes").size == gens, "a no-op trigger must not touch the store")
    assert(StoreCompaction.compactAnnIndexEvery(spark, ix, gens))
    assert(batchDirs(s"$ix/codes") == Seq("batch=2", "batch=3"))
    assert(index == before,
      "compaction must preserve the latest-generation-per-key reduction")
    // vec 100's surviving codes are its batch=2 (cluster B) generation
    assert(index(100L) == before(102L))
    // a post-compaction re-ingest still outranks the compacted rows
    StreamingAnnIngest.ingestBatch(emb((100L, Seq(1f, 0f, 1f, 0f), 0)).toDF(), ix, 3L)
    assert(index(100L) == before(101L),
      "a later batch must win the struct-max against compacted rows")
  }

  private def gEmb(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")
  private def gCluster(cx: Float, cy: Float, ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) =>
      (id, Seq(cx + 0.01f * i, cy - 0.01f * i, cx, cy), 0) }
  private val gSeed = gCluster(1f, 0f, 0L to 5L) ++ gCluster(0f, 1f, 6L to 11L)
  private val gWave1 = Seq((100L, Seq(1f, 0f, 1f, 0f), 0),
    (101L, Seq(0f, 1f, 0f, 1f), 0))
  private val gWave2 = Seq((200L, Seq(0.99f, 0.01f, 1f, 0f), 0))
  private val gWave3 = Seq((300L, Seq(0.01f, 0.99f, 0f, 1f), 0))
  private def gBuildStore(dir: String): Unit = {
    import graft.streaming.StreamingGraphIngest
    StreamingGraphIngest.buildIndex(gEmb(gSeed: _*), dir, k = 3, rounds = 2)
    StreamingGraphIngest.ingestBatch(gEmb(gWave1: _*), dir, 0, 3, 3, 3)
    StreamingGraphIngest.ingestBatch(gEmb(gWave2: _*), dir, 1, 3, 3, 3)
    StreamingGraphIngest.ingestBatch(gEmb(gWave3: _*), dir, 2, 3, 3, 3)
  }
  private def gRows(dir: String, sub: String): Set[Seq[Any]] =
    spark.read.parquet(s"$dir/$sub").drop("batch")
      .collect().map(_.toSeq).toSet

  test("graph-store compaction: pre-frontier store EQUALS the offline rebuild (back-links restored)") {
    import graft.streaming.StreamingGraphIngest
    import graft.functions.Similarity
    // seed gen 0 + three walk-insert ticks (gens 1..3); frontier = 3
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_g").toString + "/ix"
    gBuildStore(dir)
    // the append-only trade, demonstrated: seed node 0's list predates
    // its exact twin 100, so without compaction it NEVER links back
    def list(node: Long): Set[Long] = StreamingGraphIngest.graphStore(spark, dir)
      .filter(col("vec_id") === node)
      .collect().map(_.getLong(2)).toSet
    assert(!list(0L).contains(100L),
      "fixture broken: the walk-insert should not retrofit 0 -> 100")
    val frontierBefore = spark.read.parquet(s"$dir/graph/batch=3")
      .collect().map(_.toSeq).toSet
    // trigger sibling: no-op below threshold, compacts at it
    assert(!StoreCompaction.compactGraphStoreEvery(spark, dir, 3, 2, every = 5))
    assert(StoreCompaction.compactGraphStoreEvery(spark, dir, 3, 2, every = 4))
    assert(batchDirs(s"$dir/graph") == Seq("batch=2", "batch=3"))
    assert(batchDirs(s"$dir/nodes") == Seq("batch=2", "batch=3"))
    // THE contract: the compacted pre-frontier generation is
    // BIT-IDENTICAL to the offline NN-descent over those vectors —
    // undirected closure, back-links and all
    val offline = Similarity.knnGraph(
        gEmb(gSeed ++ gWave1 ++ gWave2: _*), 3, 2)
      .collect().map(_.toSeq).toSet
    val compacted = spark.read.parquet(s"$dir/graph/batch=2")
      .collect().map(_.toSeq).toSet
    assert(compacted == offline,
      "compacted generation must equal the offline rebuild bit-exactly")
    // the back-link exists now: 0 links its twin at distance 0
    assert(list(0L).contains(100L),
      "compaction must retrofit the reverse edge 0 -> 100")
    // the frontier generation is untouched (replay contract)
    val frontierAfter = spark.read.parquet(s"$dir/graph/batch=3")
      .collect().map(_.toSeq).toSet
    assert(frontierAfter == frontierBefore)
    // and the serving read still navigates both clusters
    val hit = StreamingGraphIngest.search(spark, dir,
        gEmb((900L, Seq(1f, 0f, 1f, 0f), 0)), k = 1, hops = 3, beam = 3)
      .collect().head.getLong(2)
    assert(((0L to 5L).toSet ++ Set(100L, 200L))(hit), s"got $hit")
  }

  test("graph-store compaction crash MATRIX: restore-or-finish at every inter-stage point") {
    import graft.streaming.StreamingGraphIngest
    // nodes/ and graph/ × the four swap stages — plus the r17 wrinkle:
    // a crash between the two sub-store passes leaves nodes compacted
    // with the graph not yet rebuilt, and the re-run must key off the
    // GRAPH store's generations (recovering retired dirs first) to
    // finish rather than declare the store too small.
    val base = java.nio.file.Files.createTempDirectory("graft_crash_g").toString
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    val proto = s"$base/proto"
    gBuildStore(proto)
    val golden = s"$base/golden"
    copyDir(proto, golden)
    StoreCompaction.compactGraphStore(spark, golden, 3, 2)
    val goldenGraph = gRows(golden, "graph")
    val goldenNodes = gRows(golden, "nodes")
    for (sub <- Seq("nodes", "graph"); stage <- 1 to 4) {
      val dir = s"$base/case_${sub}_$stage"
      copyDir(proto, dir)
      StoreCompaction.crashAfterStage = Some((s"/$sub", stage))
      try {
        val e = intercept[IllegalStateException] {
          StoreCompaction.compactGraphStore(spark, dir, 3, 2)
        }
        assert(e.getMessage.contains("injected crash"), e.getMessage)
      } finally StoreCompaction.crashAfterStage = None
      StoreCompaction.compactGraphStore(spark, dir, 3, 2)
      assert(gRows(dir, "graph") == goldenGraph,
        s"crash in $sub after stage $stage: graph must equal the golden compaction")
      assert(gRows(dir, "nodes") == goldenNodes,
        s"crash in $sub after stage $stage: nodes must equal the golden compaction")
      assert(batchDirs(s"$dir/graph") == Seq("batch=2", "batch=3"))
      Seq("nodes", "graph").foreach { s =>
        val names = new java.io.File(s"$dir/$s").listFiles().map(_.getName)
        assert(!names.exists(n => n.startsWith("_tmp_compact") || n.startsWith("_retired_")),
          s"$s after $sub/$stage: ${names.toSeq}")
      }
    }
    // a recovered store keeps ingesting — and the NEXT compaction is
    // what makes the new arrival fully reachable: fresh node 400 has
    // no back-links while it is the frontier (the stated trade), but
    // once a later tick moves the frontier past it, compaction folds
    // it into the rebuilt closure and an exact-match query finds it
    val live = s"$base/case_graph_2"
    StreamingGraphIngest.ingestBatch(
      gEmb((400L, Seq(1f, 0.02f, 1f, 0f), 0)), live, 3, 3, 3, 3)
    StreamingGraphIngest.ingestBatch(
      gEmb((500L, Seq(0f, 0.98f, 0f, 1f), 0)), live, 4, 3, 3, 3)
    StoreCompaction.compactGraphStore(spark, live, 3, 2)
    val hits = StreamingGraphIngest.search(spark, live,
        gEmb((901L, Seq(1f, 0.02f, 1f, 0f), 0)), k = 3, hops = 3, beam = 3)
      .collect().map(_.getLong(2)).toSet
    assert(hits.contains(400L),
      s"post-compaction the landed arrival must be reachable by search: $hits")
  }

  test("graph ingest close path: stopAndCompact observes generation pressure under the maintenance lock") {
    import graft.streaming.StreamingGraphIngest
    import org.apache.spark.sql.types._
    // a LIVE checkpointed stream lands three walk-insert waves over the
    // seed; the close-path hook stops it, takes the single-maintainer
    // lock, sees 4 graph generations >= every=4 and compacts; probe
    // semantics survive; the SAME checkpoint then resumes and ticks a
    // fourth wave past the untouched frontier.
    val base = java.nio.file.Files.createTempDirectory("graft_close_g")
    val landing = base.toString + "/landing"
    val dir = base.toString + "/ix"
    val ck = base.toString + "/ck"
    StreamingGraphIngest.buildIndex(gEmb(gSeed: _*), dir, k = 3, rounds = 2)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
    def wave(rows: Seq[(Long, Seq[Float], Int)]): Unit = rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("append").parquet(landing)
    def stream() = StreamingGraphIngest.start(
      spark.readStream.schema(schema).parquet(landing), dir, ck,
      k = 3, hops = 3, beam = 3)
    wave(gWave1)
    val q1 = stream(); q1.processAllAvailable()
    wave(gWave2); q1.processAllAvailable()
    wave(gWave3); q1.processAllAvailable()
    assert(batchDirs(s"$dir/graph") == Seq("batch=0", "batch=1", "batch=2", "batch=3"))
    def twinHit(): Long = StreamingGraphIngest.search(spark, dir,
        gEmb((900L, Seq(1f, 0f, 1f, 0f), 0)), k = 1, hops = 3, beam = 3)
      .collect().head.getLong(2)
    val hitBefore = twinHit()
    // under threshold: stream stopped, lock cycled, NO compaction
    assert(!StreamingGraphIngest.stopAndCompact(q1, spark, dir, 3, 2, every = 5))
    assert(batchDirs(s"$dir/graph") == Seq("batch=0", "batch=1", "batch=2", "batch=3"))
    // resume, no new data — then close AT threshold: compaction runs
    val q2 = stream(); q2.processAllAvailable()
    assert(StreamingGraphIngest.stopAndCompact(q2, spark, dir, 3, 2, every = 4))
    assert(batchDirs(s"$dir/graph") == Seq("batch=2", "batch=3"))
    assert(batchDirs(s"$dir/nodes") == Seq("batch=2", "batch=3"))
    // the maintenance lock is gone after the run (body completed)
    assert(!new java.io.File(s"$dir/_maintenance_lock").exists())
    // probe semantics survive the rebuild: the exact twin still wins
    assert(twinHit() == hitBefore,
      s"exact-twin probe must hit the same node across compaction")
    // a held lock fails fast instead of interleaving swaps
    val ex = intercept[IllegalStateException] {
      StoreCompaction.withMaintenanceLock(dir) {
        StoreCompaction.maintainGraphStore(spark, dir, 3, 2, every = 3)
      }
    }
    assert(ex.getMessage.contains("under maintenance"), ex.getMessage)
    assert(!new java.io.File(s"$dir/_maintenance_lock").exists(),
      "the outer lock must release even when the body throws")
    // the SAME checkpoint resumes past the compaction: wave 4 lands as
    // the next generation (frontier guard passed, ids continue)
    wave(Seq((400L, Seq(0.98f, 0.02f, 1f, 0f), 0)))
    val q3 = stream(); q3.processAllAvailable(); q3.stop()
    assert(batchDirs(s"$dir/graph") == Seq("batch=2", "batch=3", "batch=4"))
    // the resumed tick walk-inserted a sane list: 400's neighbors are
    // cluster-A nodes (its own side of the plane), never cluster B
    val n400 = spark.read.parquet(s"$dir/graph/batch=4")
      .filter(col("vec_id") === 400L).collect().map(_.getLong(2)).toSet
    val clusterA = (0L to 5L).toSet ++ Set(100L, 200L, 900L)
    assert(n400.nonEmpty && n400.subsetOf(clusterA),
      s"resumed arrival must link into its own cluster: $n400")
    // and with a full-width entry beam the new node is searchable
    // (narrow beams may miss it until the NEXT compaction retrofits
    // back-links — the documented append-only trade)
    val hits = StreamingGraphIngest.search(spark, dir,
        gEmb((901L, Seq(0.98f, 0.02f, 1f, 0f), 0)), k = 3, hops = 3, beam = 17)
      .collect().map(_.getLong(2)).toSet
    assert(hits.contains(400L), s"resumed arrival must be searchable: $hits")
  }

  test("graph-store compaction refuses a legacy nodes layout (no raw embedding/label) BEFORE retiring") {
    import graft.streaming.StreamingGraphIngest
    val dir = java.nio.file.Files.createTempDirectory("graft_legacy_g").toString + "/ix"
    gBuildStore(dir)
    // simulate a pre-r17 generation: nodes/batch=1 holds only (vec_id, q)
    val legacy = spark.read.parquet(s"$dir/nodes/batch=1")
      .select(col("vec_id"), col("q")).collect()
    val legacyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.toSeq),
      spark.read.parquet(s"$dir/nodes/batch=1").select("vec_id", "q").schema)
    legacyDf.write.mode("overwrite").parquet(s"$dir/nodes/batch=1")
    val before = (batchDirs(s"$dir/nodes"), batchDirs(s"$dir/graph"))
    val ex = intercept[IllegalArgumentException] {
      StoreCompaction.compactGraphStore(spark, dir, 3, 2)
    }
    assert(ex.getMessage.contains("legacy layout"), ex.getMessage)
    assert(ex.getMessage.contains("batch=1"), "the error must name the offending generation")
    // nothing was retired or swapped: the store is exactly as it was
    assert((batchDirs(s"$dir/nodes"), batchDirs(s"$dir/graph")) == before)
    assert(!new java.io.File(s"$dir/nodes/_tmp_compact").exists() &&
      !new java.io.File(s"$dir/graph/_tmp_compact").exists())
  }
}
