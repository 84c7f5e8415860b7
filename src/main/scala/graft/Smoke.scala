package graft

import org.apache.spark.sql.SparkSession

/** Local t1-style smoke: run the flagship `SparkEntry.entry` and print
  * the row count plus a readable slice of the report. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // Sketch UDAF aggregations (KLL/theta/HLL) run under
      // ObjectHashAggregate, whose sort-based fallback triggers at a
      // DEFAULT of 128 distinct groups per task -- our per-day slice
      // sketches exceed that on every map partition, silently turning
      // a hash aggregation into a full sort of the fact (measured
      // super-linear at the 32x scale probe, r15). 64k groups of
      // KB-sized sketch buffers is comfortably in-memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("upsert")) upsertProbe(spark)
    else if (args.headOption.contains("stream")) streamProbe(spark)
    else if (args.headOption.contains("time")) timeProbe(spark, args(1),
      args.lift(2).getOrElse("/root/testdata/sf0.1"), args.lift(3).map(_.toInt).getOrElse(3))
    else if (args.headOption.contains("uploads")) uploadsProbe(spark)
    else if (args.headOption.contains("formats")) formatsProbe(spark)
    else if (args.headOption.contains("ingest")) ingestProbe(spark)
    else if (args.headOption.contains("quality")) qualityIngestProbe(spark)
    else if (args.headOption.contains("media")) mediaIngestProbe(spark)
    else if (args.headOption.contains("cluster")) clusterIngestProbe(spark)
    else if (args.headOption.contains("curate")) curateProbe(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    else if (args.headOption.contains("explain")) {
      val df = SparkEntry.queries(args(1))(spark, args.lift(2).getOrElse("/root/testdata/sf0.01"))
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    }
    else if (args.headOption.contains("jobs")) {
      // Sequential-job profile of named queries (r19 optimization
      // evidence): counts Spark jobs and wall seconds per query — the
      // quantizer trainings are chains of small eager jobs
      // (localCheckpoint per stage), so the job count IS the critical
      // path being optimized. Queries run in order in ONE JVM (memo
      // sharing mirrors the suite); pass a single query for a cold read.
      val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
      val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
      val verbose = sys.env.get("SMOKE_JOBS_VERBOSE").contains("1")
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(js.jobId, System.nanoTime())
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verbose) Option(starts.get(je.jobId)).foreach { t0 =>
            println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
          }
      })
      names.foreach { q =>
        val j0 = jobs.get(); val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // listener events are async — give the bus a beat to drain
        Thread.sleep(300)
        println(f"[jobs] $q%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ${jobs.get() - j0}%5d jobs")
      }
    }
    else if (args.headOption.contains("plans")) {
      // explain("formatted") of named queries written to <outDir>/<q>.txt
      // (the r19 optimization-evidence capture: plan shape — Exchange
      // count, join strategy, PushedFilters/ReadSchema — as files a
      // reviewer without Spark can diff). Queries: comma-separated names
      // in args(1); outDir args(2); sf dir args(3).
      val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
      val outDir = java.nio.file.Paths.get(args.lift(2).getOrElse("plans/r19"))
      val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
      java.nio.file.Files.createDirectories(outDir)
      names.foreach { q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"$q.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] wrote ${outDir.resolve(s"$q.txt")} (${txt.length} chars)")
      }
    }
    else if (args.headOption.contains("audit")) auditProbe(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.01"))
    else if (args.headOption.contains("scale")) scaleProbe(spark,
      args.lift(1).map(_.toLong).getOrElse(5000L),
      args.lift(2).map(_.toInt).getOrElse(10))
    else if (args.headOption.contains("annscale")) annScaleProbe(spark,
      args.lift(1).map(_.toLong).getOrElse(2000L))
    else if (args.headOption.contains("streamscale")) streamScaleProbe(spark,
      args.lift(1).map(_.toLong).getOrElse(2000L))
    else if (args.headOption.contains("annrecall")) {
      // Per-method measured recall at a given sf dir (the harness the
      // gated q_ann_recall flags and the FunctionsSpec floors read).
      import org.apache.spark.sql.functions.col
      graft.functions.Similarity.annRecall(
          Tables.embeddings(spark, args.lift(1).getOrElse("/root/testdata/sf0.01")),
          col("vec_id") % 100 === 0, 10, 4, 4, 16, 4)
        .collect().foreach(r => println(
          f"ANNRECALL method=${r.getString(0)}%-14s hits=${r.getLong(1)}%-4d truth=${r.getLong(2)}%-4d recall=${r.getDouble(3)}%.3f"))
    }
    else if (args.headOption.contains("compactscale")) compactScaleProbe(spark,
      args.lift(1).map(_.toLong).getOrElse(200000L))
    else if (args.headOption.contains("ivfrqlab")) ivfRqLab(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    else if (args.headOption.contains("graphlab")) graphLab(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.001"))
    else if (args.headOption.contains("graphbuildprof")) {
      // stage-level timing of the kNN-graph BUILD (r17 task 4 lab)
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Long)]()
      val stageDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          js.stageIds.foreach(id => stageDesc.put(id, d))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(0L)
          val m = si.taskMetrics
          val site = Option(stageDesc.get(si.stageId)).filter(_.nonEmpty)
            .getOrElse(si.name.trim.take(60))
          stages.put(si.stageId, (site.take(90), ms,
            m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled + m.diskBytesSpilled))
        }
      })
      val t0 = System.nanoTime()
      val n = graft.functions.Similarity.knnGraph(
        Tables.embeddings(spark, args.lift(1).getOrElse("/root/testdata/sf0.01")), 10, 2).count()
      println(f"GRAPHBUILD total=${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._2).take(20).foreach { case (id, (nm, ms, sw, sp)) =>
        println(f"STAGE $id%4d ${ms / 1000.0}%7.1fs shufW=${sw / 1e9}%6.2fGB spill=${sp / 1e9}%6.2fGB $nm")
      }
    }
    else if (args.headOption.contains("count")) {
      val n = SparkEntry.queries(args(1))(spark,
        args.lift(2).getOrElse("/root/testdata/sf0.01")).count()
      println(s"COUNT[${args(1)}]=$n")
    }
    else if (args.headOption.contains("gendata")) genData(spark,
      args.lift(1).getOrElse("/tmp/scale/gen1x"),
      args.lift(2).map(_.toInt).getOrElse(1),
      args.lift(3).getOrElse("/root/testdata/sf0.1"))
    else if (args.headOption.contains("drift")) {
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
      val drift = Tables.schemaDrift(spark, dir)
      if (drift.isEmpty) println(s"DRIFT_CLEAN $dir")
      else { drift.foreach(d => println(s"DRIFT $d")); sys.exit(1) }
    }
    else {
      // typed Dataset[T] surface (graft.model)
      val ev = graft.model.Model.events(spark, "/root/testdata/sf0.001")
      val docs = graft.model.Model.documents(spark, "/root/testdata/sf0.001")
      println("TYPED_EVENTS=" + ev.filter(_.event_type == "purchase").count() +
        " TYPED_DOC_CHARS=" + docs.filter(_.n_chars > 100).count())
      val df = SparkEntry.entry(spark)
      println("ENTRY_ROWS=" + df.count())
      df.select("begin_date", "end_date", "total_spent", "total_transactions",
        "top_5_vendors", "fi_summary").show(false)
      println("DETAILS=" + df.select("details").head().getString(0).take(600))
    }
    spark.stop()
  }

  /** Parameter-sweep lab for the kNN-graph serving read (r17 task 2):
    * measures recall@10 of `knnGraphSearch` against the brute-force
    * cosine truth across (hops, beam, kGraph, rounds), plus the
    * exact-L2-scan ceiling (the walk ranks by L2; truth is cosine —
    * no L2 walk can beat the exact L2 scan's overlap with the cosine
    * top-k). */
  private def graphLab(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.Similarity
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 100 === 0
    val n = emb.count()
    val truth = Similarity.bruteForceTopKMemo(emb, pred, 10)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nTruth = truth.count()
    def rec(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = df.filter(col("rnk") <= 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      println(f"GRAPHLAB n=$n%-7d cfg=$label%-30s recall=${hits.toDouble / nTruth}%.3f sec=${(System.nanoTime() - t0) / 1e9}%7.2f")
    }
    // exact L2 scan = the ceiling of any L2-ranked walk
    rec("L2_exact_ceiling") {
      val e = Similarity.quantized(emb).localCheckpoint()
      val q = e.filter(pred).select(col("vec_id").as("query_id"), col("q").as("qa"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("q").as("ca"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr("aggregate(zip_with(qa, ca, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)").as("adist"))
      scored.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))))
    }
    val hA = Similarity.autoGraphHops(n)
    val bA = Similarity.autoGraphBeam(n)
    def recG(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = df.filter(pred)
        .select(col("vec_id").as("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      println(f"GRAPHLAB n=$n%-7d cfg=$label%-30s recall=${hits.toDouble / nTruth}%.3f sec=${(System.nanoTime() - t0) / 1e9}%7.2f")
    }
    recG("graph_r2 (node lists)")(Similarity.knnGraph(emb, 10, 2))
    recG("graph_r3 (node lists)")(Similarity.knnGraph(emb, 10, 3))
    rec(s"search_r2_h${hA}_b$bA (gated)")(
      Similarity.knnGraphSearch(emb, pred, 10, 10, 2, hA, bA))
    rec(s"search_r3_h${hA}_b$bA")(
      Similarity.knnGraphSearch(emb, pred, 10, 10, 3, hA, bA))
  }

  /** Small-files probe-cost measurement (`Smoke compactscale [rows]`,
    * r18 VERDICT #7): the StoreCompaction scaladoc claims per-file open
    * + footer cost dominates fragmented probe reads, but no number in
    * the repo backed it. Fix the TOTAL row count and land the SAME
    * digest store as 1× / 8× / 64× / 256× `batch=` generations (8 files each —
    * a streaming sink's per-tick fragmentation); time the ingest-probe
    * read (a fresh batch's digests anti-joined against the landed
    * store — `StreamingIngest`'s dedup probe shape) before and after
    * `compactIngestStore`. Identical rows at every point, so the
    * before/after delta IS the small-files tax. Two reps each; rep2
    * removes the FS listing cold-cache component. */
  private def compactScaleProbe(spark: SparkSession, rows: Long): Unit = {
    import org.apache.spark.sql.functions._
    import graft.streaming.StoreCompaction
    val base = java.nio.file.Files.createTempDirectory("graft_cscale").toString
    // fresh digests derived from the SHIFTED id — disjoint from any
    // landed content, so the anti-join keeps the whole probe batch
    val probe = graft.sources.Synthetic.documents(spark, 500)
      .select((col("doc_id") + 10000000L).as("doc_id"))
      .withColumn("digest", md5(concat(col("doc_id"), lit("_probe"))))
      .localCheckpoint()
    def timedProbe(store: String): Double = {
      val t0 = System.nanoTime()
      val n = probe.join(
          spark.read.parquet(s"$store/digests").select(col("digest")),
          Seq("digest"), "left_anti")
        .count()
      require(n == 500, s"probe must survive the anti-join, got $n")
      (System.nanoTime() - t0) / 1e9
    }
    def parquetFiles(store: String): Int =
      graft.LakeFs.list(s"$store/digests")
        .flatMap(d => graft.LakeFs.list(d.getPath.toString))
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // warm-up store: absorb codegen/reader init so the gens=1 row
    // isn't charged the session's first-parquet-read cost
    spark.range(8).select(col("id").as("doc_id"), md5(concat(col("id"), lit("w"))).as("digest"))
      .write.mode("overwrite").parquet(s"$base/warm/digests/batch=0")
    timedProbe(s"$base/warm"); timedProbe(s"$base/warm")
    Seq(1, 8, 64, 256).foreach { gens =>
      val store = s"$base/x$gens"
      val digests = graft.sources.Synthetic.documents(spark, rows)
        .select(col("doc_id"), md5(col("text")).as("digest"))
      // land the fixed corpus as `gens` generations of 8 files each,
      // plus an untouched frontier dir (the compaction contract)
      (0 until gens).foreach { g =>
        digests.filter(pmod(col("doc_id"), lit(gens)) === g)
          .repartition(8)
          .write.mode("overwrite").parquet(s"$store/digests/batch=$g")
      }
      spark.range(1).select(lit(-1L).as("doc_id"), lit("x").as("digest"))
        .coalesce(1).write.mode("overwrite").parquet(s"$store/digests/batch=$gens")
      // docs sub-store: minimal mirror so compactIngestStore's layout holds
      (0 to gens).foreach(g => spark.range(1).select(lit(g.toLong).as("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$store/docs/batch=$g"))
      val f0 = parquetFiles(store)
      val b1 = timedProbe(store); val b2 = timedProbe(store)
      StoreCompaction.compactIngestStore(spark, store)
      val f1 = parquetFiles(store)
      val a1 = timedProbe(store); val a2 = timedProbe(store)
      println(f"COMPACTSCALE gens=$gens%-3d files_before=$f0%-4d files_after=$f1%-3d " +
        f"probe_before=$b1%6.2f/$b2%5.2f s probe_after=$a1%6.2f/$a2%5.2f s")
    }
  }

  /** Parameter-sweep lab for the IVF-RQ serving point (r17 task 1,
    * extended r18 with the L8x16 / L8x32 / L6x64 rows): measures
    * recall@10 against the brute-force truth across stage/probe
    * settings, so the gated operating point is picked from data
    * rather than guessed. Throwaway-cheap: every row retrains at its
    * own params (distinct memo keys). */
  private def ivfRqLab(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.functions.Similarity
    val emb = Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 100 === 0
    val n = emb.count()
    val c = Similarity.autoIvfCells(n)
    val truth = Similarity.bruteForceTopKMemo(emb, pred, 10)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nTruth = truth.count()
    def rec(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = df.filter(col("rnk") <= 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      println(f"IVFRQLAB n=$n%-7d cells=$c%-3d cfg=$label%-28s recall=${hits.toDouble / nTruth}%.3f sec=${(System.nanoTime() - t0) / 1e9}%7.2f")
    }
    val sp = math.max(2, math.ceil(math.sqrt(c.toDouble)).toInt).min(c)
    rec(s"ivfrq_L4x64_p$sp (r17 gated)")(
      Similarity.ivfRqTopKMulti(emb, pred, 10, c, sp, Seq.fill(4)(64), 1))
    // the SERVED point reads AnnPolicy.ivfrqAutoKs (r19, VERDICT r18
    // item: the exact literal-drift class the config killed elsewhere
    // survived in this diagnostic) — the other rows are deliberate
    // non-served sweep points
    rec(s"ivfrq_L${graft.functions.AnnPolicy.ivfrqAutoKs.length}" +
        s"x${graft.functions.AnnPolicy.ivfrqAutoKs.head}_p$sp (served)")(
      Similarity.ivfRqTopKMulti(emb, pred, 10, c, sp,
        graft.functions.AnnPolicy.ivfrqAutoKs, 1))
    rec(s"ivfrq_L8x32_p$sp")(
      Similarity.ivfRqTopKMulti(emb, pred, 10, c, sp, Seq.fill(8)(32), 1))
    rec(s"ivfrq_L6x64_p$sp")(
      Similarity.ivfRqTopKMulti(emb, pred, 10, c, sp, Seq.fill(6)(64), 1))
    rec(s"ivfpq_m2k4_p2 (gated)")(
      Similarity.ivfpqTopK(emb, pred, 10, c, math.min(2, c), 2, 4, 1))
    rec(s"ivfpq_m16k64_p$sp")(
      Similarity.ivfpqTopK(emb, pred, 10, c, sp, 16, 64, 1))
    rec(s"ivfpq_m16k64_p2")(
      Similarity.ivfpqTopK(emb, pred, 10, c, math.min(2, c), 16, 64, 1))
    rec(s"ivfsq8_p2 (gated)")(
      Similarity.ivfSq8TopK(emb, pred, 10, c, math.min(2, c), 2))
    rec(s"ivfsq8_p$sp")(
      Similarity.ivfSq8TopK(emb, pred, 10, c, sp, 2))
  }

  /** Empirical scale validation (VERDICT r7 #2): generate synthetic
    * documents/embeddings at 1× and `factor`× (same schemas and planted
    * duplicate structure as `sources.Synthetic` documents), then
    * measure (a) candidate-pair counts of every banded dedup family
    * via `Dedup.candidateDiagnostics` and (b) wall time of the four
    * headline scale queries — so the "candidates stay ~linear, the
    * banded joins never go quadratic" claims in PLANS.md are measured,
    * not just argued from plan shape. Corpora land as parquet first
    * (the real scan shape) under a temp dir. */
  private def scaleProbe(spark: SparkSession, nBase: Long, factor: Int): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.functions.{Dedup, Similarity}
    import graft.sources.Synthetic
    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString
    def timed(label: String, mult: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME mult=$mult%-3d query=$label%-22s sec=${(System.nanoTime() - t0) / 1e9}%8.2f out_rows=$n")
    }
    Seq(1, factor).foreach { mult =>
      val nDocs = nBase * mult
      val nVecs = nBase * 2 / 5 * mult // the sf0.1 docs:embeddings ratio
      Synthetic.documents(spark, nDocs).write.mode("overwrite")
        .parquet(s"$base/x$mult/documents.parquet")
      Synthetic.embeddings(spark, nVecs).write.mode("overwrite")
        .parquet(s"$base/x$mult/embeddings.parquet")
      val docs = spark.read.parquet(s"$base/x$mult/documents.parquet")
      val emb = spark.read.parquet(s"$base/x$mult/embeddings.parquet")
      // auto caps (the production defaults: floor 1000 keeps oracle
      // fixtures exact) vs explicit 64 (the binding regime a 1000×
      // corpus reaches naturally — boilerplate buckets/postings there
      // dwarf any floor)
      Dedup.candidateDiagnostics(docs, 3, 8, 4).collect().foreach { r =>
        println(f"CAND mult=$mult%-3d caps=auto method=${r.getString(0)}%-16s n_docs=${r.getLong(1)}%-7d cap=${r.getLong(2)}%-5d n_candidates=${r.getLong(3)}")
      }
      Dedup.candidateDiagnostics(docs, 3, 8, 4, maxDocFreq = 64, maxBucket = 64)
        .collect().foreach { r =>
          println(f"CAND mult=$mult%-3d caps=64   method=${r.getString(0)}%-16s n_docs=${r.getLong(1)}%-7d cap=${r.getLong(2)}%-5d n_candidates=${r.getLong(3)}")
        }
      timed("minhash_lsh_pairs", mult)(
        Dedup.minhashLshPairs(docs, 3, 8, 4, 0.5).count())
      timed("simhash64_neardup", mult)(
        Dedup.simhash64NearDupPairs(docs).count())
      timed("dedup_corpus", mult)(
        Dedup.dedupCorpus(docs, 3, 8, 4, 0.5).count())
      timed("pq_topk", mult)(
        Similarity.pqTopK(emb, col("vec_id") % 100 === 0, 10, 2, 4, 1).count())
      timed("rq_topk", mult)(
        Similarity.rqTopK(emb, col("vec_id") % 100 === 0, 10, 4, 4, 1).count())
    }
  }

  /** Isolated 3-point ANN-family scaling fit (`Smoke annscale
    * [nBase]`): gen1x/4x/10x Synthetic embeddings with a FIXED query
    * set (vec_id < 20 — constant |Q| at every scale, unlike the gated
    * queries' %100 predicate whose query count grows with the corpus
    * and contaminates in-suite exponents). Each method family is timed
    * at each scale in one session; scales use DIFFERENT parquet dirs,
    * so IndexMemo cannot leak training across scales (keys include the
    * input plan) — within a scale, topk siblings deliberately ride the
    * family's one training run, same as production. Pinned-parameter
    * shapes (the gated configs) are measured next to their auto-sized
    * production siblings: pinned LSH/IVF are EXPECTED to trend linear
    * (fixed 2^bits buckets / fixed cells ⇒ occupancy grows with n);
    * the auto rows are the scale story. */
  private def annScaleProbe(spark: SparkSession, nBase: Long): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.functions.Similarity
    import graft.sources.Synthetic
    val base = java.nio.file.Files.createTempDirectory("graft_annscale").toString
    val pred = col("vec_id") < 20 // FIXED |Q| = 20 at every scale
    Seq(1, 4, 10).foreach { mult =>
      val n = nBase * mult
      Synthetic.embeddings(spark, n, nLabels = (20 * mult))
        .write.mode("overwrite").parquet(s"$base/x$mult/embeddings.parquet")
      val emb = spark.read.parquet(s"$base/x$mult/embeddings.parquet")
      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"ANNSCALE mult=$mult%-3d n=$n%-7d method=$label%-14s sec=${(System.nanoTime() - t0) / 1e9}%8.2f out_rows=$rows")
      }
      timed("brute_force")(Similarity.bruteForceTopK(emb, pred, 10).count())
      timed("lsh_pinned")(Similarity.lshTopK(emb, pred, 10, 4).count())
      timed("lsh_auto")(Similarity.lshTopK(emb, pred, 10,
        Similarity.autoLshBits(n)).count())
      timed("lsh_multi")(Similarity.lshTopKMulti(emb, pred, 10, 4, 4).count())
      timed("ivf_pinned")(Similarity.ivfTopK(emb, pred, 10, 16, 4).count())
      timed("ivf_auto")(Similarity.ivfTopK(emb, pred, 10,
        Similarity.autoSemDedupK(n), 4).count())
      timed("pq_topk")(Similarity.pqTopK(emb, pred, 10, 4, 16, 1).count())
      timed("rq_topk")(Similarity.rqTopK(emb, pred, 10, 16, 16, 1).count())
      timed("ivfpq_topk")(Similarity.ivfpqTopK(emb, pred, 10, 16, 4, 4, 16, 1).count())
      timed("sq8_topk")(Similarity.sq8TopK(emb, pred, 10).count())
      // flat auto semDedup (k = n/64 cells: n²/64 assignment work) vs
      // the two-level assignment (k1 = k2 = √(n/64): n·2√(n/64)) —
      // the head-to-head the hierarchical fix exists for
      timed("semdedup_flat")(Similarity.semDedup(emb, 0, 2, 0.35).count())
      timed("semdedup_hier")(Similarity.semDedupHier(emb, 0, 0, 2, 0.35).count())
    }
  }

  /** Drive the full-history streaming ingest sink end-to-end on real
    * corpus data: land sf0.001 documents in two waves (the second wave
    * re-lands half of wave one), run ONE file-source stream through
    * `StreamingIngest.start`, and print the landed corpus + digest
    * counts — duplicates across micro-batches must not survive. */
  /** Drive the streaming MEDIA ingest end-to-end on real corpus-derived
    * payloads: land sf0.001 documents as binary media in two waves (the
    * second wave re-lands half of wave one under NEW ids — byte-
    * identical payloads, the digest-probe path), run ONE file-source
    * stream through `StreamingMediaIngest.start`, and print corpus +
    * ledger. Cross-batch dups must not survive, and the ledger must
    * account every arrival. */
  private def mediaIngestProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingMediaIngest
    val media = graft.multimodal.Multimodal.fromDocuments(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("id", "modality", "content")
    val base = java.nio.file.Files.createTempDirectory("graft_media_probe")
    val landing = base.toString + "/landing"
    val store = base.toString + "/store"
    media.filter(col("id") < 250).coalesce(1).write.parquet(landing)
    val q = StreamingMediaIngest.start(
      spark.readStream.schema(media.schema).parquet(landing),
      store, base.toString + "/ck")
    q.processAllAvailable()
    val afterWave1 = StreamingMediaIngest.corpus(spark, store).count()
    // wave 2: ids 125..374 re-landed under +10000 ids — the first half
    // byte-duplicates wave-1 payloads and must be probe-rejected
    media.filter(col("id") >= 125 && col("id") < 375)
      .withColumn("id", col("id") + 10000)
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable()
    // wave 3 (all fresh): gives the store a third committed generation
    // so the compaction drive below has something to consolidate
    media.filter(col("id") >= 375 && col("id") < 425)
      .withColumn("id", col("id") + 10000)
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable(); q.stop()
    val n = StreamingMediaIngest.corpus(spark, store).count()
    println(s"MEDIA_WAVE1=$afterWave1 MEDIA_CORPUS=$n")
    StreamingMediaIngest.stats(spark, store).orderBy(col("batch"))
      .collect().foreach(r => println(
        s"MEDIA_LEDGER batch=${r.getLong(0)} n_in=${r.getLong(1)} " +
          s"batch_rej=${r.getLong(2)} corpus_rej=${r.getLong(3)} landed=${r.getLong(4)}"))
    // compaction drive: consolidate the committed generations, then
    // prove the compacted index still probe-rejects — wave 3 re-lands
    // wave-1 payloads under fresh ids plus one genuinely new payload
    def dirs(s: String) = new java.io.File(s"$store/$s").listFiles()
      .map(_.getName).count(_.startsWith("batch="))
    val dirsBefore = dirs("fp")
    // generation-count trigger (r14): three landed generations trip the
    // every=3 threshold; an under-threshold store must be left alone
    require(!graft.streaming.StoreCompaction
        .compactMediaStoreEvery(spark, store, every = dirsBefore + 1),
      "trigger must no-op below its generation threshold")
    require(dirs("fp") == dirsBefore, "a no-op trigger must not touch the store")
    require(graft.streaming.StoreCompaction
        .compactMediaStoreEvery(spark, store, every = 3),
      s"$dirsBefore landed generations must trip the every=3 trigger")
    val dirsAfter = dirs("fp")
    require(dirsAfter < dirsBefore,
      s"compaction must consolidate generations (fp dirs $dirsBefore -> $dirsAfter)")
    val nCompacted = StreamingMediaIngest.corpus(spark, store).count()
    val frontier = StreamingMediaIngest.maxLandedBatch(store)
    import spark.implicits._
    val wave3 = media.filter(col("id") < 50)
        .withColumn("id", col("id") + 20000)
      .union(Seq((30000L, "image",
        Array.tabulate(512)(i => (i * 37 + 11).toByte))).toDF("id", "modality", "content"))
    StreamingMediaIngest.ingestBatch(wave3, store, frontier + 1, 3)
    val nAfter = StreamingMediaIngest.corpus(spark, store).count()
    println(s"MEDIA_COMPACT dirs=$dirsBefore->$dirsAfter corpus=$n->$nCompacted " +
      s"wave4_in=${wave3.count()} landed_after=$nAfter")
    require(nCompacted == n, "compaction must not change the corpus")
    require(nAfter == n + 1,
      "re-landed wave-1 payloads must probe-reject against the compacted index; " +
        "only the one new payload lands")
  }

  /** The END-TO-END curation pipeline (`Smoke curate [sfDir]`) — the
    * composition a training-data user actually runs, chained from the
    * gated operators with a per-stage attrition ledger:
    * quality/lang/repetition filter (`corpusFilter`) → exact + MinHash
    * near-dup APPLY (`dedupCorpus`) → benchmark decontamination
    * (`decontaminate` vs a held-out slice) → leakage-safe cluster
    * split (`withClusterSplit` — no dup pair straddles train/eval) →
    * sequence packing (`packSequences`, 512-token bins per split).
    * Every stage is the library's own oracle-gated operator; this
    * probe certifies they COMPOSE (schemas line up, memos share, the
    * ledger reconciles end to end). */
  private def curateProbe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.{Dedup, Sampling, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
    val nIn = docs.count()
    // stage 1: rule filter
    val verdicts = TextAnalysis.corpusFilter(docs).localCheckpoint()
    val kept1 = docs.join(verdicts.filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi").localCheckpoint()
    val n1 = kept1.count()
    val dropByReason = verdicts.filter(!col("keep"))
      .groupBy(col("drop_reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage 2: exact + near-dup APPLY
    val kept2 = Dedup.dedupCorpus(kept1, 3, 8, 4, 0.5).localCheckpoint()
    val n2 = kept2.count()
    // stage 3: decontamination vs a held-out "benchmark" slice
    val benchmark = docs.filter(col("doc_id") % 97 === 0)
    val decon = Dedup.decontaminate(kept2, benchmark, 5, 3)
    val kept3 = kept2.join(decon.filter(!col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_semi").localCheckpoint()
    val n3 = kept3.count()
    // stage 4: leakage-safe split (cluster-keyed buckets)
    val split = Dedup.withClusterSplit(kept3, 3, 8, 4, 0.5, 10, 10)
      .localCheckpoint()
    val splitCounts = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage 5: 512-token sequence packing per split
    val packed = Sampling.packSequences(
      split.withColumn("_nt", size(TextAnalysis.tokens(col("text")))),
      col("_nt"), "split", "doc_id", 512L)
    val bins = packed.groupBy(col("split"))
      .agg(count(lit(1)).as("bins"), sum(col("sum_tokens")).as("toks"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    println(s"CURATE_IN=$nIn FILTERED=$n1 (drops=$dropByReason) " +
      s"DEDUPED=$n2 DECONTAMINATED=$n3 SPLITS=$splitCounts")
    bins.foreach { case (s, (b, t)) =>
      println(f"CURATE_PACK split=$s bins=$b tokens=$t fill=${t.toDouble / (b * 512)}%.3f") }
    require(n1 <= nIn && n2 <= n1 && n3 <= n2, "attrition must be monotone")
    require(splitCounts.values.sum == n3, "splits must partition the clean corpus")
    require(bins.nonEmpty && bins.values.forall(_._1 > 0), "packing must emit bins")
  }

  /** Drive the streaming cluster-label maintenance end to end (`Smoke
    * cluster`): ONE file-source stream through
    * `StreamingClusterIngest.start`, two waves (the second re-lands
    * half of wave one under new ids — every copy must LAND and get
    * labeled into its original's cluster), then check the incremental
    * labeling against the one-shot `connectedComponents(dupPairs(all))`
    * — the merge-law recurrence, live. */
  private def clusterIngestProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingClusterIngest
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_cluster_probe")
    val landing = base.toString + "/landing"
    val store = base.toString + "/store"
    docs.filter(col("doc_id") < 250).coalesce(1).write.parquet(landing)
    val q = StreamingClusterIngest.start(
      spark.readStream.schema(docs.select("doc_id", "text").schema).parquet(landing),
      store, base.toString + "/ck")
    q.processAllAvailable()
    val wave1Clustered = StreamingClusterIngest.labels(spark, store).count()
    // wave 2: ids 0..124 re-landed under +10000 ids — every copy lands
    // AND joins its original's cluster
    docs.filter(col("doc_id") < 125).withColumn("doc_id", col("doc_id") + 10000)
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable(); q.stop()
    val landed = StreamingClusterIngest.corpus(spark, store).count()
    val labels = StreamingClusterIngest.labels(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.functions.Dedup.connectedComponents(
        graft.functions.Dedup.dupPairs(
          StreamingClusterIngest.corpus(spark, store), 3, 8, 4, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"CLUSTER_WAVE1_CLUSTERED=$wave1Clustered CLUSTER_LANDED=$landed " +
      s"CLUSTER_LABELED=${labels.size} ONE_SHOT=${oneShot.size} " +
      s"MATCH=${labels == oneShot}")
    require(landed == 375L, s"every arrival must land, got $landed")
    require(labels == oneShot,
      "incremental labeling must equal the one-shot closure over the landed corpus")
    require((0 until 125).forall(i => labels.get(10000L + i).contains(labels.getOrElse(i.toLong, i.toLong))),
      "each re-landed copy must label into its original's cluster")
  }

  private def ingestProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingIngest
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_probe")
    val landing = base.toString + "/landing"
    val store = base.toString + "/store"
    docs.filter(col("doc_id") < 250).coalesce(1).write.parquet(landing)
    val q = StreamingIngest.start(
      spark.readStream.schema(docs.schema).parquet(landing),
      store, base.toString + "/ck")
    q.processAllAvailable()
    val afterWave1 = StreamingIngest.corpus(spark, store).count()
    // wave 2: docs 125..374 — the first half duplicates wave 1 rows
    docs.filter(col("doc_id") >= 125 && col("doc_id") < 375)
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable(); q.stop()
    val corpus = StreamingIngest.corpus(spark, store)
    val n = corpus.count()
    val distinctFp = corpus
      .select(org.apache.spark.sql.functions.md5(
        graft.functions.Dedup.canonical(col("text"))).as("fp"))
      .distinct().count()
    println(s"INGEST_WAVE1=$afterWave1 INGEST_TOTAL=$n DISTINCT_FP=$distinctFp " +
      s"DIGEST_STORE=${StreamingIngest.digestStore(spark, store).count()}")
  }

  /** Drive the quality-gated streaming ingest end to end (`Smoke
    * quality`): two waves through `StreamingQualityIngest` (wave 2
    * half-overlaps wave 1, so both reject kinds fire), then print the
    * per-batch admission ledger and check its contract —
    * n_in = n_quality_rejected + n_dup_rejected + n_landed per batch,
    * Σ n_landed = corpus size, and landed docs all score keep=1. */
  private def qualityIngestProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.streaming.{StreamingIngest, StreamingQualityIngest}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val base = java.nio.file.Files.createTempDirectory("graft_quality_probe")
    val landing = base.toString + "/landing"
    val store = base.toString + "/store"
    docs.filter(col("doc_id") < 250).coalesce(1).write.parquet(landing)
    val q = StreamingQualityIngest.start(
      spark.readStream.schema(docs.schema).parquet(landing),
      store, base.toString + "/ck")
    q.processAllAvailable()
    // wave 2: half duplicates of wave 1 -> cross-batch dup rejects
    docs.filter(col("doc_id") >= 125 && col("doc_id") < 375)
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable(); q.stop()
    val ledger = StreamingQualityIngest.stats(spark, store)
      .orderBy(col("batch")).collect()
    ledger.foreach(r => println(
      s"LEDGER batch=${r.getLong(0)} n_in=${r.getLong(1)} " +
      s"quality_rejected=${r.getLong(2)} dup_rejected=${r.getLong(3)} " +
      s"landed=${r.getLong(4)}"))
    val balanced = ledger.forall(r => r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4))
    val corpus = StreamingIngest.corpus(spark, store)
    val landedTotal = ledger.map(_.getLong(4)).sum
    val gateClean = graft.functions.TextAnalysis.hashedQualityScore(corpus)
      .filter(col("keep") =!= 1L).count()
    println(s"LEDGER_BALANCED=$balanced LANDED_TOTAL=$landedTotal " +
      s"CORPUS=${corpus.count()} GATE_VIOLATIONS=$gateClean")
    require(balanced, "ledger arithmetic must balance per batch")
    require(landedTotal == corpus.count(), "ledger landed must equal corpus size")
    require(gateClean == 0, "no landed doc may fail the quality gate")
  }

  /** Drive the format breadth: CSV/ORC roundtrips of lineitem and a
    * bucketed co-located join, printing the join's exchange count. */
  private def formatsProbe(spark: SparkSession): Unit = {
    import graft.sources.Formats
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    Formats.writeCsv(li, base + "/csv")
    val csvN = Formats.readCsv(spark, base + "/csv", li.schema).count()
    Formats.writeOrc(li, base + "/orc")
    val orcN = Formats.readOrc(spark, base + "/orc").count()
    println(s"CSV_ROWS=$csvN ORC_ROWS=$orcN PARQUET_ROWS=${li.count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Formats.writeBucketed(li.select("l_orderkey", "l_quantity"), "sb_li", "l_orderkey", 8)
    Formats.writeBucketed(Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice"), "sb_o", "o_orderkey", 8)
    val j = spark.table("sb_li").join(spark.table("sb_o"), col("l_orderkey") === col("o_orderkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println("BUCKETED_JOIN_SHUFFLES=" +
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
  }

  /** Drive the JSON upload-source surface (S1/S2/P4): land metadata +
    * summary docs (one malformed, one empty) and run the full
    * extract -> fold -> report pipeline from them. */
  private def uploadsProbe(spark: SparkSession): Unit = {
    import graft.sources.UploadSource
    val meta = java.nio.file.Files.createTempDirectory("graft_meta")
    val sums = java.nio.file.Files.createTempDirectory("graft_sums")
    java.nio.file.Files.writeString(meta.resolve("list.json"),
      """{"uploaded_files": [{"id": "1"}, {"id": "2"}, {"id": "3"}]}""")
    java.nio.file.Files.writeString(sums.resolve("s.json"), Seq(
      """{"upload_id": 1, "begin_date": "2024-01-01", "end_date": "2024-01-31", "total_spent": 99.5, "total_transactions": 4, "spending_per_category": {"food": 60.5, "rent": 39.0}, "spending_per_vendor": {"acme": 99.5}}""",
      """{"upload_id": 2, "begin_date": "2024-02-01", "end_date": "2024-02-29", "total_spent": 10.0, "total_transactions": 1, "spending_per_category": {"food": 10.0}, "spending_per_vendor": {"acme": 10.0}}""",
      """not json — a failed fetch""",
      """{"upload_id": 3}""").mkString("\n"))
    println("UPLOAD_IDS=" + UploadSource.uploadedFileIds(spark, meta.toString)
      .collect().map(_.getLong(0)).sorted.toSeq)
    val summaries = UploadSource.uploadSummaries(spark, sums.toString)
    println("SUMMARIES=" + summaries.count())
    val tx = UploadSource.transactionsFromSummaries(summaries, "spending_per_category")
      .withColumnRenamed("key", "category")
      .withColumn("vendor", org.apache.spark.sql.functions.lit("acme"))
      .select("txn_date", "category", "vendor", "amount")
    val report = graft.operators.SpendingReport.enriched(tx)
    report.select("begin_date", "end_date", "total_spent", "total_transactions",
      "fi_summary").show(false)
  }

  /** Time one query in isolation, repeated (rep 1 is cold after a
    * Bench-style warmup; later reps may hit plan-level caches). */
  /** Scale-up corpus generator (`Smoke gendata <outDir> <factor>
    * [baseSfDir]`): writes a /root/testdata-shaped directory whose
    * FACT tables (orders, lineitem, events) are the base tables
    * replicated `factor`× with consistent key remaps (each replica k
    * offsets its join keys, so orders↔lineitem clusters stay intact
    * and no artificial hot keys appear), dims copied as-is (fact-side
    * scaling isolates the scan/shuffle growth the scaling exponents
    * measure), and documents/embeddings from `Synthetic` at
    * `factor`× their sf0.1 cardinality — the planted-dup generator is
    * prefix-consistent, so a gen1x vs gen10x pair measures REAL
    * corpus growth with the generator held constant (comparing
    * generated docs against driver docs would conflate distribution
    * differences with scale). Run Bench with SPARK_GRAFT_SKIP_DEMO=1
    * against the two dirs and regress per-family exponents. */
  private def genData(spark: SparkSession, outDir: String, factor: Int,
                      baseSf: String): Unit = {
    import org.apache.spark.sql.functions._
    val reps = spark.range(factor).select(col("id").as("_k"))
    def write(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(8).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"GENDATA $name rows=${spark.read.parquet(s"$outDir/$name.parquet").count()}")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$baseSf/$t.parquet"), t)
    }
    val orders = spark.read.parquet(s"$baseSf/orders.parquet")
    write(orders.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") * factor + col("_k"))
      .drop("_k"), "orders")
    val lineitem = spark.read.parquet(s"$baseSf/lineitem.parquet")
    write(lineitem.crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") * factor + col("_k"))
      .drop("_k"), "lineitem")
    val events = spark.read.parquet(s"$baseSf/events.parquet")
    write(events.crossJoin(reps)
      .withColumn("event_id", col("event_id") * factor + col("_k"))
      // remap users per replica (the same consistent-key scheme as
      // o_orderkey/l_orderkey): each replica is a fresh user
      // population with the base per-user timelines intact, so
      // (user, ts) can never collide ACROSS replicas — the previous
      // +k-seconds ts shift collided whenever a base user had two
      // events < factor seconds apart — and user-keyed operators
      // (sessions, funnels, dedup windows) scale in #users, which is
      // the real growth mode.
      .withColumn("user_id", col("user_id") * factor + col("_k"))
      .drop("_k"), "events")
    write(graft.sources.Synthetic.documents(spark, 5000L * factor), "documents")
    // cluster count scales with the corpus (constant cluster size) so
    // near-dup answers grow linearly — see Synthetic.embeddings
    write(graft.sources.Synthetic.embeddings(spark, 2000L * factor,
      nLabels = 20 * factor), "embeddings")
  }

  /** Plan audit over EVERY SparkEntry query: shuffle exchanges, scans,
    * whole-stage-codegen spans, broadcast joins, and pushed filters —
    * the per-query evidence behind the 100 TB shuffle-budget story.
    * Counts come from the pre-execution physical plan (stable, not
    * AQE-rewritten), so they are comparable across runs. */
  private def auditProbe(spark: SparkSession, sfDir: String): Unit = {
    println(f"${"query"}%-28s ${"exch"}%5s ${"bcast"}%5s ${"scan"}%5s ${"wscg"}%5s ${"pushed"}%6s")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // structural counts from the PRE-execution plan (stable, the
        // same numbers ShuffleBudgetSpec pins)
        val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
        val exch = lines.count(l => l.contains("Exchange hashpartitioning")
          || l.contains("Exchange rangepartitioning") || l.contains("Exchange SinglePartition"))
        val bcast = lines.count(_.contains("BroadcastExchange"))
        val scan = lines.count(_.contains("Scan parquet"))
        val pushed = lines.count(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        // codegen spans ("*(n)" prefixes) only annotate the FINAL
        // adaptive plan — execute THIS df's QueryExecution (collect;
        // a noop write would plan a separate one), then count spans
        df.collect()
        val wscg = df.queryExecution.executedPlan.toString.linesIterator
          .flatMap(l => "\\*\\((\\d+)\\)".r.findAllMatchIn(l).map(_.group(1)))
          .toSeq.distinct.size
        println(f"$name%-28s $exch%5d $bcast%5d $scan%5d $wscg%5d $pushed%6d")
      } catch { case e: Throwable =>
        println(f"$name%-28s FAILED ${e.toString.take(80)}")
      }
    }
  }

  /** Streaming-ingest scale probe (`Smoke streamscale [baseN]`): land
    * corpora at 1×/10×/32× baseN docs (2/5·baseN vectors — the sf0.1
    * ratio), then time ONE FIXED tick of each streaming sink against
    * each landed size: near-dup ingest, cluster-label maintenance,
    * ANN encode, ANN search. The O(batch)-per-tick claims are
    * spec-proven; this MEASURES them across corpus decades (the
    * BUILD_NOTES streaming scale table). The tick batch is identical
    * at every scale: 500 fresh-content docs / 200 vectors with ids
    * offset to 10M+, disjoint from any landed corpus. */
  private def streamScaleProbe(spark: SparkSession, baseN: Long): Unit = {
    import graft.sources.Synthetic
    import graft.streaming.{StreamingAnnIngest, StreamingClusterIngest, StreamingGraphIngest, StreamingNearDupIngest}
    import org.apache.spark.sql.functions.{col, expr, length}
    val base = java.nio.file.Files.createTempDirectory("graft_sscale").toString
    val off = 10000000L
    // fresh unique content derived from the SHIFTED id, so the batch
    // is neither a dup of any landed doc nor scale-dependent
    val batchDocs = Synthetic.documents(spark, 500)
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(0, 45), i -> substring(md5(concat(doc_id, '_f', i)), 1, 8)))"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .localCheckpoint()
    val batchVecs = Synthetic.embeddings(spark, 200)
      .withColumn("vec_id", col("vec_id") + off)
      .localCheckpoint()
    def timed(label: String, mult: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STREAMSCALE mult=$mult%-3d tick=$label%-11s sec=${(System.nanoTime() - t0) / 1e9}%7.2f")
    }
    Seq(1, 10, 32).foreach { mult =>
      val docs = Synthetic.documents(spark, baseN * mult).localCheckpoint()
      val vecs = Synthetic.embeddings(spark, baseN * 2 / 5 * mult).localCheckpoint()
      val nd = s"$base/nd_x$mult"
      StreamingNearDupIngest.ingestBatch(docs, nd, 0, 3, 8, 4, 0.5)
      timed("neardup", mult)(
        StreamingNearDupIngest.ingestBatch(batchDocs, nd, 1, 3, 8, 4, 0.5))
      val cl = s"$base/cl_x$mult"
      StreamingClusterIngest.ingestBatch(docs, cl, 0, 3, 8, 4, 0.5)
      timed("cluster", mult)(
        StreamingClusterIngest.ingestBatch(batchDocs, cl, 1, 3, 8, 4, 0.5))
      val ann = s"$base/ann_x$mult"
      StreamingAnnIngest.buildIndex(vecs, ann, m = 2, ksub = 4, iters = 1)
      timed("ann_encode", mult)(
        StreamingAnnIngest.ingestBatch(batchVecs, ann, 1))
      timed("ann_search", mult)(
        graft.functions.Similarity.pqSearchIndex(
            batchVecs.limit(20),
            StreamingAnnIngest.codeIndex(spark, ann),
            StreamingAnnIngest.centroids(spark, ann), 10)
          .write.format("noop").mode("overwrite").save())
      // graph rung (r16): walk-insert tick + serving walk over the
      // landed graph store
      val gr = s"$base/gr_x$mult"
      StreamingGraphIngest.buildIndex(vecs, gr, k = 10, rounds = 2)
      timed("graph_insert", mult)(
        StreamingGraphIngest.ingestBatch(batchVecs, gr, 0, 10, 3, 10))
      timed("graph_serve", mult)(
        StreamingGraphIngest.search(spark, gr, batchVecs.limit(20), 10, 3, 10)
          .write.format("noop").mode("overwrite").save())
    }
  }

  private def timeProbe(spark: SparkSession, name: String, sfDir: String, reps: Int): Unit = {
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).selectExpr("md5(text) AS h")
      .write.format("noop").mode("overwrite").save()
    // comma-separated names time a FAMILY sequentially in one JVM —
    // the only way to observe cross-query IndexMemo sharing (each name
    // alone in a fresh JVM retrains the shared interior)
    val names = name.split(",").map(_.trim).filter(_.nonEmpty)
    (1 to reps).foreach { i =>
      var total = 0.0
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"TIME[$n][$i] $sec%.2f s")
      }
      if (names.length > 1) println(f"TIME[family][$i] $total%.2f s")
    }
  }

  /** Drive the streaming pipeline end-to-end: stage a landing dir with
    * one batch of events, run the AvailableNow merge sink, then land a
    * SECOND copy (a replay) and run again — the P5 guard must keep the
    * table unchanged. */
  private def streamProbe(spark: SparkSession): Unit = {
    import graft.streaming.StreamingReport
    val landing = java.nio.file.Files.createTempDirectory("graft_landing")
    val reports = java.nio.file.Files.createTempDirectory("graft_reports").toString + "/reports"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      landing.resolve("batch0.parquet"))
    // Per-batch latency: triggerExecution covers the whole micro-batch
    // (plan + state + sink) — printed per probe so a streaming perf
    // regression is a visible number in the smoke log, mirroring the
    // bound asserted in StreamingSpec's latency test.
    def printLatency(tag: String,
                     q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        println(s"STREAM_BATCH_MS[$tag][batch=${p.batchId}] " +
          p.durationMs.get("triggerExecution"))
      }
    def runOnce(tag: String): Unit = {
      val q = StreamingReport.reportMergeSink(
        StreamingReport.transactionsStream(spark, landing.toString), reports).start()
      q.awaitTermination()
      printLatency(tag, q)
    }
    // stateful op over the same landing stream
    val stTmp = java.nio.file.Files.createTempDirectory("graft_state").toString
    val sq = graft.streaming.StatefulSpend.runningVendorSpend(
      StreamingReport.transactionsStream(spark, landing.toString))
      .writeStream.outputMode("update").format("memory").queryName("smoke_state")
      .option("checkpointLocation", stTmp).start()
    sq.processAllAvailable(); sq.stop()
    printLatency("stateful", sq)
    println("STATEFUL_VENDORS=" + spark.table("smoke_state")
      .select("vendor").distinct().count())
    runOnce("merge_initial")
    val t1 = spark.read.parquet(reports)
    println("STREAM_REPORT_ROWS=" + t1.count() +
      " TXN_TOTAL=" + t1.agg(org.apache.spark.sql.functions.sum("total_transactions")).head().getLong(0))
    // replay: same events landed again (new file name, same content)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      landing.resolve("batch1.parquet"))
    runOnce("merge_replay")
    val t2 = spark.read.parquet(reports)
    println("AFTER_REPLAY_ROWS=" + t2.count() +
      " TXN_TOTAL=" + t2.agg(org.apache.spark.sql.functions.sum("total_transactions")).head().getLong(0) +
      " VERSIONS=" + t2.select("version").distinct().collect().map(_.getString(0)).sorted.toSeq)
  }

  /** Drive the ReportUpsert.mergeInto sink: first merge populates the
    * table, a re-merge of identical data is a no-op (P5 guard), a merge
    * of grown data updates in place. */
  private def upsertProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.ReportUpsert
    val dir = "/tmp/graft_reports"
    ReportUpsert.deleteDir(dir)
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    val half = ReportUpsert.dailyReports(
      tx.filter(dayofmonth(col("txn_date")) <= 15 || col("category") =!= "error"), "v1")
    val full = ReportUpsert.dailyReports(tx, "v2")
    ReportUpsert.mergeInto(dir, half)
    println("AFTER_V1=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
    ReportUpsert.mergeInto(dir, half.withColumn("version", lit("v1b")))
    println("AFTER_REMERGE=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
    ReportUpsert.mergeInto(dir, full)
    println("AFTER_V2=" + spark.read.parquet(dir).groupBy("version").count().collect().toSeq)
  }
}
