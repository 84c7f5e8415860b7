package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup
import graft.sources.Synthetic

/** Empirical backing for the 100×-scale claims (VERDICT r7 #2): on the
  * planted `Synthetic` corpus — whose true near-dup pair population
  * grows linearly in nDocs by construction — the candidate counts of
  * every banded blocking family must grow ~linearly too, and the
  * posting-list df cap must be observed actually BINDING (excluding
  * hot shingles) rather than just argued about. */
class CandidateLinearitySpec extends SparkSpec {

  private val GROW = 4 // corpora of n and 4n docs

  test("banded candidate counts grow ~linearly on the planted corpus") {
    val n = 400L
    // explicit caps of 8: the per-group boilerplate (shingle df and
    // LSH bucket sizes both ~n/20 = 20 at 1×) must be binding at BOTH
    // sizes for those families' counts to isolate the planted-pair
    // growth (the auto caps' floor only binds past 20k docs — `Smoke
    // scale` exercises that)
    val c1 = Dedup.candidateDiagnostics(Synthetic.documents(spark, n), 3, 8, 4,
      maxDocFreq = 8, maxBucket = 8)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val c4 = Dedup.candidateDiagnostics(Synthetic.documents(spark, n * GROW), 3, 8, 4,
      maxDocFreq = 8, maxBucket = 8)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // The 1× corpus is the literal prefix of the 4× one, so candidates
    // can only grow; each family must stay within ~linear growth plus
    // its documented random-collision floor.
    for (m <- Seq("simhash64_combi", "inverted_capped")) {
      assert(c4(m) > 0 && c1(m) > 0, s"$m produced no candidates: $c1 / $c4")
      val bound = GROW.toLong * c1(m) * 3 / 2 // linear × 1.5 slack
      assert(c4(m) <= bound,
        s"$m candidates grew superlinearly: ${c1(m)} -> ${c4(m)} (bound $bound)")
    }
    // minhash under the hot-bucket cap B: every cold bucket holds <= B
    // docs, so per band Σ C(size,2) <= n·(B-1)/2 — candidates obey the
    // CLOSED-FORM linear bound bands·n·(B-1)/2 as a theorem, at any
    // corpus size (the cap is what MAKES the family linear; ratio
    // asserts near the cap boundary would be flaky by construction)
    assert(c1("minhash_lsh") > 0, s"minhash produced no candidates: $c1")
    assert(c1("minhash_lsh") <= 4 * n * 7 / 2, s"cap bound violated at 1x: $c1")
    assert(c4("minhash_lsh") <= 4 * (n * GROW) * 7 / 2, s"cap bound violated at 4x: $c4")
    // and the cap must be observed BINDING at 4×: the boilerplate
    // band-buckets (size ~n/20·p) cross cap 8 there, so the uncapped
    // count carries the quadratic bucket term the capped one fenced
    val uncapped4 = Dedup.candidateDiagnostics(
        Synthetic.documents(spark, n * GROW), 3, 8, 4,
        maxDocFreq = 8, maxBucket = Int.MaxValue)
      .collect().find(_.getString(0) == "minhash_lsh").get.getLong(3)
    assert(uncapped4 > c4("minhash_lsh"),
      s"bucket cap never bound at 4x: uncapped $uncapped4 vs capped ${c4("minhash_lsh")}")
    // plain 4×16 simhash banding additionally carries the ~n²/2^16
    // random-collision floor — allow it on top of the linear bound,
    // and require the combi tables not to exceed the plain banding's
    // candidates (that is the point of paying 56 tables instead of 4)
    val floor4 = (n * GROW) * (n * GROW) / 32768
    assert(c4("simhash64") <= GROW.toLong * c1("simhash64") * 3 / 2 + floor4,
      s"simhash64 grew past linear + collision floor: ${c1("simhash64")} -> ${c4("simhash64")}")
    assert(c4("simhash64_combi") <= c4("simhash64"),
      s"combi tables must not generate more candidates than plain bands: $c4")
  }

  test("autoLshBits holds bucket occupancy ~constant: candidates linear where fixed bits go quadratic") {
    import graft.functions.Similarity
    // formula: bits = ceil(log2(n / targetBucket))
    assert(Similarity.autoLshBits(2000, 256) == 3)
    assert(Similarity.autoLshBits(20000, 256) == 7)
    assert(Similarity.autoLshBits(2000000, 256) == 13)
    assert(Similarity.autoLshBits(100, 256) == 1) // floor
    // empirical, fully md5-deterministic: planted-cluster embeddings
    // with cluster COUNT ∝ n (constant cluster size -> linear true
    // answer). Under auto bits the banded candidate count stays ~110-130
    // per row across 16× growth; under the fixed 4-bit demo setting the
    // same 4× corpus is already ~2.9× per-row denser (the quadratic
    // n²/2^bits bucket term the auto knob exists to fence).
    def cand(nv: Long, bits: Int): Long = {
      val emb = Synthetic.embeddings(spark, nv, nLabels = (nv / 100).toInt)
      Similarity.lshBucketsMulti(emb, bits, 2)
        .as("x").join(Similarity.lshBucketsMulti(emb, bits, 2).as("y"),
          Seq("tbl", "bucket"))
        .filter(col("x.vec_id") < col("y.vec_id")).count()
    }
    val auto1 = cand(1000, Similarity.autoLshBits(1000, 64))
    val auto4 = cand(4000, Similarity.autoLshBits(4000, 64))
    assert(auto1 == 129407L && auto4 == 437509L,
      s"md5-deterministic candidate counts moved: $auto1 / $auto4")
    assert(auto4 <= 4 * auto1, "auto-bits candidates grew superlinearly")
    val fixed4 = cand(4000, 4)
    assert(fixed4 > 2 * auto4,
      s"fixed 4-bit candidates should exceed auto at 4x: $fixed4 vs $auto4")
  }

  test("autoDocFreqCap keeps the admitted posting fan-out linear (√N contract)") {
    // cap(N)² / N is the constant c² above the floor — the per-shingle
    // worst-case candidate fan-out per corpus row
    val capA = Dedup.autoDocFreqCap(1000000L)
    val capB = Dedup.autoDocFreqCap(100000000L)
    assert(capA == 4000 && capB == 40000,
      s"ceil(4·√N) expected: got $capA / $capB")
    assert(capA.toLong * capA / 1000000L == capB.toLong * capB / 100000000L)
    // and the floor keeps every gated fixture uncapped
    assert(Dedup.autoDocFreqCap(5000L) == 1000)
  }

  test("df cap binds on a hot-shingle corpus: capped linear, uncapped quadratic") {
    // single (lang, source) group, every doc opens with the same
    // sentence: boilerplate shingle df = nDocs, the regime the cap is
    // for. Unique tails share nothing, so capped candidates come only
    // from sub-cap shingles (the boilerplate/tail boundary grams,
    // df = 1 each) while uncapped candidates are all-pairs.
    def hotCorpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit(Synthetic.boilerplate + " "), expr(
        "concat_ws(' ', transform(sequence(0, 9), i -> substring(md5(concat(id, '_', i)), 1, 8)))")).as("text"),
      lit("en").as("lang"), lit("s0").as("source"),
      lit(0L).as("n_chars"))
    def invertedCount(n: Long, cap: Int): Long =
      Dedup.candidateDiagnostics(hotCorpus(n), 3, 8, 4, maxDocFreq = cap)
        .collect().find(_.getString(0) == "inverted_capped").get.getLong(3)
    val n = 120L
    val uncapped = invertedCount(n, Int.MaxValue)
    assert(uncapped == n * (n - 1) / 2,
      s"uncapped hot corpus must be all-pairs: $uncapped")
    val capped1 = invertedCount(n, 8)
    val capped4 = invertedCount(n * GROW, 8)
    assert(capped4 <= GROW * math.max(capped1, 1L) * 3 / 2,
      s"capped candidates must stay ~linear: $capped1 -> $capped4")
    assert(capped4 < (n * GROW) * (n * GROW - 1) / 8,
      s"cap failed to bind: $capped4 candidates on ${n * GROW} docs")
  }

  test("simhash64NearDupPairsWide equals simhash64NearDupPairs (same verified pairs)") {
    val docs = Synthetic.documents(spark, 300)
    val plain = Dedup.simhash64NearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wide = Dedup.simhash64NearDupPairsWide(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain.nonEmpty, "planted corpus must contain simhash near-dups")
    assert(wide == plain,
      s"blocking must not change the verified pair set: ${wide.size} vs ${plain.size}")
  }

  test("simhashProbePairs equals brute-force batch×corpus pairs (incremental form)") {
    val docs = Synthetic.documents(spark, 200)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val probe = Dedup.simhashProbePairs(corpus, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bs = Dedup.simhash64(batch).select(col("doc_id").as("batch_doc"),
      col("simhash64").as("bh"))
    val cs = Dedup.simhash64(corpus).select(col("doc_id").as("corpus_doc"),
      col("simhash64").as("ch"))
    val brute = bs.crossJoin(cs)
      .withColumn("hamming", Dedup.hamming(col("bh"), col("ch")).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("batch_doc"), col("corpus_doc"), col("hamming")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe.nonEmpty, "planted dup triples must cross the batch split")
    assert(probe == brute,
      s"banded probe must equal brute force: ${probe.size} vs ${brute.size}")
  }

  test("combi banding rejects configs that void the pigeonhole guarantee") {
    val sh = Dedup.simhash64(Synthetic.documents(spark, 20))
    intercept[IllegalArgumentException] {
      Dedup.simhashBandPairsCombi(sh, "simhash64", 64, 8, 6, 3) // 3 > 8-6
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashBandPairsCombi(sh, "simhash64", 64, 7, 5, 2) // 7 ∤ 64
    }
  }
}
