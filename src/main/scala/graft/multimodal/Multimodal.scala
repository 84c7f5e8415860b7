package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded-media record: deterministic fake of what a real image/audio
  * decoder would emit. The decode itself is STUBBED (no media libs in
  * this environment); everything around it — schema, batch iteration,
  * partitioning — is the real Spark plumbing. */
final case class MediaFeatures(
    id: Long, modality: String, n_bytes: Long,
    checksum: String, features: Array[Float])

final case class MediaRecord(
    id: Long, modality: String, content: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** Multimodal-column support: image/audio/video as opaque BINARY columns
  * with typed metadata (SURVEY-adjacent scale extension). The pattern at
  * 100 TB: binary payloads stay columnar in parquet, metadata columns
  * drive partition pruning, and decode/feature-extraction runs as
  * batched per-partition work (`mapPartitions`) so a real decoder
  * (JNI/FFI or a Python worker via Arrow batches) amortizes
  * init per partition, not per row.
  *
  * DECODE IS A DETERMINISTIC FAKE here (byte-histogram "features");
  * swap `decodeBytes` for a real codec binding in production.
  */
object Multimodal {

  /** Demo source: wrap documents' text bytes as a binary "media"
    * column with metadata — exercises the exact schema a real media
    * table would have. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /** The STUB decoder: deterministic per-byte fold standing in for a
    * real image/audio decode. Returns a 8-bin byte histogram as the
    * "feature vector". */
  private[multimodal] def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >> 5) += 1f
      i += 1
    }
    if (bytes.nonEmpty) {
      var j = 0
      while (j < 8) { bins(j) /= bytes.length.toFloat; j += 1 }
    }
    bins
  }

  /** Batched decode + feature extraction via mapPartitions: the decoder
    * "session" (a real codec would be expensive to init) is created once
    * per partition and streamed over rows. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map { case (id, modality, content) =>
          MediaFeatures(id, modality, content.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(content).map("%02x".format(_)).mkString,
            decodeBytes(content))
        }
      }
  }

  /** Frame sampling for "video" payloads: every k-th fixed-size byte
    * window as one frame row (the explode pattern a real frame sampler
    * uses; pure column work, no UDF). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("n_frames",
        floor(length(col("content")) / lit(frameBytes)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyK))))
      .select(col("id"), col("frame_idx"),
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))

  /** Per-frame video dedup (oracle-gated): two videos near-duplicate
    * when they share >= `minShared` DISTINCT frame contents — the
    * shared-scene detection a video pipeline runs off its frame
    * sampler. Frames come from `sampleFrames` (every `everyK`-th
    * `frameBytes` window; short tail windows excluded so both engines
    * see identical frame sets), digest to md5 (16 bytes however large
    * the real frame is — the join never carries frame payloads), and
    * build a frame-digest INVERTED INDEX: (digest, id) distinct rows,
    * hot digests capped at `autoDocFreqCap(n)` for n distinct videos
    * (a black frame shared by half the corpus would otherwise square
    * the self-join — the n-gram posting-list discipline verbatim; the
    * cap is ENGINE-side only and never binds at the gated scales,
    * floor 1000, so the uncapped oracle replays exactly — past the
    * point where it starts binding the engine intentionally diverges
    * from the uncapped semantics, with a runtime warn).
    * Pair generation is the capped posting self-join —
    * never all-pairs — and `n_shared` counts distinct shared
    * contents, so a frame repeated WITHIN one video counts once.
    * Returns (id_a, id_b, n_shared >= minShared). */
  def frameDedupPairs(media: DataFrame, frameBytes: Int = 16,
                      everyK: Int = 2, minShared: Long = 2,
                      maxFrameDf: Int = 0): DataFrame = {
    val frames = sampleFrames(media, frameBytes, everyK)
      .filter(length(col("frame")) === frameBytes)
      .select(col("id"), md5(col("frame")).as("fd"))
      .distinct()
      .localCheckpoint()
    val cap =
      if (maxFrameDf > 0) maxFrameDf.toLong
      else graft.functions.Dedup.autoDocFreqCap(
        frames.select(col("id")).distinct().count()).toLong
    val cold = frames.join(
      frames.groupBy(col("fd")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= cap).select(col("fd")),
      Seq("fd"), "left_semi")
    cold.select(col("fd"), col("id").as("id_a"))
      .join(cold.select(col("fd"), col("id").as("id_b")), Seq("fd"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Portable metadata projection (oracle-gated): byte length + md5 of
    * the payload — the checks any media pipeline runs before decode. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("id"), col("modality"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"))

  /** Perceptual hash (aHash analog) over the decode stub: a 64-bin byte
    * histogram per payload, bit j set iff bin j's mass exceeds the mean
    * bin mass. Near-identical payloads (re-encodes, small corruptions)
    * produce near-identical histograms and therefore small Hamming
    * distance — the property a real pHash gives for images. Runs in
    * the same batched `mapPartitions` shape as `extractFeatures` (a
    * real implementation swaps the histogram for DCT-of-decoded-pixels;
    * the banding join downstream is unchanged). */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val bins = new Array[Long](64)
          var i = 0
          while (i < bytes.length) { bins((bytes(i) & 0xff) >> 2) += 1L; i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else bytes.length / 64.0
          var h = 0L
          var j = 0
          while (j < 64) { if (bins(j) > mean) h |= (1L << j); j += 1 }
          (id, h)
        }
      }.toDF("id", "phash")
  }

  /** Perceptual hash over REAL DECODED PIXELS (r16): payloads decode
    * through the `ImageDecoder` seam (default `PpmDecoder` — a genuine
    * binary NetPBM parse, no stub), lumas fold into the 8×8 block
    * aHash: bit j set iff 64 · (block-j luma sum) > (total luma sum) —
    * all integer, so the hash is engine-portable and the gate
    * (`q_media_phash_px`) replays it ALGEBRAICALLY from the synthetic
    * generator's pixel definition: if this parse mis-reads one byte,
    * the hash diverges and the gate fails. Undecodable payloads are
    * DROPPED (decode failure must not poison the batch — route them
    * via `mediaMeta` triage in production). Same batched
    * `mapPartitions` shape as `extractFeatures`; dims must be
    * multiples of 8 so the 64 blocks are equal-sized and the
    * integer comparison is exact. */
  def perceptualHashPixels(media: DataFrame,
                           decoder: ImageDecoder = PpmDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder "session" (trait instance is shared)
        rows.flatMap { case (id, bytes) =>
          decoder.decode(bytes).collect {
            case (w, h, lum) if w % 8 == 0 && h % 8 == 0 =>
              val cells = new Array[Long](64)
              var p = 0
              var total = 0L
              while (p < lum.length) {
                val x = p % w
                val y = p / w
                cells((y * 8 / h) * 8 + (x * 8 / w)) += lum(p)
                total += lum(p)
                p += 1
              }
              var hsh = 0L
              var j = 0
              while (j < 64) {
                if (64L * cells(j) > total) hsh |= (1L << j)
                j += 1
              }
              (id, hsh)
          }
        }
      }.toDF("id", "phash")
  }

  /** Media near-dup pairs over the DECODED-pixel hash — the
    * `mediaNearDupPairs` banding applied to `perceptualHashPixels`
    * (same pigeonhole recall-1.0 plan; the only change is that the
    * 64 bits now come from actual pixels through a real parse). */
  def mediaNearDupPairsPixels(media: DataFrame, maxHamming: Int = 3,
                              decoder: ImageDecoder = PpmDecoder): DataFrame =
    graft.functions.Dedup.simhashBandPairs(
        perceptualHashPixels(media, decoder)
          .select(col("id").as("doc_id"), col("phash")),
        "phash", 64, 4, maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))

  /** 64-bit content fingerprint, computed IN the batched decoder: a
    * Charikar SimHash over the payload's sliding 4-byte windows, each
    * window hashed as md5 of its UPPERCASE-hex string (the exact token
    * `substring(hex(content), (i-1)*2+1, 8)` yields in any engine —
    * that portability is what upgrades this family from spec-only to
    * oracle-gated). Bit-vote convention mirrors `Dedup.simhash64`:
    * vote bit j (j<32) reads the top bit of md5 hex nibble j+1, bit
    * j>=32 reads bit 1 of nibble j-31 — so the DuckDB replay is the
    * same vote SQL as the text family's. Unlike `perceptualHash`'s
    * byte HISTOGRAM (position-blind, degenerate on same-alphabet
    * payloads), window hashing keys on local byte SEQUENCES, so the
    * fingerprint discriminates documents the way text simhash does —
    * while still colliding for re-encodes that perturb a few windows.
    * Payloads under 4 bytes have no windows and must be pre-filtered
    * (fingerprintDedup does); runs in the same per-partition batched
    * shape as `extractFeatures` (one MessageDigest per partition). */
  def contentFingerprint64(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val HEX = "0123456789ABCDEF"
    media.select(col("id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val votes = new Array[Int](64)
          var i = 0
          while (i + 4 <= bytes.length) {
            val sb = new java.lang.StringBuilder(8)
            var p = 0
            while (p < 4) {
              val b = bytes(i + p) & 0xff
              sb.append(HEX.charAt(b >> 4)).append(HEX.charAt(b & 0xf))
              p += 1
            }
            md.reset()
            val h = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            var j = 0
            while (j < 64) {
              val n = j % 32 // hex nibble index; high nibble of byte n/2 when n even
              val nib = if (n % 2 == 0) (h(n / 2) >> 4) & 0xf else h(n / 2) & 0xf
              val bit = if (j < 32) (nib >> 3) & 1 else (nib >> 1) & 1
              votes(j) += (if (bit == 1) 1 else -1)
              j += 1
            }
            i += 1
          }
          var fp = 0L
          var j = 0
          while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
          (id, fp)
        }
      }.toDF("id", "fp64")
  }

  /** Content-level dedup for binary payloads (oracle-gated): banded
    * Hamming join over `contentFingerprint64` — the text simhash
    * pigeonhole plan (maxHamming < bands ⟹ recall 1.0, per-bucket
    * equi-joins, never all-pairs) applied to media — with an exactness
    * flag marking byte-identical payloads (md5 equality) among the
    * near-dup pairs. Blocking-independent by the recall-1.0 guarantee,
    * so DuckDB gates it by brute-force replay of the fingerprint.
    * Returns (id_a, id_b, hamming, is_exact 0/1). */
  /** The raw fingerprint pair frame (id_a, id_b, hamming), memoized
    * per (session, media plan, maxHamming) — the window-SimHash pass
    * re-digests every 4-byte window of every payload (the family's CPU
    * term), and `fingerprintDedup` (the gated exactness report) and
    * `crossModalDedup` both derive this SAME frame, so it is computed
    * once per corpus (the `minhash_pairs` discipline). `crossModalDedup` reads
    * it directly: it discards the exactness flag, so routing it
    * through `fingerprintDedup` would pay the pair-bounded payload
    * digest scan for columns it never uses. */
  private[graft] def fingerprintPairs(media: DataFrame,
                                      maxHamming: Int): DataFrame = {
    val m = media.filter(length(col("content")) >= 4)
    graft.functions.IndexMemo("fp_pairs", m, maxHamming) {
      graft.functions.Dedup.simhashBandPairs(
          contentFingerprint64(m).select(col("id").as("doc_id"), col("fp64")),
          "fp64", 64, 4, maxHamming)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
        .localCheckpoint()
    }
  }

  def fingerprintDedup(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val m = media.filter(length(col("content")) >= 4)
    val pairs = fingerprintPairs(media, maxHamming)
    // The exactness flag needs payload digests only for docs that
    // PAIRED — semi-filter the corpus to pair ids by broadcast (the
    // exactRerank pattern), so the enrich joins broadcast pair-bounded
    // digest rows and the payload scan never shuffles.
    val ids = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sums = m.join(broadcast(ids), Seq("id"), "left_semi")
      .select(col("id"), md5(col("content")).as("_c"))
      .localCheckpoint()
    pairs
      .join(broadcast(sums.select(col("id").as("id_a"), col("_c").as("_ca"))), Seq("id_a"))
      .join(broadcast(sums.select(col("id").as("id_b"), col("_c").as("_cb"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        when(col("_ca") === col("_cb"), lit(1L)).otherwise(lit(0L)).as("is_exact"))
  }

  /** Media near-duplicate pairs: banded Hamming join over the 64-bit
    * perceptual hash — the SAME pigeonhole plan as the text simhash
    * family (`Dedup.simhashBandPairs`: maxHamming < bands ⟹ recall 1.0
    * by construction, per-bucket equi-joins, never all-pairs), so the
    * shape that survives 100 TB of text survives 100 TB of media too.
    * Oracle-gated as `q_media_phash` (r13) over
    * `Synthetic.mediaPayloads` — structured palette-repeat payloads
    * whose byte histogram the oracle replays ALGEBRAICALLY from the
    * palette counts, then brute-forces Hamming pairs. The gate runs on
    * synthetic payloads BY NECESSITY: text-derived demo bytes share
    * one language-level byte distribution, so an aHash there
    * identifies the LANGUAGE, not the document (every pair collides —
    * a degenerate input, not an operator property); the spec
    * additionally drives re-encode/corruption semantics on
    * concentrated distributions. */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.functions.Dedup.simhashBandPairs(
        perceptualHash(media).select(col("id").as("doc_id"), col("phash")),
        "phash", 64, 4, maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))

  /** Cross-modal dedup APPLY (oracle-gated): ONE duplicate graph over
    * BOTH channels of a multimodal corpus — text edges (exact
    * normalized-text + MinHash-LSH near-dup, `Dedup.dupPairs`) unioned
    * with binary-payload edges (banded window-SimHash within
    * `maxHamming`, `fingerprintDedup`) — then the standard connected-
    * components → keep-the-minimum-id survivor rule. A document is a
    * duplicate when EITHER channel matches, and transitive chains may
    * cross channels (A≈B by text, B≈C by payload ⟹ one cluster): the
    * containment a per-channel dedup cannot express, and the rule a
    * production multimodal corpus needs (caption edits hide payload
    * dups; payload re-encodes hide text dups). `media` rows join the
    * graph by `id` == `docs.doc_id` (the attached-payload contract of
    * `fromDocuments`). Scale shape: both edge sources are the already-
    * gated banded/blocked generators (never all-pairs) and both are
    * pair-frame-slim; the union CC runs on edge-count-sized frames and
    * the corpus itself only anti-joins the loser ids — exactly
    * `dedupCorpus`'s cost plus the media banding pass. */
  /** The media channel's CC labels, memoized on the (already-memoized)
    * fingerprint pair frame — shared by `crossModalDedup`'s union
    * closure and `crossModalSavings`' payload-only loser class. */
  private def mediaComponents(mediaEdges: DataFrame): DataFrame =
    graft.functions.IndexMemo("mcc", mediaEdges, ()) {
      // connectedComponents output is already a flat materialized
      // checkpoint (stats-severed) — see Dedup.flatCheckpoint.
      graft.functions.Dedup.connectedComponents(mediaEdges)
    }

  def crossModalDedup(docs: DataFrame, media: DataFrame, n: Int, k: Int,
                      bands: Int, minJaccard: Double,
                      maxHamming: Int = 3): DataFrame = {
    // The raw memoized pair frame, not fingerprintDedup: the exactness
    // flag is discarded here, so its pair-bounded payload digest scan
    // would be pure waste on this path.
    val mediaEdges = fingerprintPairs(media, maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // Union closure via the MERGE law (Dedup.mergeComponents): the
    // per-channel fixpoints are the suite-shared memos (`componentsFor`
    // — every text dedup-apply query — and `mediaComponents` — the
    // savings ledger), and the union is a cluster-label-sized
    // contraction, NOT a third pointer-jumping run over raw edges —
    // at 100 TB adding a modality costs a fixpoint over cluster labels.
    // Memoized on the union-EDGES plan (the `componentsFor`
    // discipline): both memoized pair frames resolve to the same
    // checkpointed instances in-session, so `sameResult` holds and
    // `crossModalSavings` hits the same entry.
    val textEdges = graft.functions.Dedup.dupPairs(docs, n, k, bands, minJaccard)
      .select(col("doc_a"), col("doc_b"))
    val edges = textEdges.union(mediaEdges)
    val losers = graft.functions.IndexMemo("xcc", edges, ()) {
        // The two channel labelings are independent until the merge —
        // build them CONCURRENTLY (the annRecall discipline: each is a
        // deterministic memoized fixpoint; IndexMemo's per-key locks
        // let distinct index builds proceed in parallel while racing
        // builds of the same one serialize once). Results awaited
        // before the merge, so the labeling is order-independent.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContextExecutorService =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val (textCC, mediaCC) = try {
          val ft = Future {
            graft.functions.Dedup.componentsFor(docs, n, k, bands, minJaccard)
          }
          val fm = Future { mediaComponents(mediaEdges) }
          (Await.result(ft, Duration.Inf), Await.result(fm, Duration.Inf))
        } finally pool.shutdown()
        graft.functions.Dedup.flatCheckpoint(
          graft.functions.Dedup.mergeComponents(textCC, mediaCC))
      }
      .filter(col("label") < col("id"))
      .select(col("id").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Cross-modal governance ledger (oracle-gated): per `by`-group, the
    * attrition of the cross-modal closure DECOMPOSED BY CHANNEL — the
    * answer to "what did the second modality buy?" that the text-only
    * `Dedup.dedupAttrition` cannot give. Per group it reports docs/chars
    * in and kept plus three disjoint loser classes:
    * `lost_text_*` (the text-only closure already removes it),
    * `lost_payload_*` (text keeps it, the payload-only closure removes
    * it), and `lost_cross_*` (NEITHER single channel removes it — it
    * falls only to a chain that crosses channels, the transitive
    * containment `crossModalDedup` exists for). The classes partition
    * the union losers exactly: a union component is a superset of each
    * single-channel component, so its min label can only be ≤ — a
    * single-channel loser is always a union loser, and
    * docs_kept = docs_in − (lost_text + lost_payload + lost_cross) by
    * construction (the reconcile spec pins it). Cost discipline: all
    * three closures ride memoized fixpoints — the text CC is
    * `componentsFor`'s (shared with every dedup-apply query), the union
    * CC is `crossModalDedup`'s `xcc`, and the payload CC memoizes here
    * on the (already-memoized) fingerprint pair frame — so alongside
    * the apply queries this ledger costs three loser-flag left joins
    * (each dup-cluster-sized, a vanishing corpus fraction) and one
    * group-sized aggregate. */
  def crossModalSavings(docs: DataFrame, media: DataFrame, n: Int, k: Int,
                        bands: Int, minJaccard: Double,
                        maxHamming: Int = 3,
                        by: String = "source"): DataFrame = {
    val textCC = graft.functions.Dedup
      .componentsFor(docs, n, k, bands, minJaccard)
    val textLosers = textCC
      .filter(col("label") < col("id"))
      .select(col("id").as("doc_id"), lit(1L).as("_lt"))
    val mediaEdges = fingerprintPairs(media, maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val mediaCC = mediaComponents(mediaEdges)
    val mediaLosers = mediaCC
      .filter(col("label") < col("id"))
      .select(col("id").as("doc_id"), lit(1L).as("_lm"))
    // Same memo key (the union-edges plan) and same merge-law body as
    // `crossModalDedup` — whichever runs first trains it.
    val textEdges = graft.functions.Dedup.dupPairs(docs, n, k, bands, minJaccard)
      .select(col("doc_a"), col("doc_b"))
    val edges = textEdges.union(mediaEdges)
    val unionLosers = graft.functions.IndexMemo("xcc", edges, ()) {
        graft.functions.Dedup.flatCheckpoint(
          graft.functions.Dedup.mergeComponents(textCC, mediaCC))
      }
      .filter(col("label") < col("id"))
      .select(col("id").as("doc_id"), lit(1L).as("_lu"))
    val lost = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val lostChars = (c: Column) => sum(when(c, col("n_chars")).otherwise(lit(0L)))
    val isText = col("_lt").isNotNull
    val isPayload = col("_lt").isNull && col("_lm").isNotNull
    val isCross = col("_lu").isNotNull && col("_lt").isNull && col("_lm").isNull
    docs
      .join(textLosers, Seq("doc_id"), "left")
      .join(mediaLosers, Seq("doc_id"), "left")
      .join(unionLosers, Seq("doc_id"), "left")
      .groupBy(col(by))
      .agg(
        count(lit(1)).as("docs_in"),
        lost(col("_lu").isNull).as("docs_kept"),
        lost(isText).as("lost_text_docs"),
        lost(isPayload).as("lost_payload_docs"),
        lost(isCross).as("lost_cross_docs"),
        sum(col("n_chars")).as("chars_in"),
        lostChars(col("_lu").isNull).as("chars_kept"),
        lostChars(isText).as("lost_text_chars"),
        lostChars(isPayload).as("lost_payload_chars"),
        lostChars(isCross).as("lost_cross_chars"))
  }
}
