package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for scale probes (`Smoke scale`,
  * `CandidateLinearitySpec`): the driver's testdata tops out at sf0.1
  * (5k docs / 2k vectors), so the 100×-scale claims — candidate-count
  * linearity of the banded dedup families, √N behavior of
  * `Dedup.autoDocFreqCap` — are validated against locally generated
  * corpora with the SAME schemas as `/root/testdata`'s documents /
  * embeddings tables and a planted duplicate structure whose expected
  * pair counts are known by construction.
  *
  * Everything derives from md5 of the row id — fully distributed
  * (`spark.range` + codegen'd expressions, no driver-side loops, no
  * RNG state), so a 10× corpus generates in one pass and the SAME ids
  * always carry the same content (growth measurements are prefix-
  * consistent: the 1× corpus is literally the first tenth of the 10×).
  *
  * Planted structure (documents):
  *  - docs open with a 6-word PER-SOURCE-GROUP boilerplate (hot
  *    shingles with df = nDocs/20 inside their (lang, source) group —
  *    the regime the `autoDocFreqCap` posting-list cap exists for,
  *    binding once nDocs/20 exceeds the cap; per-group rather than
  *    universal, because a corpus-wide boilerplate makes the planted
  *    LSH bucket structure itself quadratic and drowns the linear
  *    planted-pair signal the probe measures);
  *  - id % 20 == 2 → exact duplicate of id-2;
  *  - id % 20 == 1 → near-duplicate of id-1 (one appended token), so
  *    expected near-dup pairs grow LINEARLY in nDocs by construction
  *    (ids 0/1/2 of each 20-block form a planted dup triple);
  *  - remaining ids → ~40 unique pseudo-words (md5-derived).
  *
  * Embeddings: 20 label clusters (centroid from md5(label,d), noise
  * from md5(vec,d)); id % 50 == 1 → exact duplicate of id-1 sharing
  * its label — again a linear planted near-dup population. */
object Synthetic {

  /** A universal hot sentence (df = nDocs when prepended to every doc)
    * for specs that plant the hot-shingle regime deliberately —
    * `documents` itself uses per-group boilerplate, see above. */
  val boilerplate =
    "the quick brown fox jumps over the lazy dog and runs far away today"

  def documents(spark: SparkSession, nDocs: Long): DataFrame =
    spark.range(nDocs)
      .withColumn("base",
        when(col("id") % 20 === 2, col("id") - 2)
          .when(col("id") % 20 === 1, col("id") - 1)
          .otherwise(col("id")))
      .withColumn("boiler", expr(
        "concat_ws(' ', transform(sequence(0, 5), i -> substring(md5(concat('b', base % 20, '_', i)), 1, 8)))"))
      .withColumn("body", expr(
        "concat_ws(' ', transform(sequence(0, 39), i -> substring(md5(concat(base, '_', i)), 1, 8)))"))
      .withColumn("text",
        concat(col("boiler"), lit(" "), col("body"),
          when(col("id") % 20 === 1, lit(" zmutation")).otherwise(lit(""))))
      .select(
        col("id").as("doc_id"),
        col("text"),
        // lang/source derive from BASE so each planted dup triple
        // lands in one (lang, source) group — the grouping the
        // inverted posting-list family blocks on
        element_at(array(lit("en"), lit("fr"), lit("es"), lit("de"), lit("pt")),
          (col("base") % 5 + 1).cast("int")).as("lang"),
        concat(lit("src"), (col("base") % 20).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** Structured binary payloads for the perceptual-hash (aHash) family
    * — the input class the text-derived demo bytes can NOT provide:
    * same-language text shares one byte distribution, so a histogram
    * hash there identifies the language, not the document. Here each
    * doc's 240 bytes are repeated single-byte chunks drawn from a
    * 6-byte per-doc md5 palette with a CONCENTRATED count profile
    * (120/60/24/16/12/8 — a handful of heavy histogram bins, the rest
    * empty, the shape real media has), so the 64-bin aHash sets ~6
    * bits and unrelated docs sit ~12 Hamming apart. Planted structure
    * mirrors `documents`: id%20==1 shares id−1's palette with an
    * 8-byte perturbation chunk (hamming ≤ 2 generically — a re-encode
    * analog); id%20==2 is byte-identical to id−2 (hamming 0 — the
    * exact-dup analog), so each 20-block plants one {0,1,2} triple
    * and the expected pair population is linear in nDocs. Everything is
    * md5-from-id expressions (no RNG, no driver loops), and — the
    * point of the construction — the ORACLE replays the histogram
    * ALGEBRAICALLY from the palette (chunk byte → bin b/4, counts
    * summed per bin, bit iff 64·cnt > 240), never unnesting bytes:
    * the same arithmetic `Multimodal.perceptualHash` runs over the
    * materialized binary. */
  def mediaPayloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"))
      .withColumn("base",
        when(col("id") % 20 === 1, col("id") - 1)
          .when(col("id") % 20 === 2, col("id") - 2)
          .otherwise(col("id")))
      .withColumn("hexstr", expr(
        """concat(
          |  repeat(substring(md5(concat('pal', base, '_', 0)), 1, 2),
          |         CASE WHEN id % 20 = 1 THEN 112 ELSE 120 END),
          |  repeat(substring(md5(concat('pal', base, '_', 1)), 1, 2), 60),
          |  repeat(substring(md5(concat('pal', base, '_', 2)), 1, 2), 24),
          |  repeat(substring(md5(concat('pal', base, '_', 3)), 1, 2), 16),
          |  repeat(substring(md5(concat('pal', base, '_', 4)), 1, 2), 12),
          |  repeat(substring(md5(concat('pal', base, '_', 5)), 1, 2), 8),
          |  CASE WHEN id % 20 = 1
          |       THEN repeat(substring(md5(concat('pal', id, '_x')), 1, 2), 8)
          |       ELSE '' END)""".stripMargin))
      .select(col("id"), unhex(col("hexstr")).as("content"))

  /** Deterministic binary-PPM (P6) payloads: one 8×8 RGB image per
    * document, every pixel's 3 bytes drawn from md5('px' || base ||
    * '_' || p) — REAL format bytes ("P6\n8 8\n255\n" + 192 payload
    * bytes) that `multimodal.PpmDecoder` genuinely parses back. The
    * near-dup planting mirrors `mediaPayloads`: id % 20 == 2 is a
    * byte-identical copy of id−2 (Hamming 0 after decode), id % 20 ==
    * 1 shares id−1's image except pixel 0 (a small corruption — the
    * re-encode/crop class a perceptual hash must survive). The oracle
    * replays the pixels ALGEBRAICALLY from this definition, so the
    * engine-side decode is certified end to end (`q_media_phash_px`). */
  def ppmPayloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"))
      .withColumn("base",
        when(col("id") % 20 === 1, col("id") - 1)
          .when(col("id") % 20 === 2, col("id") - 2)
          .otherwise(col("id")))
      // header "P6\n8 8\n255\n" in hex, then 64 pixels × 6 hex chars
      .withColumn("hexstr", expr(
        """concat('50360a3820380a3235350a',
          |  array_join(transform(sequence(0, 63), p ->
          |    CASE WHEN p = 0 AND id % 20 = 1
          |         THEN substring(md5(concat('px', id, '_alt')), 1, 6)
          |         ELSE substring(md5(concat('px', base, '_', p)), 1, 6)
          |    END), ''))""".stripMargin))
      .select(col("id"), unhex(col("hexstr")).as("content"))

  /** `nLabels` defaults to the sf0.1-shaped 20 clusters; scale probes
    * should grow it WITH nVecs (constant cluster size) — with a fixed
    * label count the intra-cluster near-dup ANSWER is quadratic in
    * nVecs (every same-cluster pair clears a 0.4-cosine threshold:
    * 2k vecs / 20 clusters → 20·C(100,2) ≈ 98k pairs, measured), and
    * an output-bound operator then measures the answer's growth, not
    * its own. */
  def embeddings(spark: SparkSession, nVecs: Long, dims: Int = 64,
                 nLabels: Int = 20): DataFrame =
    spark.range(nVecs)
      .withColumn("base",
        when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id")))
      .withColumn("label", (col("base") % nLabels).cast("int"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dims - 1}), d ->
           |  CAST((CAST(conv(substring(md5(concat(label, 'c', d)), 1, 6), 16, 10) AS BIGINT) % 2001 - 1000) / 1250.0
           |     + (CAST(conv(substring(md5(concat(base, 'n', d)), 1, 6), 16, 10) AS BIGINT) % 2001 - 1000) / 5000.0
           |  AS FLOAT))""".stripMargin))
      .select(col("id").as("vec_id"), col("embedding"), col("label"))
}
