package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Media near-duplicate pairs: banded Hamming join over the 64-bit
    * perceptual hash — the SAME pigeonhole plan as the text simhash
    * family (`Dedup.simhashBandPairs`: maxHamming < bands ⟹ recall 1.0
    * by construction, per-bucket equi-joins, never all-pairs), so the
    * shape that survives 100 TB of text survives 100 TB of media too.
    * Spec-gated (the decode stub is not SQL-expressible); the exact
    * metadata sibling `mediaMeta` carries the oracle gate for this
    * family. NOT exposed as a gate query on the text-derived demo
    * media: same-language text bytes share one byte-distribution
    * fingerprint, so an aHash there identifies the LANGUAGE, not the
    * document (every pair collides — a degenerate input, not an
    * operator property; the spec drives it on realistic concentrated
    * distributions instead). */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.functions.Dedup.simhashBandPairs(
        perceptualHash(media).select(col("id").as("doc_id"), col("phash")),
        "phash", 64, 4, maxHamming)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
}
