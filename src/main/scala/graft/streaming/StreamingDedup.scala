package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Streaming exact deduplication — the incremental form of
  * `Dedup.exactDedupDocs` for a training-data ingest stream: as
  * document batches land, only the FIRST occurrence of each canonical
  * text survives; later duplicates (same digest, any doc_id) are
  * dropped.
  *
  * State design for unbounded streams: the digest store is what grows,
  * so it is bounded by the event-time watermark —
  * `dropDuplicatesWithinWatermark` guarantees suppression of
  * duplicates arriving within the watermark horizon of each other and
  * evicts digests once the watermark passes them. That is the right
  * contract for crawl/ingest dedup at 100 TB: duplicates cluster in
  * time (re-crawls, retry storms), and the full-history exact pass
  * (`exactDedupDocs`) or MinHash-LSH sweep stays a batch job over the
  * landed corpus. Dedup on the 32-char digest, never the text: state
  * stores digests only. */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with an event-time `tsCol`
    * and a `text` column; every other column passes through on the
    * surviving row. */
  def dedupStream(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("fp", md5(Dedup.canonical(col("text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
