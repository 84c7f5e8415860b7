package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** J1/P5: the reference's conditional upsert of period reports keyed by
  * `(begin_date, end_date)` (/root/reference/transformer.py:30-132):
  * a key miss inserts; a key hit updates ONLY when the incoming report's
  * `total_transactions` is strictly greater than the stored one (the
  * monotone-growth idempotence guard, transformer.py:55-65); otherwise
  * the stored row wins (no-op).
  *
  * Expressed as one full-outer join on the report key — the relational
  * form of MERGE. The incoming side is a per-period aggregate (tiny:
  * one row per date range), so Spark broadcasts it against a large
  * stored table; at 100 TB the stored table is date-partitioned and
  * dynamic partition pruning rewrites only the touched partitions.
  */
object ReportUpsert {

  /** Pure merge: returns the post-upsert table. Both sides must share
    * the schema `(begin_date, end_date, ...payload, total_transactions)`.
    */
  def merge(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("begin_date", "end_date")
    val payload = existing.columns.filterNot(keys.contains).toSeq
    require(payload == incoming.columns.filterNot(keys.contains).toSeq,
      "existing/incoming schemas must match")
    val e = existing.select(col("begin_date"), col("end_date"),
      struct(payload.map(col): _*).as("_e"))
    val i = incoming.select(col("begin_date"), col("end_date"),
      struct(payload.map(col): _*).as("_i"))
    val takeIncoming = col("_e").isNull ||
      (col("_i").isNotNull &&
        col("_i.total_transactions") > col("_e.total_transactions"))
    val winner = when(takeIncoming, col("_i")).otherwise(col("_e"))
    e.join(i, keys, "full_outer")
      .select(col("begin_date") +: col("end_date") +:
        payload.map(p => winner.getField(p).as(p)): _*)
  }

  /** Sink form over a parquet reports directory (the driver corpus has
    * no Delta, so MERGE is read → merge → overwrite; with Delta/Iceberg
    * this is a single transactional MERGE INTO). Reads the current
    * table if present.
    *
    * Crash safety: the staged-write + rename sequence is not atomic,
    * but every intermediate state is recoverable — `recover(dir)` is
    * invoked on entry and restores the invariant (a leftover `_old`
    * backup is re-promoted if the live dir vanished mid-swap; a
    * leftover `_staged` from a crashed write is discarded — the merge
    * simply re-runs). The data itself is never in a partial state:
    * reads only ever see the old complete table or the new one. */
  def mergeInto(dir: String, incoming: DataFrame): Unit = withWriterLock(dir) {
    recover(dir)
    val spark = incoming.sparkSession
    val merged =
      if (Fs.exists(dir)) merge(spark.read.parquet(dir), incoming)
      else incoming
    // Overwrite must not read its own output mid-write: stage to a temp
    // local collect-free checkpoint via a shadow dir swap.
    val tmp = dir + "_staged"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    if (Fs.exists(dir)) {
      val bak = dir + "_old"
      Fs.delete(bak)
      Fs.move(dir, bak)
      Fs.move(tmp, dir)
      Fs.delete(bak)
    } else Fs.move(tmp, dir)
  }

  /** Filesystem layer of the MERGE/OCC sinks — hoisted to the shared
    * `graft.LakeFs` in r18 so `sources.Formats` runs on the same
    * Hadoop `FileSystem`/`FileContext` bridge (r17 built it here for
    * the manifest/CAS/vacuum machinery; see LakeFs for the full
    * contract, including the file:-scheme hard-link CAS). */
  private val Fs = graft.LakeFs

  /** Single-writer contract for the parquet MERGE sinks. The staged-swap
    * (`mergeInto`) and dynamic-partition-overwrite (`mergeIntoPartitioned`)
    * sequences have no cross-process transaction — two concurrent
    * writers on one reports dir could interleave renames or partition
    * overwrites. Writers therefore take an exclusive lock file
    * (`<dir>_lock`, claimed by the atomic rename-no-replace CAS) for
    * the duration of the batch and a concurrent writer fails fast with
    * a clear error instead of corrupting the swap. A crash leaves the
    * lock behind by design — operator intervention (delete the lock
    * after confirming no writer is alive) beats silently stealing a
    * lock that may still be held. With a transactional table format
    * (Delta/Iceberg — unavailable in this environment) the format's
    * own commit protocol replaces this. */
  private def withWriterLock[T](dir: String)(body: => T): T = {
    val lock = dir + "_lock"
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    if (parent != null) Fs.mkdirs(parent.toString)
    val claim = dir + s"_lockclaim_${java.util.UUID.randomUUID()}"
    Fs.writeUtf8(claim, "")
    val won = try Fs.renameNoReplace(claim, lock) finally {
      if (Fs.exists(claim)) Fs.delete(claim)
    }
    if (!won)
      throw new IllegalStateException(
        s"reports MERGE sink at $dir is locked by another writer ($lock exists); " +
          "the sink is single-writer — if no writer is alive, remove the stale lock")
    try body finally Fs.delete(lock)
  }

  /** Restore the `mergeInto` directory invariant after a crash at any
    * point of its swap sequence: promote a stranded `_old` backup when
    * the live dir is missing (crash between the two renames); drop any
    * `_staged` leftovers (incomplete or unswapped write — the batch
    * re-runs idempotently thanks to the monotone-count guard). */
  def recover(dir: String): Unit = {
    if (!Fs.exists(dir) && Fs.exists(dir + "_old")) Fs.move(dir + "_old", dir)
    Fs.delete(dir + "_staged")
  }

  /** Partitioned MERGE sink — the 100 TB shape. The reports table is
    * parquet partitioned by `begin_date`; an incoming batch only ever
    * touches the partitions for its own date keys, so:
    *   1. the existing-side read is partition-PRUNED to the incoming
    *      dates (a handful of directories, not the table);
    *   2. the write uses dynamic partition overwrite, rewriting ONLY
    *      those partitions — untouched history is never read or
    *      rewritten.
    * Contrast `mergeInto`, which rewrites the whole table per batch.
    */
  /** Above this many distinct incoming dates the touched-partition set
    * stops being "metadata-sized": collecting it for an `isin` would
    * build a huge predicate on the driver, so the prune switches to a
    * distributed semi join instead. Report batches are tiny by
    * construction (a handful of periods), so the threshold only guards
    * against malformed/degenerate frames. */
  private[graft] val isinPruneMaxDates = 1000

  def mergeIntoPartitioned(dir: String, incoming: DataFrame): Unit = withWriterLock(dir) {
    val spark = incoming.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val merged =
      if (Fs.exists(dir)) {
        val touchedDf = incoming.select(col("begin_date")).distinct()
        // cap the collect before building it: count first (cheap — the
        // distinct is one shuffle over a batch-sized frame)
        val nDates = touchedDf.count()
        val existingTouched =
          if (nDates <= isinPruneMaxDates) {
            // metadata-sized set: an isin literal prunes PARTITION DIRS
            // at planning time — the existing-side read lists only the
            // touched directories
            val touched = touchedDf.collect().map(_.get(0)).toSeq
            spark.read.parquet(dir)
              .filter(col("begin_date").isin(touched: _*))
          } else
            // degenerate wide-date batch: prune via broadcast semi join
            // (still partition-prunable via dynamic runtime filtering,
            // and never builds a thousands-long driver-side predicate)
            spark.read.parquet(dir)
              .join(broadcast(touchedDf), Seq("begin_date"), "left_semi")
        merge(existingTouched, incoming)
      } else incoming
    // Dynamic mode: Overwrite replaces only the partitions present in
    // `merged` (exactly the touched dates).
    merged.write
      .partitionBy("begin_date")
      .mode(SaveMode.Overwrite)
      .parquet(dir)
  }

  // ------------------------------------------------------------------
  // OPTIMISTIC-CONCURRENCY merge sink (r15) — the multi-writer rung
  // above `withWriterLock`'s fail-fast single-writer contract, and the
  // lakehouse-standard protocol in miniature: stage the merged
  // snapshot, then COMMIT by atomically claiming the next manifest
  // version; a loser detects the conflict at the claim (its read-set —
  // the table version it merged against — is stale), discards its
  // staged data, RE-READS the new snapshot and REPLAYS the merge.
  // The P5 monotone guard lives inside `merge` itself, so it holds
  // under any number of replays (a replayed batch whose counts no
  // longer exceed the stored ones degrades to a no-op — exactly the
  // reference's idempotence rationale, transformer.py:31-40,
  // generalized to concurrent writers).
  //
  // Layout: `<dir>/manifest/v%08d.json` (content: the committed data
  // dir's name) + `<dir>/data/<uuid>/part-*.parquet`. The commit point
  // is ONE filesystem primitive: rename-no-replace of the fully-written
  // tmp manifest onto `v<N+1>.json` (`Fs.renameNoReplace` —
  // FileContext + Rename.NONE, the HDFS LogStore protocol) — the
  // rename fails if the target exists, so exactly one writer claims
  // each version, and readers only ever see fully-written manifests
  // (content is written to tmp BEFORE the publish). Data dirs are
  // immutable once committed — no in-place swap, no recovery dance: a
  // crash leaves at worst an unreferenced staged dir and a tmp
  // manifest, both dropped by `vacuumOcc`. r17: the whole layer runs
  // on the Hadoop FS API (was java.io.File — local-disk only), so the
  // protocol holds on HDFS verbatim; object stores WITHOUT atomic
  // rename-no-replace (raw S3) need a coordination service for the
  // claim, exactly the documented Delta-on-S3 caveat. With
  // Delta/Iceberg the format's own CAS-on-log commit replaces this.
  // ------------------------------------------------------------------

  /** Commit `incoming` into the OCC table at `dir` (creating it if
    * absent), retrying on version conflicts. Returns the committed
    * version. `beforeCommit(attempt)` is a deterministic test seam
    * invoked after staging and before the claim — a spec interleaves a
    * rival writer there to force the conflict path. */
  def mergeIntoOcc(dir: String, incoming: DataFrame, maxRetries: Int = 10,
                   beforeCommit: Int => Unit = _ => ()): Int = {
    val spark = incoming.sparkSession
    val manifestDir = occManifestDir(dir)
    val dataDir = occDataDir(dir)
    Fs.mkdirs(manifestDir); Fs.mkdirs(dataDir)
    var attempt = 0
    while (attempt <= maxRetries) {
      // 1. read-set: the current table version and its snapshot
      val v = occVersion(dir)
      val merged = occSnapshotAt(spark, dir, v)
        .map(merge(_, incoming)).getOrElse(incoming)
      // 2. stage the post-merge snapshot under a fresh immutable dir
      val stagedName = java.util.UUID.randomUUID().toString
      val staged = s"$dataDir/$stagedName"
      merged.write.mode(SaveMode.Overwrite).parquet(staged)
      beforeCommit(attempt)
      // 3. CAS: claim version v+1 by atomic rename-no-replace of the
      // fully-written tmp manifest
      val tmp = s"$manifestDir/manifest_${java.util.UUID.randomUUID()}.tmp"
      Fs.writeUtf8(tmp, stagedName)
      if (Fs.renameNoReplace(tmp, f"$manifestDir/v${v + 1}%08d.json"))
        return v + 1
      // 4. conflict: another writer claimed v+1 — discard the staged
      // data and REPLAY against the new snapshot
      Fs.delete(tmp)
      Fs.delete(staged)
      attempt += 1
    }
    throw new IllegalStateException(
      s"OCC merge at $dir lost $maxRetries consecutive version races — " +
        "writer contention exceeds the retry budget")
  }

  private def occManifestDir(dir: String) = s"$dir/manifest"
  private def occDataDir(dir: String) = s"$dir/data"

  /** Highest committed version of the OCC table (-1 when empty). */
  def occVersion(dir: String): Int =
    Fs.list(occManifestDir(dir))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt)
      .foldLeft(-1)(math.max)

  /** The committed snapshot at version `v` (None when v < 0). A
    * vacuumed-away version FAILS LOUDLY (the pin names the version and
    * the cause) instead of surfacing as a missing-file stack or — the
    * dangerous form — an empty frame a downstream job would happily
    * aggregate to zeros. */
  private def occSnapshotAt(spark: org.apache.spark.sql.SparkSession,
                            dir: String, v: Int): Option[DataFrame] =
    if (v < 0) None
    else {
      val mf = f"${occManifestDir(dir)}/v$v%08d.json"
      if (!Fs.exists(mf)) throw new IllegalStateException(
        s"OCC version $v of $dir is gone (vacuumed past keepVersions, or never " +
          "committed) — pinned readers must re-resolve to a live version")
      val name = Fs.readUtf8(mf)
      val data = s"${occDataDir(dir)}/$name"
      if (!Fs.exists(data)) throw new IllegalStateException(
        s"OCC version $v of $dir references a missing data dir $name — " +
          "the table is corrupted (a vacuum dropped a referenced dir)")
      Some(spark.read.parquet(data))
    }

  /** The current committed snapshot (None for an empty table). */
  def readOcc(spark: org.apache.spark.sql.SparkSession, dir: String): Option[DataFrame] =
    occSnapshotAt(spark, dir, occVersion(dir))

  /** Time-travel read pinned at `v` — the reader a vacuum can strand;
    * it fails with the clean IllegalStateException above, never an
    * empty result. */
  def readOccAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                v: Int): Option[DataFrame] =
    occSnapshotAt(spark, dir, v)

  /** Drop unreferenced staged data dirs and manifest tmp files (crash
    * leftovers). Committed history stays — `keepVersions` of manifest
    * generations and their data dirs are retained (time travel /
    * in-flight readers), older ones removed.
    *
    * SAFE UNDER CONCURRENT WRITERS via the retention age (r16): an
    * in-flight writer's staged-but-uncommitted dir is indistinguishable
    * from a crash leftover BY NAME, but not by age — a live commit's
    * stage→CAS window is seconds, so unreferenced dirs (and manifest
    * tmps) are only deleted once older than `minAgeMs` (default 1 h,
    * the lakehouse VACUUM retention answer). A vacuum interleaved at
    * ANY point of a live commit therefore cannot drop the dir the
    * winning manifest will reference (spec-pinned at every ordering);
    * genuine crash leftovers age past the window and are reclaimed by
    * the next vacuum. `minAgeMs = 0` restores the aggressive
    * stop-the-world behavior (only for a context that QUIESCES
    * writers first). */
  def vacuumOcc(dir: String, keepVersions: Int = 2,
                minAgeMs: Long = 3600L * 1000L): Unit = {
    val now = System.currentTimeMillis()
    def aged(f: org.apache.hadoop.fs.FileStatus): Boolean =
      now - f.getModificationTime >= minAgeMs
    val manifestLs = Fs.list(occManifestDir(dir))
    val versions = manifestLs
      .filter { f =>
        val n = f.getPath.getName; n.startsWith("v") && n.endsWith(".json")
      }
      .sortBy(_.getPath.getName)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val referenced = keep.map(f => Fs.readUtf8(f.getPath.toString)).toSet
    manifestLs
      .filter(f => f.getPath.getName.endsWith(".tmp") && aged(f))
      .foreach(f => Fs.delete(f.getPath.toString))
    drop.foreach(f => Fs.delete(f.getPath.toString))
    Fs.list(occDataDir(dir))
      .filterNot(d => referenced.contains(d.getPath.getName))
      .filter(aged)
      .foreach(d => Fs.delete(d.getPath.toString))
  }

  /** Recursive delete (test/probe helper) — Hadoop FS, same resolution
    * as every other path in this sink. */
  def deleteDir(path: String): Unit = Fs.delete(path)

  /** One report row per txn_date (begin = end = the day): the per-file
    * report analog used to exercise merge semantics on the corpus. */
  def dailyReports(tx: DataFrame, version: String): DataFrame =
    tx.groupBy(col("txn_date"))
      .agg(sum(col("amount").cast("decimal(14,2)")).cast("double").as("total_spent"),
           count(lit(1)).as("total_transactions"))
      .select(col("txn_date").as("begin_date"), col("txn_date").as("end_date"),
              col("total_spent"), lit(version).as("version"),
              col("total_transactions"))
}
