package graft.streaming

/** Filesystem introspection for the incremental-ingest stores
  * (docs/sigs/post/dig/labels/fp/digests sub-dirs). Since r18 a thin
  * facade over the package-shared `graft.LakeFs` (same Hadoop conf
  * resolution, same FileSystem API — two parallel FS layers with one
  * contract were a fix-it-twice hazard); this object keeps only the
  * store-layout helpers the ingest sinks read. History: the sinks
  * introspected with `java.io.File`, which on any non-local default
  * FS silently sees an empty store (frontier guard passes, prior
  * labels read empty) while the Spark writes succeed — the r14
  * ADVICE item the Hadoop-API form closed. */
private[graft] object StoreFs {

  def exists(dir: String): Boolean = graft.LakeFs.exists(dir)

  /** Child names of `dir` (empty if it does not exist). One metadata
    * listing — no data read. */
  def listNames(dir: String): Seq[String] =
    graft.LakeFs.list(dir).map(_.getPath.getName)

  /** Highest `<prefix>=<id>` partition id under `dir`, or -1 if none —
    * the landed-batch frontier shared by every ingest sink. */
  def maxPartitionId(dir: String, prefix: String = "batch="): Long =
    listNames(dir)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .foldLeft(-1L)(math.max)
}
