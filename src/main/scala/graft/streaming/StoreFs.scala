package graft.streaming

import org.apache.spark.sql.SparkSession

/** Filesystem introspection for the incremental-ingest stores
  * (docs/sigs/post/dig/labels/fp/digests sub-dirs), on the Hadoop
  * `FileSystem` API so the reads resolve against the SAME filesystem
  * Spark writes to. The ingest sinks previously introspected with
  * `java.io.File`, which on any non-local default FS silently sees an
  * empty store (frontier guard passes, prior labels read empty) while
  * the Spark writes succeed — the r14 ADVICE item this closes. Uses
  * the active session's Hadoop conf when one exists (credentials,
  * defaultFS), falling back to a bare conf for session-less callers. */
private[graft] object StoreFs {

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def exists(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(hadoopConf).exists(p)
  }

  /** Child names of `dir` (empty if it does not exist). One metadata
    * listing — no data read. */
  def listNames(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Highest `<prefix>=<id>` partition id under `dir`, or -1 if none —
    * the landed-batch frontier shared by every ingest sink. */
  def maxPartitionId(dir: String, prefix: String = "batch="): Long =
    listNames(dir)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
      .foldLeft(-1L)(math.max)
}
