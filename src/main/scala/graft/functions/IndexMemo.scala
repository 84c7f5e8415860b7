package graft.functions

import org.apache.spark.sql.DataFrame

/** Session-scoped memo of derived-index frames keyed on (tag, session,
  * input plan, params) — the in-session form of "compute the
  * signature / pair / bucket / label index ONCE per corpus". At 100 TB
  * these indexes are persisted at ingest (DESIGN.md); in-session, any
  * two operators deriving the same index from the same input plan
  * (`sameResult`) share one localCheckpointed materialization.
  *
  * Entries hold only checkpointed frames that are bounded relative to
  * the corpus (pair graphs, label maps, id+bucket tables); the list is
  * capped, and a plan mismatch or new session just recomputes — the
  * memo is an optimization, never a correctness dependency.
  */
private[functions] object IndexMemo {
  private var entries: List[((String, Any), org.apache.spark.sql.SparkSession,
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)] = Nil

  /** Observable for the sharing specs: total memo hits this JVM. */
  @volatile var hits: Long = 0L

  def apply(tag: String, input: DataFrame, params: Any)
           (compute: => DataFrame): DataFrame = synchronized {
    val sess = input.sparkSession
    val plan = input.queryExecution.analyzed
    val key = (tag, params)
    entries.find { case (k2, s2, p2, _) =>
      k2 == key && (s2 eq sess) && p2.sameResult(plan)
    } match {
      case Some((_, _, _, cached)) =>
        hits += 1
        cached
      case None =>
        val res = compute
        entries = ((key, sess, plan, res) :: entries).take(8)
        res
    }
  }
}
