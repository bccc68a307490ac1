package graft

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle policy shared by the iterative operators
  * (GraphOps, DedupOps): by default their intermediate persists stay
  * registered, because Spark's CacheManager dedups entries by
  * analyzed-plan equality — repeated calls over the SAME input reuse
  * one entry apiece, which is the right trade for bench/batch shapes.
  * A long-lived service calling those operators over CHANGING inputs
  * would instead accumulate one dead entry per distinct input; such
  * callers opt into `release = true`, which materializes the result
  * (localCheckpoint — its blocks are owned by the returned frame and
  * reclaimed by the ContextCleaner when it is garbage collected) and
  * unpersists every intermediate cache the call created.
  */
private[graft] object CachePolicy {

  /** Stable unique id for a SparkSession, for keying per-session memo
    * maps (shared frames, fit models, size probes). Weak-keyed: an old
    * session's entry vanishes with it, and a fresh session can never
    * inherit a stale key — unlike `System.identityHashCode`, whose
    * values can collide after the old session is GC'd and would then
    * serve a frame bound to a stopped SparkContext. */
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())

  def sessionId(s: org.apache.spark.sql.SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  def finish(release: Boolean, caches: Seq[DataFrame])(result: DataFrame): DataFrame =
    if (!release) result
    else {
      val out = result.localCheckpoint(eager = true)
      caches.foreach(_.unpersist(false))
      out
    }
}
