package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo map for corpus-derived artifacts (shared
  * frames, fitted models, size probes) — the one shape every family
  * cache in the repo uses, centralized so its two lifecycle bugs are
  * fixed once:
  *
  *  - **Concurrent first callers share ONE build.** Verify runs the
  *    registry on a thread pool, and a bare
  *    `TrieMap.getOrElseUpdate(k, build)` may evaluate `build` in
  *    several losing threads at once — each orphaning a persisted
  *    frame (and, for the k-means fits, paying the duplicate
  *    model-collect) for the session. Values sit behind a per-key
  *    holder whose `lazy val` forces the build under the holder's own
  *    monitor: losers block and read the winner's result.
  *  - **Entries die with the SparkContext.** Memoized DataFrames
  *    strongly reference their SparkSession, so a weak-keyed session
  *    id alone can never release an old session. Every memo registers
  *    a one-time ApplicationEnd listener per session: when the
  *    context stops, that session's entries are dropped from every
  *    memo (no unpersist — the blocks died with the context), letting
  *    the session object itself be collected.
  *
  * Scope caveat (documented contract, not a gap): Spark has no
  * per-`newSession()` close event, so sibling sessions churned on one
  * LIVE context accumulate entries until that context stops. The
  * repo's entry points (Bench, Verify, tests) are one-session-per-
  * context processes, where ApplicationEnd is exactly session end.
  */
private[graft] final class SessionMemo[K, V] {
  import SessionMemo.Holder

  SessionMemo.allMemos.put(this, ())

  private val map = TrieMap[(String, K), Holder[V]]()

  /** The memoized value for (session, key), building (once, even under
    * concurrent first callers) if absent. A THROWING build removes its
    * holder, so the next caller installs (and runs) its OWN thunk —
    * retrying the first caller's captured closure would replay stale
    * captures for memos keyed narrower than the closure (e.g. BpeOps
    * keyed on (cacheKey, rounds) but capturing the caller's frame). */
  def getOrBuild(s: SparkSession, key: K)(build: => V): V = {
    val sid = SessionMemo.sessionHook(s)
    val k = (sid, key)
    val holder = map.getOrElseUpdate(k, new Holder(() => build))
    try holder.value
    catch { case e: Throwable => map.remove(k, holder); throw e }
  }

  private[graft] def evictSession(sid: String): Unit =
    map.keySet.filter(_._1 == sid).foreach(map.remove)

  private[graft] def entryCount: Int = map.size
}

private[graft] object SessionMemo {

  /** Per-key build cell: `lazy val` serializes concurrent forces on
    * the holder's monitor, and a THROWING build leaves the flag unset,
    * so the next caller retries instead of caching the failure. */
  private final class Holder[V](build: () => V) { lazy val value: V = build() }

  /** Every live memo, weak-keyed so a discarded memo map (none today —
    * all are object-level vals) never pins its entries. */
  private val allMemos = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SessionMemo[_, _], Unit]())

  private val hookedSessions = TrieMap[String, Unit]()

  /** Session id for memo keying, installing (once per session) the
    * ApplicationEnd hook that evicts the session's entries from every
    * memo when its SparkContext stops. */
  private def sessionHook(s: SparkSession): String = {
    val sid = CachePolicy.sessionId(s)
    if (hookedSessions.putIfAbsent(sid, ()).isEmpty) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          allMemos.synchronized {
            val it = allMemos.keySet.iterator()
            while (it.hasNext) it.next().evictSession(sid)
          }
          hookedSessions.remove(sid)
        }
      })
    }
    sid
  }
}
