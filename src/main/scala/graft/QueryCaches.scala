package graft

import org.apache.spark.sql.DataFrame

/** Session-scoped registry of the per-query inline caches in
  * [[Queries]]: each query builder pins frames it reuses within its own
  * plan (`pin()`), and the long-running entry points (Bench, Verify)
  * `drain()` between queries so a full multi-query run holds at most one
  * query's caches at a time.
  *
  * This is the [[CachePolicy]] release idiom adapted to the registry's
  * shape: the iterative operators (DedupOps/GraphOps) take a `release`
  * flag per call because their caches are internal; the registry queries
  * instead persist inline, so lifecycle moves to the CALLER boundary —
  * repeated executions of the SAME query (Bench's min-of-N) still reuse
  * one CacheManager entry apiece (plan-keyed dedup), while the 138-query
  * sweep no longer accumulates one live entry per query. Callers that
  * run a single query ad hoc can ignore draining entirely: session stop
  * releases everything.
  */
private[graft] object QueryCaches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** persist() + register for the next [[drain]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    df.persist()
    live += df
    df
  }

  /** Unpersist every tracked frame (non-blocking) and forget them. */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }

  /** Number of currently tracked (not yet drained) frames — spec hook. */
  def trackedCount: Int = synchronized(live.size)

  implicit final class Pinned(private val df: DataFrame) extends AnyVal {
    /** Chained form of [[track]]: `frame.pin()` ≡ persist + register. */
    def pin(): DataFrame = track(df)
  }
}
