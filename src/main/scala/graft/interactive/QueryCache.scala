package graft.interactive

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** TTL query-result cache — parity with the reference's 5-minute
  * JS map cache keyed by (query, params)
  * (web/src/utils/databaseOptimization.ts:14-70, cleanup :361-363).
  *
  * Entries hold a Spark-cached DataFrame (`persist`), so a hit re-serves
  * the materialized result without recomputation; eviction unpersists.
  * This is plain engine-facade code, deliberately not Catalyst: Spark's
  * own caching has no TTL and the reference semantics are TTL-based.
  * Thread-safe via synchronization (interactive-dashboard call rates).
  */
class QueryCache(ttlMillis: Long = 5 * 60 * 1000,
                 clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, at: Long)
  private val entries = mutable.LinkedHashMap.empty[String, Entry]

  /** Get the cached frame for `key`, or compute+persist+cache it. */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = synchronized {
    val now = clock()
    entries.get(key) match {
      case Some(e) if now - e.at <= ttlMillis => e.df
      case stale =>
        stale.foreach(_.df.unpersist())
        val df = compute
        df.persist()
        entries.put(key, Entry(df, now))
        df
    }
  }

  def contains(key: String): Boolean = synchronized {
    entries.get(key).exists(e => clock() - e.at <= ttlMillis)
  }

  /** Drop expired entries (the reference's periodic cleanup). */
  def cleanup(): Int = synchronized {
    val now = clock()
    val expired = entries.filter { case (_, e) => now - e.at > ttlMillis }
    expired.foreach { case (k, e) => e.df.unpersist(); entries.remove(k) }
    expired.size
  }

  def invalidateAll(): Unit = synchronized {
    entries.values.foreach(_.df.unpersist())
    entries.clear()
  }

  def size: Int = synchronized(entries.size)
}
