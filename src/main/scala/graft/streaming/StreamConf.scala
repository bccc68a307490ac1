package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session defaults for the stateful streaming operators.
  *
  * The one that matters: the STATE-STORE PROVIDER. Spark's built-in
  * default (`HDFSBackedStateStoreProvider`) loads state by replaying
  * every delta file since the last snapshot, and its maintenance
  * thread (60 s interval) never snapshots inside a short high-rate
  * window — the ops rehearsal measured session_window batch latency
  * growing 2.3 s → 7.5 s over 20 batches while state rows stayed FLAT
  * (`STREAM_REHEARSAL_OPS.json`). RocksDB loads from its own compacted
  * files and stays flat; it is the certified production configuration,
  * so the stateful operators install it as their default instead of
  * leaving the safe choice buried in the rehearsal harness.
  *
  * Override order (first wins):
  *  1. `spark.graft.streaming.stateStoreProvider` — explicit graft-level
  *     choice, always honored (set it to the HDFS provider class to
  *     force the Spark built-in back).
  *  2. A session provider that is already NON-default (a cluster admin
  *     or caller picked a custom store) — left untouched.
  *  3. Otherwise: RocksDB.
  *
  * Called by every stateful transform builder at plan-build time; the
  * conf is read when the streaming query STARTS, so setting it where
  * the plan is assembled is early enough, and a no-op for batch
  * executions of the same transforms.
  */
object StreamConf {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val OverrideKey = "spark.graft.streaming.stateStoreProvider"
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Install the certified state-store default (see object doc) on the
    * session; returns the session for chaining. */
  def ensureStateStore(s: SparkSession): SparkSession = {
    s.conf.getOption(OverrideKey).filter(_.nonEmpty) match {
      case Some(explicit) => s.conf.set(ProviderKey, explicit)
      case None =>
        // getOption yields the registered default when unset, so the
        // only value we replace is the known Spark built-in
        val cur = s.conf.getOption(ProviderKey)
        if (cur.isEmpty || cur.exists(_.endsWith("HDFSBackedStateStoreProvider")))
          s.conf.set(ProviderKey, RocksDb)
    }
    s
  }
}
