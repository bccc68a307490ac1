package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with custom state — the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` path: the first
  * document seen for each digest is emitted; every later copy (within
  * the batch or in any later micro-batch) is dropped. State per key is
  * one boolean, checkpointed, so the guarantee survives restarts.
  *
  * Scale notes: state is partitioned by digest across the cluster and
  * grows with DISTINCT documents only. For unbounded streams pair with
  * a state TTL (`GroupStateTimeout.ProcessingTimeTimeout` + timeout in
  * the update function) to bound the store — deliberately not defaulted
  * here, because dropping state re-admits duplicates. */
object StreamingDedup {

  case class Doc(digest: String, docId: Long, text: String)

  def firstSeen(key: String, docs: Iterator[Doc],
                state: GroupState[Boolean]): Iterator[Doc] = {
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      docs.take(1)
    }
  }

  /** Dedup a stream of documents by digest. Append-mode output. */
  def dedup(docs: Dataset[Doc]): Dataset[Doc] = {
    StreamConf.ensureStateStore(docs.sparkSession)
    implicit val docEnc = Encoders.product[Doc]
    implicit val boolEnc = Encoders.scalaBoolean
    docs.groupByKey(_.digest)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
  }

  /** Dedup with a processing-time state TTL: a digest's state is
    * dropped after `ttlMs` without new arrivals, bounding the store on
    * unbounded streams. TRADEOFF (why this is not the default): once a
    * digest's state expires, a later copy is re-admitted as "first
    * seen" — TTL turns exact dedup into dedup-within-a-time-horizon.
    * Size `ttlMs` to the window in which duplicates realistically
    * recur; state stays one boolean per LIVE digest.
    *
    * Operational note: run this with a processing-time trigger. With
    * ProcessingTimeTimeout the engine keeps scheduling (empty) batches
    * so timeouts can fire — `Trigger.AvailableNow` never terminates
    * and `processAllAvailable` never settles against such a query. */
  def dedupWithTtl(docs: Dataset[Doc], ttlMs: Long): Dataset[Doc] = {
    StreamConf.ensureStateStore(docs.sparkSession)
    implicit val docEnc = Encoders.product[Doc]
    implicit val boolEnc = Encoders.scalaBoolean
    def firstSeenTtl(key: String, it: Iterator[Doc],
                     state: GroupState[Boolean]): Iterator[Doc] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else if (state.exists) {
        state.setTimeoutDuration(ttlMs) // refresh: duplicates keep it hot
        Iterator.empty
      } else {
        state.update(true)
        state.setTimeoutDuration(ttlMs)
        it.take(1)
      }
    }
    docs.groupByKey(_.digest)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(firstSeenTtl)
  }
}
