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
    implicit val docEnc = Encoders.product[Doc]
    implicit val boolEnc = Encoders.scalaBoolean
    docs.groupByKey(_.digest)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
  }
}
