package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MGSummary

/** Running frequent-items-per-key over a stream: a Misra–Gries
  * summary ([[graft.functions.FreqSketch]]) held in keyed state.
  * State per key is AT MOST k counters — independent of how many
  * distinct items the key has seen — which is the streaming reason to
  * sketch: exact streaming top-N state grows with the key's item
  * universe (the q59-style token table), the summary never does.
  *
  * The state buffer is the SAME byte format the batch aggregate ships
  * through its shuffle, so the streaming path inherits the batch
  * contract verbatim: `est ≤ true ≤ est + err_bound` at every emitted
  * batch, any item with `true > err_bound` present, and a stream whose
  * per-key item domain fits in k counters (err_bound 0) reproduces the
  * exact batch counts regardless of how the micro-batches split the
  * data — the parity the spec pins, the streaming analogue of the
  * batch spec's partitioning-independence test.
  */
object StreamingHeavyHitters {

  case class KeyHeavyHitter(key: String, item: String, est: Long,
                            err_bound: Long, n_total: Long)

  /** `stream` must expose string columns `keyCol` and `itemCol`.
    * After every batch that touches a key, emits the key's current
    * top-`topN` items (est desc, item asc). */
  def runningHeavyHitters(stream: DataFrame, keyCol: String, itemCol: String,
                          k: Int, topN: Int): Dataset[KeyHeavyHitter] = {
    val spark = StreamConf.ensureStateStore(stream.sparkSession)
    import spark.implicits._
    val pairs = stream
      .select(col(keyCol).cast("string").as("k"),
        col(itemCol).cast("string").as("item"))
      .as[(String, String)]
    def update(key: String, rows: Iterator[(String, String)],
               state: GroupState[Array[Byte]]): Iterator[KeyHeavyHitter] = {
      val mg = state.getOption
        .map(MGSummary.fromBytes(k, _))
        .getOrElse(new MGSummary(k))
      rows.foreach { case (_, item) => mg.add(item) }
      state.update(mg.toBytes)
      mg.sorted.iterator.take(topN).map { case (item, est) =>
        KeyHeavyHitter(key, item, est, mg.errBound, mg.nTotal)
      }
    }
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
