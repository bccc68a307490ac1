package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score — the stateful-streaming counterpart of
  * the batch `EventOps.rollingZScore`: each event is scored against the
  * trailing `lookback` values of the SAME key, with the tail carried as
  * per-key state across micro-batches instead of re-sorting a key's
  * full history.
  *
  * State per key is a bounded ring of the last `lookback` fixed-point
  * values (ordered by event time + tiebreak), so the store size is
  * O(active keys × lookback) — independent of stream length. Events
  * inside one micro-batch are sorted by (tss, tie) before scoring, so
  * with in-order micro-batches (arrivals never older than anything
  * already in state — the watermark's job upstream) the emitted scores
  * are IDENTICAL to the batch operator's; the parity spec pins this
  * across a two-micro-batch run.
  *
  * The z-score arithmetic is the same engine-portable formulation as
  * the batch side: exact integer sums of scaled longs, then one
  * explicitly-ordered double formula.
  */
object StreamingAnomaly {

  case class Event(key: Long, tss: Long, tie: Long, value: Double)
  case class Scored(key: Long, tss: Long, tie: Long, value: Double,
                    zscore: Option[Double])
  case class Ring(values: Vector[Long])

  private[streaming] def score(v: Long, ring: Vector[Long],
                               minPrev: Int): Option[Double] = {
    val n = ring.length
    if (n < minPrev) None
    else {
      val s = ring.sum
      val s2 = ring.map(x => x * x).sum
      val nd = n.toDouble
      val mean = s.toDouble / nd
      val variance = (s2.toDouble - s.toDouble * s.toDouble / nd) / (nd - 1.0)
      if (variance > 0) Some((v.toDouble - mean) / math.sqrt(variance))
      else None
    }
  }

  /** Score a stream of events; `scale` matches the batch operator's
    * fixed-point factor. Append-mode output, one row per input event. */
  def rollingZScore(events: Dataset[Event], lookback: Int, minPrev: Int,
                    scale: Long): Dataset[Scored] = {
    StreamConf.ensureStateStore(events.sparkSession)
    implicit val scoredEnc = Encoders.product[Scored]
    implicit val ringEnc = Encoders.product[Ring]
    def update(key: Long, it: Iterator[Event],
               state: GroupState[Ring]): Iterator[Scored] = {
      var ring = state.getOption.map(_.values).getOrElse(Vector.empty)
      val out = it.toVector.sortBy(e => (e.tss, e.tie)).map { e =>
        val v = math.floor(e.value * scale + 0.5).toLong
        val z = score(v, ring, minPrev)
        ring = (ring :+ v).takeRight(lookback)
        Scored(e.key, e.tss, e.tie, e.value, z)
      }
      state.update(Ring(ring))
      out.iterator
    }
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
