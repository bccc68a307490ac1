package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stateful stream-stream join: two event streams correlated inside a
  * bounded event-time window (the "purchase within N seconds of its
  * click" shape).
  *
  * Both sides are watermarked and the join condition carries an
  * explicit event-time RANGE — that pair of constraints is what lets
  * Structured Streaming bound the state store: each side buffers only
  * rows younger than (watermark − window), and eviction is continuous.
  * An equality-only stream-stream join would grow state forever; this
  * operator refuses to be written that way.
  *
  * Inner by default. `leftOuter = true` also emits left rows whose
  * match never arrived — emitted only once the watermark proves no
  * match can still come, which is why the outer variant REQUIRES the
  * same watermarks the state bound does.
  */
object StreamingJoin {

  /** Join `left` and `right` on `key`, keeping right rows with
    * event time in [left.ts, left.ts + windowSec]. Column names on the
    * two sides must be disjoint apart from the key; the right event
    * time column is `rightTs`, the left one `leftTs`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, windowSec: Long,
                   lateness: String = "1 hour",
                   leftOuter: Boolean = false): DataFrame = {
    StreamConf.ensureStateStore(left.sparkSession)
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val cond = col(key) === col(s"r_$key") &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSec SECONDS")
    l.join(r.withColumnRenamed(key, s"r_$key"), cond,
        if (leftOuter) "leftOuter" else "inner")
      .drop(s"r_$key")
  }
}
