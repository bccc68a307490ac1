package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over an event stream — the engine's A3 hourly
  * profile as a Structured Streaming aggregation.
  *
  * The reference has no streaming analytics (its charts re-query a
  * static table), so this is an extension, built the standard way:
  * event-time window + watermark so state is bounded and late data
  * beyond the watermark is dropped. In append mode a window emits once,
  * when the watermark passes its end — exactly-once results per window
  * downstream. State size is O(open windows × groups), independent of
  * stream length — the property that matters at 100 TB/day.
  */
object StreamingProfiles {

  /** Watermarked time-bucket profile: avg/min/max/count of `valueCol`
    * per (window, group). `granularity` e.g. "1 hour"; `lateness` is the
    * watermark delay bounding both state and allowed lateness. */
  def timeBucketProfile(events: DataFrame, tsCol: String, valueCol: String,
                        granularity: String = "1 hour",
                        lateness: String = "2 hours"): DataFrame = {
    StreamConf.ensureStateStore(events.sparkSession)
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), granularity))
      .agg(
        avg(col(valueCol)).as("avg_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("bucket_start"),
        col("avg_value"), col("min_value"), col("max_value"), col("cnt"))
  }
}
