package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Streaming file ingest — the Structured Streaming replacement for the
  * reference's watchdog directory watcher (S11,
  * data-pipeline/.../watchers/file_watcher.py:39-113).
  *
  * The reference polls for created files, waits for a stable size, and
  * retries 3×, giving at-least-once per file. Spark's file source +
  * checkpointed commit log gives exactly-once per file with none of that
  * code — a strict improvement (SURVEY §7.4.8). Per the survey, no
  * event-time semantics are invented: `Trigger.AvailableNow` processes
  * whatever has landed, batch-per-file style, then stops.
  */
object FileIngest {

  /** Watch `inDir` for CSVs of the given schema, apply `transform`, and
    * write parquet to `outDir` with exactly-once file tracking. */
  def csvToParquet(spark: SparkSession,
                   inDir: String, outDir: String, checkpoint: String,
                   schema: StructType,
                   transform: DataFrame => DataFrame,
                   header: Boolean = true): StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .csv(inDir)
    transform(in).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run an ingest pass to completion (the watcher's "process what's
    * there" cycle). Returns when all available files are committed. */
  def runOnce(q: StreamingQuery): Unit = {
    q.awaitTermination()
  }
}
