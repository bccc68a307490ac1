package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming file ingest — the Structured Streaming replacement for the
  * reference's watchdog directory watcher (S11,
  * data-pipeline/.../watchers/file_watcher.py:39-113).
  *
  * The reference polls for created files, waits for a stable size, and
  * retries 3×, running the batch ETL pipeline per file (at-least-once).
  * Here the file source's checkpointed commit log tracks which files
  * were ingested (no stability polling), and each micro-batch runs the
  * SAME batch transformer via `foreachBatch` — faithful to the
  * reference's batch-per-file model (SURVEY §7.4.8: don't invent
  * event-time semantics the reference lacks). `foreachBatch` output is
  * at-least-once on retry, exactly matching the watcher's guarantee.
  */
object FileIngest {

  /** Watch `inDir` for CSVs of the given schema, apply the batch
    * `transform` to each micro-batch, append parquet to `outDir`.
    * `Trigger.AvailableNow` processes everything currently present and
    * stops — the watcher's "drain what's there" cycle; re-run to pick up
    * newly landed files (already-committed files are skipped). */
  def csvToParquet(spark: SparkSession,
                   inDir: String, outDir: String, checkpoint: String,
                   schema: StructType,
                   transform: DataFrame => DataFrame,
                   header: Boolean = true): StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .csv(inDir)
    in.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = transform(batch)
        if (!out.isEmpty)
          out.write.mode("append").option("compression", "snappy").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watch `inDir` for JSONL files (one JSON doc per line), apply the
    * batch `transform` per micro-batch, append parquet to `outDir` —
    * [[csvToParquet]] for the format LLM corpora actually land in.
    * Lines that fail to parse against `schema` append verbatim to
    * `quarantineDir` instead of vanishing (the
    * [[graft.etl.RawReaders.jsonlQuarantined]] contract, applied per
    * micro-batch): the ingest never drops input silently, and the bad
    * lines stay replayable after a schema fix. */
  def jsonlToParquet(spark: SparkSession,
                     inDir: String, outDir: String, quarantineDir: String,
                     checkpoint: String, schema: StructType,
                     transform: DataFrame => DataFrame): StreamingQuery = {
    val in = spark.readStream.text(inDir)
    in.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persisted for the 4 actions below (two emptiness probes + two
        // writes): the raw lines read from disk ONCE per micro-batch;
        // re-parsing cached text per action is cheap, re-reading N
        // JSONL files four times is not
        val cached = batch.persist()
        try {
          val (clean, bad) = graft.etl.RawReaders.parseJsonl(cached, schema)
          if (!bad.isEmpty)
            bad.write.mode("append").text(quarantineDir)
          val out = transform(clean)
          if (!out.isEmpty)
            out.write.mode("append").option("compression", "snappy").parquet(outDir)
        } finally cached.unpersist()
      }
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
