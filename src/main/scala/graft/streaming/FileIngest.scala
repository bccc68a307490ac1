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
    * `transform` to each micro-batch, write parquet under `outDir`.
    * `Trigger.AvailableNow` processes everything currently present and
    * stops — the watcher's "drain what's there" cycle; re-run to pick up
    * newly landed files (already-committed files are skipped).
    *
    * Output is EXACTLY-ONCE for a deterministic `transform` (same
    * mechanism as [[jsonlToParquet]], which strictly beats the
    * reference watcher's at-least-once): each batch overwrites its
    * batchId-deterministic `ingest_batch=<id>` partition, so a
    * foreachBatch retry replays into the same directory instead of
    * appending duplicates. */
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = transform(batch)
        if (!out.isEmpty)
          out.write.mode("overwrite").option("compression", "snappy")
            .parquet(s"$outDir/ingest_batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watch `inDir` for JSONL files (one JSON doc per line), apply the
    * batch `transform` per micro-batch, write parquet under `outDir` —
    * [[csvToParquet]] for the format LLM corpora actually land in.
    * Lines that fail to parse against `schema` land verbatim under
    * `quarantineDir` instead of vanishing (the
    * [[graft.etl.RawReaders.jsonlQuarantined]] contract, applied per
    * micro-batch): the ingest never drops input silently, and the bad
    * lines stay replayable after a schema fix.
    *
    * EXACTLY-ONCE output (for a deterministic `transform`): the two
    * per-batch writes are independent and non-atomic, so instead of
    * blind appends each batch writes to the batchId-DETERMINISTIC
    * partition `ingest_batch=<id>` in overwrite mode — a crash between
    * the quarantine and parquet writes, or a foreachBatch retry,
    * replays the same epoch (same checkpointed file list) into the
    * same directories and overwrites its own partial output instead
    * of duplicating it. Readers of `outDir` see a standard
    * partitioned parquet table whose `ingest_batch` column is honest
    * ingest provenance. */
  def jsonlToParquet(spark: SparkSession,
                     inDir: String, outDir: String, quarantineDir: String,
                     checkpoint: String, schema: StructType,
                     transform: DataFrame => DataFrame): StreamingQuery = {
    val in = spark.readStream.text(inDir)
    in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persisted for the 4 actions below (two emptiness probes + two
        // writes): the raw lines read from disk ONCE per micro-batch;
        // re-parsing cached text per action is cheap, re-reading N
        // JSONL files four times is not
        val cached = batch.persist()
        try {
          val (clean, bad) = graft.etl.RawReaders.parseJsonl(cached, schema)
          if (!bad.isEmpty)
            bad.write.mode("overwrite")
              .text(s"$quarantineDir/ingest_batch=$batchId")
          val out = transform(clean)
          if (!out.isEmpty)
            out.write.mode("overwrite").option("compression", "snappy")
              .parquet(s"$outDir/ingest_batch=$batchId")
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
