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

  /** Run identity pinned to the CHECKPOINT: a create-if-absent marker
    * inside the checkpoint dir holding a random id, read back on every
    * start. Partition paths embed it (`ingest_batch=<runId>-<batchId>`)
    * so the batchId-keyed overwrite is destructive ONLY toward this
    * run's own partial output:
    *  - restart from the same checkpoint → same marker → same runId →
    *    a replayed epoch overwrites its own partition (exactly-once
    *    preserved);
    *  - checkpoint deleted/relocated while outDir is kept → fresh
    *    marker → NEW runId → the new run's batch 0 lands in a new
    *    partition instead of silently clobbering the old run's
    *    `ingest_batch=0` data (and quarantine) as a bare batchId key
    *    would.
    * The marker is published by full-write-then-rename so its content
    * is complete the instant it becomes visible; a concurrent creator
    * losing the rename race reads the winner's id, and an empty
    * marker is healed, never silently accepted as runId "". */
  private def runId(spark: SparkSession, checkpoint: String): String = {
    val path = new org.apache.hadoop.fs.Path(checkpoint, "graft-run-id")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def readMarker(): Option[String] =
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        val s = try new String(
            org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        Some(s).filter(_.nonEmpty)
      }
    // content-complete-at-visibility: the id is written to a temp file
    // FULLY, then renamed into place — a crash mid-write leaves only
    // an orphan temp, never a half/empty marker silently read back as
    // runId "" (which would collapse two runs into one partition
    // namespace). An empty marker (old-scheme torn write) is treated
    // as ABSENT and healed; losing the rename race just means reading
    // the winner on the next loop. Bounded retries, then fail loudly —
    // never proceed with an unvalidated run identity.
    var attempt = 0
    while (attempt < 10) {
      readMarker() match {
        case Some(id) => return id
        case None =>
          if (fs.exists(path)) fs.delete(path, false) // torn: heal
          val fresh = java.util.UUID.randomUUID().toString.take(8)
          val tmp = new org.apache.hadoop.fs.Path(
            checkpoint, s"graft-run-id.tmp-$fresh")
          val out = fs.create(tmp, true)
          try out.write(fresh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          if (!fs.rename(tmp, path)) fs.delete(tmp, false) // lost the race
      }
      attempt += 1
    }
    sys.error(s"could not establish a run-id marker at $path after 10 attempts")
  }

  /** Watch `inDir` for CSVs of the given schema, apply the batch
    * `transform` to each micro-batch, write parquet under `outDir`.
    * `Trigger.AvailableNow` processes everything currently present and
    * stops — the watcher's "drain what's there" cycle; re-run to pick up
    * newly landed files (already-committed files are skipped).
    *
    * Output is EXACTLY-ONCE for a deterministic `transform` (same
    * mechanism as [[jsonlToParquet]], which strictly beats the
    * reference watcher's at-least-once): each batch overwrites its
    * batchId-deterministic `ingest_batch=<runId>-<batchId>` partition, so
    * a foreachBatch retry replays into the same directory instead of
    * appending duplicates (and a fresh checkpoint can never clobber an
    * older run's partitions — see [[runId]]). */
  def csvToParquet(spark: SparkSession,
                   inDir: String, outDir: String, checkpoint: String,
                   schema: StructType,
                   transform: DataFrame => DataFrame,
                   header: Boolean = true): StreamingQuery = {
    val run = runId(spark, checkpoint)
    val in = spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .csv(inDir)
    in.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = transform(batch)
        if (!out.isEmpty)
          out.write.mode("overwrite").option("compression", "snappy")
            .parquet(s"$outDir/ingest_batch=$run-$batchId")
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
    * partition `ingest_batch=<runId>-<batchId>` in overwrite mode — a
    * crash between
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
    val run = runId(spark, checkpoint)
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
              .text(s"$quarantineDir/ingest_batch=$run-$batchId")
          val out = transform(clean)
          if (!out.isEmpty)
            out.write.mode("overwrite").option("compression", "snappy")
              .parquet(s"$outDir/ingest_batch=$run-$batchId")
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
