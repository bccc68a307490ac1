package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.ExactSubstrOps

/** Streaming benchmark-contamination guard: the train-offline /
  * guard-online split for span-level decontamination (q155's batch
  * semantics attached to an ingest stream). The benchmark's distinct
  * gram keys are built ONCE offline ([[ExactSubstrOps.benchGramKeys]],
  * benchmark-sized, persisted by the caller) and act as the static side
  * of a per-micro-batch LEFT SEMI gram check — the exact verdict, not a
  * sketch, so stream ≡ batch flags by construction (parity spec).
  *
  * Because the benchmark side is STATIC, batch boundaries cannot change
  * any verdict: a document's grams are checked only against the fixed
  * benchmark set, never against other stream rows — no cross-batch
  * state, no watermark, nothing to recover beyond the sink's own
  * idempotence (foreachBatch + parquet append, the [[FileIngest]]
  * discipline). State per micro-batch is the batch itself plus the
  * broadcast-or-shuffled benchmark keys; at 100 TB/day ingest the gram
  * explode is the same map-side shape as the batch q155 pass.
  */
object StreamingContamination {

  /** Flag one micro-batch (exposed for tests and batch parity):
    * delegates to [[ExactSubstrOps.flagContaminated]]. */
  def flagBatch(batch: DataFrame, benchKeys: DataFrame,
                l: Int = 8): DataFrame =
    ExactSubstrOps.flagContaminated(batch, benchKeys,
      col("doc_id"), col("text"), l)

  /** Attach the guard to a streaming `docs` frame (doc_id, text, …):
    * every micro-batch's verdicts are appended to `outDir` as parquet.
    * `benchKeys` must be a BATCH frame (the prebuilt static key set). */
  def start(docs: DataFrame, benchKeys: DataFrame, outDir: String,
            checkpointDir: String, l: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        flagBatch(batch, benchKeys, l)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
