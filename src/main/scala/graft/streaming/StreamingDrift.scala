package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ext.TextOps

/** Streaming distribution-drift monitor: the online counterpart of the
  * q161 per-source drift report. A REFERENCE unigram distribution is
  * built once offline ([[referenceCounts]], corpus-sized work, persisted
  * by the caller); each micro-batch then gets ONE drift row — its
  * total-variation distance from the reference, its novel-term count,
  * and its token mass — the ingest-time alarm that a source changed
  * character before it pollutes a training mixture.
  *
  * Exactness discipline is q161's: per-term |p_batch − p_ref| is floored
  * at 1e-12 fixed point (identical IEEE ops in any engine) and summed as
  * LONGS, so the TV value is independent of partitioning and summation
  * order. For two distributions the complete term universe is just the
  * FULL OUTER join of batch terms with reference terms — no grid fanout.
  *
  * The reference is STATIC, so micro-batch boundaries change only the
  * batch-window granularity of the report, never any per-batch value —
  * no cross-batch state, no watermark; foreachBatch + parquet append is
  * the [[FileIngest]] idempotence discipline.
  */
object StreamingDrift {

  /** Reference unigram counts (w, c) — built offline from the corpus the
    * stream is supposed to look like; persist before attaching. */
  def referenceCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** One drift row for a (micro-)batch vs the static reference:
    * (batch_tokens, batch_terms, novel_terms, tv_fp). An empty batch
    * reports zeros (nothing arrived — not drift). */
  def driftBatch(batch: DataFrame, ref: DataFrame, text: Column): DataFrame = {
    val bc = batch.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("k"))
    val j = bc.join(ref, Seq("w"), "full_outer")
      .select(coalesce(col("k"), lit(0L)).as("k"),
        coalesce(col("c"), lit(0L)).as("c"))
    val tot = j.agg(sum("k").as("nb"), sum("c").as("nr"),
      sum(when(col("c") === 0L && col("k") > 0L, 1L).otherwise(0L)).as("novel"),
      sum(when(col("k") > 0L, 1L).otherwise(0L)).as("n_terms"))
    val contrib = when(col("nb") > 0L && col("nr") > 0L,
      floor(abs(col("k").cast(DoubleType) / col("nb").cast(DoubleType)
        - col("c").cast(DoubleType) / col("nr").cast(DoubleType))
        * 1000000000000.0).cast(LongType)).otherwise(0L)
    j.crossJoin(broadcast(tot))
      .select(contrib.as("contrib"), col("nb"), col("nr"),
        col("novel"), col("n_terms"))
      .groupBy("nb", "nr", "novel", "n_terms")
      .agg(sum("contrib").as("tvs"))
      .select(col("nb").as("batch_tokens"), col("n_terms").as("batch_terms"),
        col("novel").as("novel_terms"),
        expr("tvs div 200000000").as("tv_fp"))
  }

  /** Attach the monitor to a streaming `docs` frame: every micro-batch
    * appends its drift row (plus `batch_id`) to `outDir` as parquet. */
  def start(docs: DataFrame, ref: DataFrame, textCol: String,
            outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        driftBatch(batch, ref, col(textCol))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
