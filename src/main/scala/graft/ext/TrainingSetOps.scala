package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-set assembly operators: benchmark decontamination and
  * sequence packing — the steps between "cleaned corpus" and "batches
  * on the trainer".
  *
  * Scale shapes: decontamination is one shingle-explode of the corpus
  * joined against a BROADCAST benchmark shingle set (the benchmark is
  * eval data — thousands of docs, not billions); packing is one window
  * cumsum per shard, shuffling each doc row once on its shard key.
  */
object TrainingSetOps {

  /** Flags corpus documents that share any k-token shingle with the
    * benchmark set (the standard n-gram-collision decontamination
    * test). Returns (doc_id, contaminated). The benchmark side is
    * deduplicated and broadcast; the corpus explodes once and
    * left-semi-joins per shingle, then flags by membership — no row
    * amplification survives the aggregation. */
  def contaminationFlags(corpus: DataFrame, id: Column, text: Column,
                         benchmark: DataFrame, btext: Column,
                         k: Int = 8): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.shingles(btext, k)).as("__sh"))
      .distinct()
    val hits = corpus
      .select(id.as("doc_id"), explode(TextOps.shingles(text, k)).as("__sh"))
      .join(broadcast(benchShingles), Seq("__sh"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    corpus.select(id.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** GPT-style sequence packing plan: concatenate each shard's
    * documents in id order and cut every `budget` tokens. Emits, per
    * document, the first and last training-sequence index it lands in
    * (a document may straddle a cut). One window cumsum per shard —
    * the shard count bounds window-partition size, so no global sort
    * and no single-partition window at corpus scale. */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    budget: Int, shards: Int = 64): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    df.select(id.as("doc_id"),
        pmod(id.cast(LongType), lit(shards.toLong)).as("shard"),
        TextOps.tokenCount(text).cast(LongType).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("seq_first"),
        floor((col("cum") - 1) / budget).as("seq_last"))
  }
}
