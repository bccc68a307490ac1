package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.ClassifierOps

/** Streaming scoring for the in-engine classifiers (ClassifierOps):
  * the train-offline / score-online split every quality-filter
  * deployment uses. Training stays a batch job (q140/q142); the fitted
  * weights — model-sized driver state — are baked into the streaming
  * projection as literals (single model) or broadcast as a tiny static
  * frame joined per micro-batch (per-group models). Both paths are
  * STATELESS: no aggregation state, no watermark, append-mode pass-
  * through, so throughput is scan-bound and the operator composes with
  * any upstream streaming source or downstream sink.
  *
  * The scoring arithmetic is the same hard-sigmoid rational form as
  * training, so a stream-scored document gets the bit-identical
  * probability the batch scorer assigns — the parity specs pin stream
  * ≡ batch on both paths.
  */
object StreamingScore {

  /** Score a (streaming or batch) frame with one fitted weight vector
    * (bias first) over `xCols`; appends `p` (hard-sigmoid probability)
    * and `keep` (p >= threshold). */
  def scored(df: DataFrame, w: Seq[Double], xCols: Seq[String],
             threshold: Double = 0.5): DataFrame = {
    val p = ClassifierOps.score(w, xCols)
    df.withColumn("p", p).withColumn("keep", col("p") >= threshold)
  }

  /** Per-group variant: `weights` is the model-sized static frame
    * produced by [[ClassifierOps.fitGroupedHardSigmoidLR]] (groupCol,
    * _w0.._wd). The stream-static broadcast join re-resolves the frame
    * per micro-batch, so republishing weights (a new tiny frame) takes
    * effect without restarting the query. Rows whose group has no model
    * are dropped by the inner join — match the fit's group universe
    * upstream if that matters. */
  def scoredByGroup(df: DataFrame, weights: DataFrame, groupCol: String,
                    xCols: Seq[String], threshold: Double = 0.5): DataFrame = {
    val z = xCols.zipWithIndex.foldLeft(col("_w0")) { case (acc, (c, i)) =>
      acc + col(c) * col(s"_w${i + 1}")
    }
    df.join(broadcast(weights), groupCol)
      .withColumn("p", ClassifierOps.hardSigmoid(z))
      .drop(weights.columns.filter(_.startsWith("_w")).toSeq: _*)
      .withColumn("keep", col("p") >= threshold)
  }

  /** Score-online TOPIC assignment: attach the fitted IVF centroid
    * argmax ([[graft.ext.SimilarityOps.ivfFit]] trains offline; its
    * `IvfModel.centroids` are model-sized driver state, like the LR
    * weights above) to a streaming frame as `centroid_id`. The argmax
    * is one codegen'd literal-chain expression
    * ([[graft.functions.VecExpressions.nearestCentroid]]) — stateless,
    * append-mode pass-through, scan-bound; the exact expression the
    * batch assignment path evaluates, so stream ≡ batch cluster ids by
    * construction (parity spec pins it). Republishing centroids means
    * restarting the query (they are literals); use the per-group
    * weights-frame pattern above when hot-swap matters more than
    * codegen. */
  def assignedTopics(df: DataFrame, centroids: Array[Array[Double]],
                     vecCol: String): DataFrame =
    df.withColumn("centroid_id",
      graft.functions.VecExpressions.nearestCentroid(col(vecCol), centroids))
}
