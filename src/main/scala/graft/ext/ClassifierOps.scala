package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of a linear quality classifier — the
  * fastText/CCNet-style step of an LLM data pipeline (train a cheap
  * classifier on surface features, score every document, keep the
  * high-scoring fraction) expressed entirely as Spark aggregations, so
  * the same engine that filters the corpus also fits the filter.
  *
  * The model is logistic regression with a HARD sigmoid
  * (p = clamp(z/4 + 1/2, 0, 1)) trained by full-batch gradient descent.
  * The hard sigmoid is deliberate: transcendental exp() is not
  * bit-portable across engines (libm vs JVM differ in final ulps), but
  * +,-,*,/ and comparisons are IEEE-exact, so every engine computing
  * this fit from the same sums gets weights equal to within
  * summation-order noise — which the callers' fixed-decimal rounding
  * absorbs. Gradient of the resulting piecewise-quadratic loss matches
  * plain LR inside the linear region: grad_i = avg((p - y) * x_i).
  *
  * Scale shape: one persisted feature frame; each GD step is ONE
  * map-side-combined aggregation producing d+1 doubles; the only
  * driver-side state is the weight vector itself (model-sized, like the
  * IVF centroids in [[SimilarityOps]]). Steps are sequential by nature
  * (each needs the previous weights), so a t-step fit is t scans of the
  * cached features — at 100 TB the feature frame is narrow
  * (d doubles + label), not the corpus text.
  */
object ClassifierOps {

  /** p = clamp(z * 0.25 + 0.5, 0, 1) — rational-arithmetic sigmoid. */
  def hardSigmoid(z: Column): Column =
    least(greatest(z * 0.25 + 0.5, lit(0.0)), lit(1.0))

  /** Full-batch GD fit. `features` must contain `yCol` (0.0/1.0) and
    * `xCols` (already standardized by the caller — GD on raw scales
    * diverges). Returns the weight vector, bias first. Cache lifecycle
    * is the CALLER's: the fit scans `features` once per iteration plus
    * once for any downstream scoring, so callers should persist/pin the
    * frame around the fit (the registry queries use QueryCaches). */
  def fitHardSigmoidLR(features: DataFrame, xCols: Seq[String], yCol: String,
                       iters: Int = 3, lr: Double = 1.0): Array[Double] = {
    require(iters >= 1 && xCols.nonEmpty)
    var w = Array.fill(xCols.size + 1)(0.0)
    for (_ <- 1 to iters) {
      val z = xCols.zipWithIndex
        .foldLeft(lit(w(0))) { case (acc, (c, i)) => acc + col(c) * w(i + 1) }
      val resid = hardSigmoid(z) - col(yCol)
      val grads = features.agg(
        avg(resid).as("gb"),
        xCols.map(c => avg(resid * col(c)).as(s"g_$c")): _*
      ).head()
      w = w.indices.map(i => w(i) - lr * grads.getDouble(i)).toArray
    }
    w
  }

  /** Score column for a fitted weight vector (bias first): the hard-
    * sigmoid probability of the positive class. */
  def score(w: Seq[Double], xCols: Seq[String]): Column =
    hardSigmoid(xCols.zipWithIndex
      .foldLeft(lit(w.head)) { case (acc, (c, i)) => acc + col(c) * w(i + 1) })
}
