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
    // Deliberately a driver loop (one small collect per iteration):
    // the weights enter each gradient pass as LITERALS, which codegen
    // constant-folds into the aggregation — measured faster than the
    // single-plan chained form, whose per-iteration
    // crossJoin(broadcast(w)) pays a per-row join for values that are
    // constants (interleaved A/B at sf0.1: q140 1.23–1.28 s driver
    // loop vs 1.35–1.44 s chained). The grouped variant below is the
    // opposite case: its weights genuinely vary per row's group, the
    // broadcast join exists in both forms, so there the chain wins.
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

  /** Model-parallel variant: fit one independent hard-sigmoid LR PER
    * GROUP (per-domain quality models — the "one fastText per source"
    * pattern), all trained simultaneously. Each iteration is ONE
    * broadcast join (the weights frame is model-sized: |groups|×(d+1)
    * doubles) plus ONE grouped aggregation, chained lazily into a
    * single linear plan — each iteration references the previous
    * weights frame exactly once, so plan growth is linear in `iters`,
    * not the doubling of the iterative-loop trap documented in STATUS
    * round 6. 10k groups cost the same number of passes as one.
    *
    * Returns (group, w0..wd) with w0 the bias. Groups are read from
    * `features` itself; a group's model sees only its own rows. */
  def fitGroupedHardSigmoidLR(features: DataFrame, groupCol: String,
                              xCols: Seq[String], yCol: String,
                              iters: Int = 4, lr: Double = 2.0): DataFrame = {
    require(iters >= 1 && xCols.nonEmpty)
    val d = xCols.size
    // Single-plan unrolled fit (was one collect per iteration plus a
    // distinct+collect for the zero init — t+1 driver round trips; the
    // whole fit is now ONE lazy frame the caller executes). Each
    // iteration's weights ride through its gradient aggregation as
    // first(_w*) — constant within a group after the broadcast join —
    // so the chain references the previous frame exactly once (linear
    // plan growth, not the kCore doubling trap). Every group always
    // has rows in `features` (the init scans the same frame), so the
    // inner join drops nothing and the update set matches the
    // collect-loop exactly; the arithmetic (avg gradients, w - lr*g,
    // IEEE doubles) is unchanged.
    var w: DataFrame = features.select(col(groupCol)).distinct()
      .select(col(groupCol) +: (0 to d).map(i => lit(0.0).as(s"_w$i")): _*)
    for (_ <- 1 to iters) {
      val z = (0 until d).foldLeft(col("_w0")) { (acc, i) =>
        acc + col(xCols(i)) * col(s"_w${i + 1}")
      }
      val resid = hardSigmoid(z) - col(yCol)
      w = features.join(broadcast(w), groupCol)
        .groupBy(groupCol)
        .agg(
          (first(col("_w0")) - lit(lr) * avg(resid)).as("_w0"),
          (0 until d).map { i =>
            (first(col(s"_w${i + 1}")) - lit(lr) * avg(resid * col(xCols(i))))
              .as(s"_w${i + 1}")
          }: _*)
    }
    w
  }
}
