package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.VecExpressions

/** Embedding aggregation: label prototypes (mean pooling) and
  * prototype-assignment evaluation.
  *
  * Determinism contract: a float mean summed as doubles depends on
  * partition order, which would make results irreproducible across
  * cluster sizes (and un-oracle-able). Pooling therefore sums FIXED-
  * POINT values — each component quantized to 2⁻²⁰ steps and summed as
  * longs, which is exact and order-independent; the mean divides two
  * exact numbers in a fixed operation order. The 2⁻²⁰ quantization is
  * ~1e-6 per component, far below embedding noise.
  *
  * Scale shapes: pooling is explode + a map-side-combinable (label, i)
  * aggregate — shuffle rows = labels × dim, never corpus-sized.
  * Prototype assignment collects only the label-prototype matrix
  * (labels × dim — index metadata, same contract as the IVF centroid
  * index) and assigns via the broadcast codegen'd argmax expression —
  * a narrow projection, zero shuffle on the corpus.
  */
object EmbeddingOps {

  private val FP = 1L << 20

  /** Per-label mean embedding in LONG format: (label, i, mu, n) for
    * dimension index i in [0, dim). */
  def meanPoolByLabel(df: DataFrame, label: Column, vec: Column): DataFrame =
    df.select(label.cast(LongType).as("label"),
        posexplode(vec).as(Seq("i", "v")))
      .groupBy("label", "i")
      .agg(sum(floor(col("v").cast(DoubleType) * FP + 0.5).cast(LongType)).as("sfp"),
        count(lit(1)).as("n"))
      .select(col("label"), col("i").cast(LongType).as("i"),
        (col("sfp").cast(DoubleType) / col("n") / FP).as("mu"), col("n"))

  /** Assigns every vector to its nearest label prototype (dot-product
    * argmax over the pooled means; ties take the larger label, matching
    * [[VecExpressions.NearestCentroid]]) and returns the confusion
    * counts (label, assigned, n_vecs). The prototype matrix is collected
    * driver-side as index metadata — labels × dim values, not data. */
  def prototypeConfusion(df: DataFrame, label: Column, vec: Column,
                         dim: Int): DataFrame = {
    val pooled = meanPoolByLabel(df, label, vec)
      .select("label", "i", "mu").collect()
    val labels = pooled.map(_.getLong(0)).distinct.sorted
    val protos = labels.map { l =>
      val mu = new Array[Double](dim)
      pooled.filter(_.getLong(0) == l)
        .foreach(r => mu(r.getLong(1).toInt) = r.getDouble(2))
      mu
    }
    df.select(label.cast(LongType).as("label"),
        VecExpressions.nearestCentroid(vec, protos).as("pid"))
      .withColumn("assigned", element_at(
        array(labels.map(lit): _*), col("pid") + 1))
      .groupBy("label", "assigned").agg(count(lit(1)).as("n_vecs"))
      .orderBy("label", "assigned")
  }
}
