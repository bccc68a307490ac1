package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Model-evaluation operators for scored corpora (the QA step after any
  * "apply a quality/classifier model at scale" job, e.g. q120's linear
  * scorer): exact AUC and threshold confusion metrics.
  *
  * Everything is exact-integer until one final division, so results
  * hash-gate against a SQL oracle in any partitioning:
  *  - aucExact: the Mann-Whitney pair count. Scores aggregate to
  *    score-grain first (map-side combined — the shuffle carries
  *    |distinct scores| rows, not |corpus|); ties contribute half a
  *    pair, kept exact by counting DOUBLED pairs (×2). The cumulative
  *    window then runs over the aggregated score-grain set — the same
  *    "window over a reduced set" altitude as TopNOps' rank; at true
  *    100 TB grain the orderBy becomes a range-partitioned sort, never
  *    a per-row global window.
  *  - confusionAt: one aggregation pass, four exact counts.
  */
object EvalOps {

  /** Exact ROC AUC of `score` against binary 0/1 `label`, as a single
    * row of exact longs plus the ratio: `auc_num2` = twice the
    * Mann-Whitney statistic (each win 2, each tie 1 — integer-exact),
    * `auc_den2` = 2·n_pos·n_neg, `auc` = num2/den2 (caller rounds for
    * hash-gating). Degenerate inputs (no positives or no negatives)
    * return den2 = 0 and a NULL auc.
    *
    * The cumulative negative count is NOT a global `Window.orderBy`
    * (which single-partitions the whole score-grain set — fatal for a
    * continuous double score whose grain ≈ the corpus). It is the
    * two-phase bucketed cumsum: scores bucketize by an order-preserving
    * affine map from the broadcast (min,max) — monotone, so
    * (bucket ASC, s ASC) IS the global score order — the within-bucket
    * cumsum windows partition-by-bucket, and the cross-bucket offset
    * comes from a window over the ≤`buckets`-row rollup (the only
    * unpartitioned window, bounded by the bucket count, never by data).
    * Non-finite scores are routed deterministically around the affine
    * map, preserving Spark's global double order (-Inf < finite <
    * +Inf < NaN): -Inf → bucket 0, +Inf and NaN → the top bucket,
    * where the within-bucket `ORDER BY s` puts them back in exactly
    * that order. min/max for the affine map are computed over finite
    * scores only, so one stray NaN can no longer corrupt every finite
    * bucket assignment.
    */
  def aucExact(scored: DataFrame, score: Column, label: Column,
               buckets: Int = 1024): DataFrame = {
    val byScore = scored.groupBy(score.as("s"))
      .agg(sum(when(label === 1, 1L).otherwise(0L)).as("np"),
        sum(when(label === 1, 0L).otherwise(1L)).as("nn"))
    val sd = col("s").cast(DoubleType)
    val isFinite = !isnan(sd) && sd =!= Double.PositiveInfinity &&
      sd =!= Double.NegativeInfinity
    val stats = byScore.agg(
      min(when(isFinite, sd)).as("__smin"), max(when(isFinite, sd)).as("__smax"))
    val qbFinite = when(col("__smax") <= col("__smin"), lit(0L)).otherwise(
      least(greatest(floor((sd - col("__smin").cast(DoubleType)) /
          (col("__smax").cast(DoubleType) - col("__smin").cast(DoubleType)) * buckets),
        lit(0L)), lit(buckets.toLong - 1))).cast("long")
    val qb = when(isnan(sd) || sd === Double.PositiveInfinity, lit(buckets.toLong - 1))
      .when(sd === Double.NegativeInfinity, lit(0L))
      .otherwise(qbFinite)
    val bucketed = byScore.crossJoin(broadcast(stats))
      .withColumn("__qb", qb).drop("__smin", "__smax")
    val wIn = Window.partitionBy("__qb").orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = bucketed.withColumn("__cumIn", sum(col("nn")).over(wIn))
    val perBucket = withCum.groupBy("__qb").agg(max(col("__cumIn")).as("__btot"))
    val wAbove = Window.orderBy(col("__qb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val above = perBucket
      .withColumn("__above", coalesce(sum(col("__btot")).over(wAbove), lit(0L)))
      .select("__qb", "__above")
    withCum.join(broadcast(above), Seq("__qb"))
      .withColumn("cum_nn", col("__above") + col("__cumIn"))
      .agg(
        sum(col("np") * (lit(2L) * (col("cum_nn") - col("nn")) + col("nn")))
          .as("auc_num2"),
        (lit(2L) * sum(col("np")) * sum(col("nn"))).as("auc_den2"))
      .select(col("auc_num2"), col("auc_den2"),
        when(col("auc_den2") > 0L,
          col("auc_num2").cast(DoubleType) / col("auc_den2").cast(DoubleType))
          .as("auc"))
  }

  /** Confusion counts of `score >= threshold` against 0/1 `label`:
    * one narrow aggregation (tp/fp/fn/tn as exact longs) plus
    * precision/recall/F1 as doubles from one fixed formula each
    * (NULL when the denominator is 0). */
  def confusionAt(scored: DataFrame, score: Column, label: Column,
                  threshold: Long): DataFrame = {
    val pred = when(score >= threshold, 1L).otherwise(0L)
    val agg = scored.agg(
      sum(when(label === 1 && pred === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(label === 0 && pred === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(label === 1 && pred === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(label === 0 && pred === 0, 1L).otherwise(0L)).as("tn"))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0L,
        col("tp").cast(DoubleType) / (col("tp") + col("fp")).cast(DoubleType))
        .as("precision"),
      when(col("tp") + col("fn") > 0L,
        col("tp").cast(DoubleType) / (col("tp") + col("fn")).cast(DoubleType))
        .as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        (lit(2L) * col("tp")).cast(DoubleType) /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast(DoubleType))
        .as("f1"))
  }
}
