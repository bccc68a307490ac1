package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps

/** Pins the round-10 q168 plan shape: the ×1000 rehearsal measured the
  * original form superlinear (exp 1.31, 75.8 s warm at 2M vectors)
  * because both rankings were `row_number` windows — a full sort of a
  * corpus×16-row frame in 16 tasks — and the ADC side re-aggregated a
  * 16×-fanned join output by (qid, cid). The rewrite ranks through the
  * bounded-heap top-k aggregate and computes adist as 4 array lookups
  * in a projection. Two properties are load-bearing:
  *
  *  1. q168's optimized plan contains NO Window operator — both
  *     rankings are top_k_by_score aggregates (map-side combined,
  *     k·16 B per group per partition through the shuffle).
  *  2. The negated-long ordering trick is exactly the ascending
  *     window's ordering: `dist ASC, id ASC` ≡ `-dist DESC, id ASC`,
  *     including ties and the double representation of the longs.
  */
class PqPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q168 plans no Window; both rankings are top_k_by_score aggregates") {
    val df = Queries.byName("q168_pq_ann").run(spark, SparkTestSession.sfDir)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.isEmpty,
      s"q168 must not rank through a window sort, found: $windows")
    val topKAggs = plan.collect {
      case a: Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("top_k_by_score")) => a
    }
    assert(topKAggs.size >= 2,
      s"expected the ADC and exact rankings as top_k_by_score aggregates, " +
        s"found ${topKAggs.size}")
  }

  test("negated-long top-k equals the ascending row_number window, ties included") {
    // tie-heavy fixture: distances collide across cids within a qid,
    // so the tiebreak (lower cid wins) is actually exercised
    val rows = for {
      qid <- 0L until 4L
      cid <- 0L until 50L
    } yield (qid, cid, (cid % 7L) * 1000L)
    val scored = rows.toDF("qid", "cid", "dist")

    val viaAgg = SimilarityOps.rankTopK(
        scored.withColumn("nd", -col("dist").cast(DoubleType)), "nd", 10)
      .select("qid", "cid", "rank")
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("qid", "cid", "rank")

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "bounded-heap ranking diverged from the ascending window")
  }
}
