package graft

import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.GraphOps

/** Pins the two BFS partitioning regimes introduced by the round-9/10
  * change history: round 9 unconditionally pre-partitioned the cached
  * edge list on `src` (the pageRank discipline) and regressed q90 by
  * 69% at sf0.1 — the frontier there is broadcast-sized, so the
  * expansion join never exchanges the edge side ANYWAY and the build
  * shuffle was pure cost. Round 10 made the pre-partition conditional
  * on [[GraphOps.PrePartitionMinEdges]]. This spec proves each regime's
  * load-bearing property:
  *
  *  1. LARGE regime (what the threshold buys at 100 TB): with the edge
  *     list cached hash-partitioned on `src` and a non-broadcastable
  *     frontier, the per-round expansion join shuffles ONLY the
  *     frontier side — zero exchanges between the join and the edge
  *     cache scan.
  *  2. The two regimes are result-identical (the threshold is a pure
  *     performance knob).
  */
class BfsPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def shufflesUnder(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case s: ShuffleExchangeExec => s }

  test("pre-partitioned edge cache: expansion join exchanges only the frontier side") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // Broadcast off = the regime the threshold exists for (frontier too
    // big to broadcast); AQE off so executedPlan is the real tree (an
    // AdaptiveSparkPlanExec hides its stages from collect, which would
    // make the no-exchange assertion vacuous).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val edges = (0L until 4000L).map(i => (i % 997L, (i * 31) % 997L))
        .toDF("src", "dst")
      val e = edges.repartition(col("src")).persist()
      e.count()
      val frontier = (0L until 200L).toDF("id")
      val levels = (500L until 600L).toDF("id").withColumn("level", lit(0L))
      try {
        val next = GraphOps.expandFrontier(frontier, e, levels, 1)
        next.count()
        val plan = next.queryExecution.executedPlan
        val expand = plan.collect {
          case j: SortMergeJoinExec
            if j.rightKeys.exists(_.toString.contains("src")) => j.right
          case j: ShuffledHashJoinExec
            if j.rightKeys.exists(_.toString.contains("src")) => j.right
        }
        assert(expand.nonEmpty, s"expansion join not found in:\n$plan")
        // edge side: straight to the cache scan, no exchange
        assert(expand.forall(shufflesUnder(_).isEmpty),
          s"edge side of the expansion join re-shuffled:\n$plan")
        assert(expand.exists(_.collect {
          case s: InMemoryTableScanExec => s }.nonEmpty),
          s"edge side is not the cached scan:\n$plan")
      } finally e.unpersist()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("forced pre-partition and default (small-regime) BFS are result-identical") {
    val edges = (0L until 3000L).map(i => (i % 499L, (i * 17 + 3) % 499L))
      .toDF("src", "dst")
    val sources = Seq(0L).toDF("id")
    val small = GraphOps.bfsLevels(edges, sources, maxDepth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val large = GraphOps.bfsLevels(edges, sources, maxDepth = 4,
        prePartitionMinEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(small.nonEmpty && small.sameElements(large))
  }
}
