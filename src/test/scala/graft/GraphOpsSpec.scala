package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pageRank: hand-computed two rounds on an asymmetric triangle") {
    // 1→2, 1→3, 2→3, 3→1; outdeg(1)=2, outdeg(2)=outdeg(3)=1
    // round 1: r(1)=1000000, r(2)=575000, r(3)=1425000
    // round 2: r(1)=1361250, r(2)=575000, r(3)=1063750
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRank: dangling node keeps only the teleport term") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 receives nothing (150000); node 2 receives all of r0(1)
    assert(got == Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("bfsLevels: path graph stops at maxDepth, diamond takes min level") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    val got = GraphOps.bfsLevels(path, src, maxDepth = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 unreached

    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 2L))
      .toDF("src", "dst")
    val got2 = GraphOps.bfsLevels(diamond, src, maxDepth = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 discovered at depth 2 via both parents; revisit via 4→2 must not
    // relabel node 2
    assert(got2 == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfsLevels: deep chain stays correct and the Catalyst plan is " +
    "linear in depth, not multiplied per round") {
    // 15-node path 0→1→…→14 explored to its full diameter. The
    // frontier's anti-join embeds the visited set, which embeds every
    // previous frontier — plans are trees, so without the per-round
    // checkpoint truncation the node count multiplies ~4× per round
    // (round 9 measured q90's depth-4 plan at 50k explain lines; at
    // depth 14 analysis OOMs before data does). With every frontier a
    // checkpoint leaf, the visited set is a union of 15 one-node
    // leaves: linear, a few hundred plan nodes.
    val chain = (0L until 14L).map(i => (i, i + 1)).toDF("src", "dst")
    val levels = GraphOps.bfsLevels(chain, Seq(0L).toDF("id"), maxDepth = 14)
    val got = levels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 14L).map(i => i -> i).toMap)
    val planNodes = levels.queryExecution.analyzed.collect { case _ => 1 }.sum
    assert(planNodes < 1000,
      s"visited-set plan grew superlinearly with depth: $planNodes nodes")
  }

  test("release=true frees every per-call cache; default keeps them registered") {
    val sc = spark.sparkContext
    // unique literals → unique analyzed plans → no CacheManager sharing
    // with other tests' registered entries
    val edges = Seq((101L, 102L), (102L, 103L), (103L, 101L), (103L, 104L))
      .toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    val pr = GraphOps.pageRank(edges, iters = 2, release = true)
    val bfs = GraphOps.bfsLevels(edges, Seq(101L).toDF("id"), maxDepth = 3,
      release = true)
    assert(pr.count() == 4 && bfs.count() == 4)
    // result frames are localCheckpoint-materialized (one registered RDD
    // each, reclaimed when the frames are GC'd); every intermediate
    // edge/degree/node/frontier cache the calls created is gone
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 2, s"leaked caches: ${added.size - 2}")
  }

  test("labelPropagation: two triangles joined by a bridge split into " +
    "two communities with min-label canonical ids") {
    // undirected: both directions materialized, as purchaseGraph does
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced: round 1 floods min labels (4 briefly takes 3 via the
    // bridge), round 2 the triangle majorities win, round 3+ stable
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("labelPropagation: release=true frees per-call caches") {
    val sc = spark.sparkContext
    val edges = Seq((201L, 202L), (202L, 201L), (202L, 203L), (203L, 202L))
      .toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    val lp = GraphOps.labelPropagation(edges, iters = 2, release = true)
    assert(lp.count() == 3)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked caches: ${added.size - 1}")
  }

  test("kCore: a pendant chain peels off round by round, the triangle survives") {
    // triangle {1,2,3} + chain 3-4-5: k=2 peels 5 (deg 1) in round 1,
    // then 4 (demoted to deg 1) in round 2 — the cascade — leaving the
    // triangle with in-core degree 2 everywhere
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = GraphOps.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round fewer leaves the half-peeled chain visible
    val partial = GraphOps.kCore(edges, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(partial == Set(1L, 2L, 3L, 4L))
  }

  test("kCore: a path graph is the worst case - exactly two nodes per round, then empty") {
    val und = (0L until 12L).sliding(2).map(w => (w(0), w(1))).toSeq
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // 12 nodes (0..11), endpoints peel pairwise: 12-2r survive round r
    (1 to 6).foreach { r =>
      val n = GraphOps.kCore(edges, k = 2, rounds = r, release = true).count()
      assert(n == math.max(0, 12 - 2 * r), s"round $r")
    }
  }

  test("kCore: release=true frees per-call caches") {
    val sc = spark.sparkContext
    val und = Seq((301L, 302L), (302L, 303L), (301L, 303L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    assert(GraphOps.kCore(edges, k = 2, rounds = 2, release = true).count() == 3)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked caches: ${added.size - 1}")
  }

  test("graph family shared frames: purchaseGraph and kCore8 memoize per (session, dir)") {
    val dir = SparkTestSession.sfDir
    val g1 = QueryHelpers.purchaseGraph(spark, dir)
    val g2 = QueryHelpers.purchaseGraph(spark, dir)
    assert(g1 eq g2, "purchaseGraph must return the session-shared instance")
    assert(g1.storageLevel.useMemory || g1.storageLevel.useDisk,
      "shared graph frame must be persisted")
    val k1 = QueryHelpers.kCore8(spark, dir)
    val k2 = QueryHelpers.kCore8(spark, dir)
    assert(k1 eq k2, "kCore8 must return the session-shared instance")
    // shared form ≡ a standalone rebuild (bit-equality via except)
    val standalone = GraphOps.kCore(
      QueryHelpers.purchaseGraph(spark, dir), k = 8, rounds = 4)
    assert(k1.count() == standalone.count())
    assert(k1.except(standalone).isEmpty && standalone.except(k1).isEmpty)
  }

  test("timeWeightedAvg: last observation carries no weight") {
    val ev = Seq((1L, 0L, 1L, 10L), (1L, 10L, 2L, 20L), (1L, 40L, 3L, 5L),
      (2L, 0L, 4L, 7L)) // single-event key → no output row
      .toDF("user_id", "tss", "event_id", "v")
    val got = GraphOps.timeWeightedAvg(ev, col("user_id"), col("tss"),
      col("event_id"), col("v")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // durs 10 and 30: wsum = 10*10 + 20*30 = 700, dsum = 40
    assert(got == Map(1L -> (700L, 40L)))
  }
}
