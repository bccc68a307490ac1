package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{EventOps, RegressionOps}
import graft.ext.EvalOps

class EvalRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── EventOps.concurrencyProfile ─────────────────────────────────────

  test("concurrencyProfile sweeps end-exclusive boundaries per group") {
    // group A: [1,5] [2,3] [4,6] and the zero-length [7,7];
    // group B: [1,2] — groups sweep independently
    val iv = Seq(
      ("A", 1L, 5L), ("A", 2L, 3L), ("A", 4L, 6L), ("A", 7L, 7L),
      ("B", 1L, 2L)
    ).toDF("g", "s_start", "s_end")
    val got = EventOps.concurrencyProfile(iv, Seq("g"))
      .select("g", "ts", "open").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("A", 1L) -> 1L, ("A", 2L) -> 2L, ("A", 3L) -> 1L, ("A", 4L) -> 2L,
      ("A", 5L) -> 1L, ("A", 6L) -> 0L,
      ("A", 7L) -> 0L, // zero-length interval: +1-1 at one ts, never open
      ("B", 1L) -> 1L, ("B", 2L) -> 0L))
  }

  // ── EvalOps.aucExact ────────────────────────────────────────────────

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Option[Double]) = {
    val df = rows.toDF("score", "label")
    val r = EvalOps.aucExact(df, col("score"), col("label")).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("aucExact is 1 for a perfect ranking and 0 for a reversed one") {
    assert(auc(Seq((3L, 1L), (2L, 1L), (1L, 0L))) == (4L, 4L, Some(1.0)))
    assert(auc(Seq((3L, 0L), (2L, 0L), (1L, 1L))) == (0L, 4L, Some(0.0)))
  }

  test("aucExact counts ties as half-pairs, exactly") {
    // pos at 2, neg at 2 (tie) and neg at 1 (win): (1 + 0.5) / 2 = 0.75
    assert(auc(Seq((2L, 1L), (2L, 0L), (1L, 0L))) == (3L, 4L, Some(0.75)))
  }

  test("aucExact degenerates to NULL when one class is absent") {
    val (_, den, a) = auc(Seq((1L, 1L), (2L, 1L)))
    assert(den == 0L && a.isEmpty)
  }

  test("aucExact on continuous double scores: exact vs brute force, " +
    "and the score-grain cumsum window is never unpartitioned") {
    // deterministic pseudo-random continuous scores: score grain ==
    // corpus size, the case where a global-window cumsum would
    // single-partition the whole set
    val rows = (1 to 2000).map { i =>
      val h = ((i * 2654435761L) & 0x7fffffffL).toDouble / 0x7fffffffL.toDouble
      val s = h * 10.0 - 5.0
      val l = if (((i * 40503L) % 997L) < 997L * (1.0 / (1.0 + math.exp(-s)))) 1L else 0L
      (s, l)
    }
    val df = rows.toDF("score", "label")
    val res = EvalOps.aucExact(df, col("score"), col("label"))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = pos.iterator
      .map(p => 2L * neg.count(n => p > n) + neg.count(n => p == n).toLong).sum
    val den2 = 2L * pos.size * neg.size
    val r = res.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (num2, den2))
    // Plan shape: any unpartitioned logical Window must sit above the
    // ≤buckets-row __qb rollup aggregate (never over the score-grain
    // set), and the score-grain cumsum window is partitioned.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    assert(wins.exists(_.partitionSpec.nonEmpty))
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overBucketRollup = w.child.collect { case a: Aggregate => a }
        .exists(_.groupingExpressions.exists(_.references.exists(_.name == "__qb")))
      assert(overBucketRollup,
        s"unpartitioned window over a non-bucket-rollup input:\n$w")
    }
  }

  test("aucExact routes NaN/±Inf scores by Spark's global double order") {
    // Spark total order: -Inf < finite < +Inf < NaN. Brute force with
    // java.lang.Double.compare (the same total order) is the oracle;
    // the bucketed path must agree exactly even though the affine
    // bucket map is undefined for non-finite scores. Also checks the
    // finite scores still spread across buckets (a NaN min/max would
    // have collapsed the affine map entirely).
    val rows: Seq[(Double, Long)] = Seq(
      (Double.NaN, 0L), (Double.PositiveInfinity, 1L),
      (Double.NegativeInfinity, 0L), (Double.NegativeInfinity, 1L),
      (-3.5, 0L), (-1.0, 1L), (0.0, 0L), (2.5, 1L), (7.25, 1L), (7.25, 0L))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = pos.iterator.map { p =>
      2L * neg.count(n => java.lang.Double.compare(p, n) > 0) +
        neg.count(n => java.lang.Double.compare(p, n) == 0).toLong
    }.sum
    val den2 = 2L * pos.size * neg.size
    val df = rows.toDF("score", "label")
    val r = EvalOps.aucExact(df, col("score"), col("label")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (num2, den2))
  }

  test("aucExact survives an all-non-finite score column") {
    val df = Seq((Double.NaN, 1L), (Double.PositiveInfinity, 0L),
      (Double.NegativeInfinity, 1L)).toDF("score", "label")
    val r = EvalOps.aucExact(df, col("score"), col("label")).collect()(0)
    // -Inf(pos) loses to +Inf(neg): 0 wins; NaN(pos) beats +Inf(neg):
    // 2; den2 = 2*2*1 = 4 → auc = 0.5
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == (2L, 4L, 0.5))
  }

  // ── EvalOps.confusionAt ─────────────────────────────────────────────

  test("confusionAt computes exact counts and guarded ratios") {
    val df = Seq((5L, 1L), (4L, 0L), (3L, 1L), (1L, 0L), (0L, 1L))
      .toDF("score", "label")
    val r = EvalOps.confusionAt(df, col("score"), col("label"), 3L).collect()(0)
    // pred>=3: scores 5,4,3 → tp=2 (5,3), fp=1 (4), fn=1 (0), tn=1 (1)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (2L, 1L, 1L, 1L))
    assert(r.getDouble(4) == 2.0 / 3.0) // precision
    assert(r.getDouble(5) == 2.0 / 3.0) // recall
    assert(r.getDouble(6) == 4.0 / 6.0) // f1
  }

  // ── RegressionOps.groupedOls ────────────────────────────────────────

  test("groupedOls recovers an exact line and nulls out constant x") {
    // group "line": y = 2x + 3 exactly; group "flat": constant x
    val df = (Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 11L)).map {
      case (x, y) => ("line", x, y)
    } ++ Seq(("flat", 2L, 1L), ("flat", 2L, 9L))).toDF("g", "x", "y")
    val got = RegressionOps.groupedOls(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val line = got("line")
    assert(line.getAs[Long]("n") == 4L)
    assert(line.getAs[Double]("slope") == 2.0)
    assert(line.getAs[Double]("intercept") == 3.0)
    val flat = got("flat")
    assert(flat.getAs[Long]("slope_den") == 0L)
    assert(flat.isNullAt(flat.fieldIndex("slope")))
    assert(flat.isNullAt(flat.fieldIndex("intercept")))
  }

  test("groupedOls matches the closed form on noisy integer data") {
    // deterministic pseudo-noise; check against directly-computed sums
    val pts = (1 to 200).map { i =>
      val x = (i * 7 % 50).toLong
      val y = 3L * x - 10L + (i * 13 % 11) - 5L
      (x, y)
    }
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = RegressionOps.groupedOls(df, Seq("g"), col("x"), col("y"))
      .collect()(0)
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    assert(r.getAs[Long]("slope_num") == n * sxy - sx * sy)
    assert(r.getAs[Long]("slope_den") == n * sxx - sx * sx)
    assert(r.getAs[Long]("icept_num") == sy * sxx - sx * sxy)
  }
}
