package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps
import graft.functions.HashExpressions

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (event_id, user_id, tss, value): user 1's event at 150 is EXACTLY
  // gap seconds after 50 and still extends the session (session_window
  // semantics); 251 is 101 > gap later and starts a new one. User 2 has
  // one session including an equal-timestamp tie.
  private def events = Seq(
    (1L, 1L, 0L, 1.0), (2L, 1L, 50L, 2.0), (3L, 1L, 150L, 3.0),
    (4L, 1L, 251L, 4.0),
    (5L, 2L, 10L, 5.0), (6L, 2L, 10L, 6.0), (7L, 2L, 60L, 7.0)
  ).toDF("event_id", "user_id", "tss", "value")

  test("sessionize splits only when the gap strictly exceeds the threshold") {
    val got = EventOps.sessionize(events, col("user_id"), col("tss"),
        col("event_id"), gapSec = 100L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("sessionIntervals aggregates without a second shuffle") {
    val iv = EventOps.sessionIntervals(events, col("user_id"), col("tss"),
      col("event_id"), col("value"), gapSec = 100L)
    val rows = iv.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows((1L, 1L)) == (0L, 150L, 3L, 6.0))
    assert(rows((1L, 2L)) == (251L, 251L, 1L, 4.0))
    assert(rows((2L, 1L)) == (10L, 60L, 3L, 18.0))
    // the groupBy keys are a superset of the window partition key, so
    // the whole pipeline needs exactly one exchange (counted in the
    // AQE final-plan text: query stages hide the exchange from collect)
    val finalPlan = iv.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(shuffles == 1, finalPlan)
  }

  test("asOfJoin: inclusive <=, null before first, max on right ties") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 50L),
      (4L, 2L, 100L)).toDF("id", "k", "tss")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (1L, 150L, 25.0),
      (3L, 100L, 99.0)).toDF("k", "tss", "v")
    val got = EventOps.asOfJoin(left, right, "k", "tss", "v")
      .select("id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(10.0))  // equal timestamp matches (inclusive)
    assert(got(2L).contains(25.0))  // latest row; tie at 150 -> max value
    assert(got(3L).isEmpty)         // nothing at or before 50
    assert(got(4L).isEmpty)         // right has no key 2
  }

  test("overlapCounts matches the naive quadratic answer across buckets") {
    // intervals deliberately span multiple buckets (bucketSec = 10)
    val iv = Seq(
      (1L, 0L, 35L), (2L, 30L, 40L), (3L, 38L, 60L),
      (4L, 100L, 101L), (5L, 200L, 300L), (6L, 250L, 260L)
    ).toDF("sid", "s_start", "s_end")
    val got = EventOps.overlapCounts(iv, Seq("sid"), bucketSec = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = iv.as("a").crossJoin(iv.as("b"))
      .filter(col("a.sid") =!= col("b.sid") &&
        col("a.s_start") <= col("b.s_end") && col("b.s_start") <= col("a.s_end"))
      .groupBy(col("a.sid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 6L).map(s => s -> naive.getOrElse(s, 0L)).toMap)
    assert(got(4L) == 0L) // isolated interval present with zero count
  }

  test("rollingZScore: null until minPrev, spike scores high, flat is null") {
    // key 1: stable baseline then a spike; key 2: constant (zero
    // variance -> always null)
    val series = ((1 to 10).map(i => (i.toLong, 1L, i.toLong, 10.0 + (i % 2))) :+
      (11L, 1L, 11L, 500.0)) ++ (1 to 6).map(i => (20L + i, 2L, i.toLong, 7.0))
    val df = series.toDF("event_id", "user_id", "tss", "value")
    val z = EventOps.rollingZScore(df, col("user_id"), col("tss"),
        col("event_id"), col("value"), lookback = 20, minPrev = 5, scale = 100L)
      .select("event_id", "zscore").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert((1L to 5L).forall(z(_).isEmpty))  // fewer than 5 prior events
    assert(z(6L).isDefined)
    assert(z(11L).exists(_ > 100.0))          // the spike vs a ~0.5-std base
    assert((21L to 26L).forall(z(_).isEmpty)) // zero variance -> null
  }

  test("custom hash codegen survives GenerateOrdering (sort + top-k)") {
    // GenerateOrdering has no interpreted fallback: a codegen snippet
    // that janino can't parse fails the query outright (this is how the
    // IVF top-k pair broke in round 3). Exercise both sort paths.
    val df = events.withColumn("h",
      HashExpressions.md5Prefix64(concat_ws(":", col("event_id"))))
    assert(df.orderBy(col("h")).collect().length == 7)
    assert(df.orderBy(col("h")).limit(3).collect().length == 3)
  }
}
