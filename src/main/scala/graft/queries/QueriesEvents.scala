package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}

import graft.analytics._
import graft.etl.ChangeCapture
import graft.ext._
import graft.QueryCaches.Pinned
import graft.QueryHelpers._

/** Event-stream analytics: sessionization, as-of joins, funnels,
  * retention, transitions, gap-fill, burst detection, drift timelines.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesEvents {

  val qs: Seq[Q] = Seq(

    Q("q71_sessionization",
      (s, dir) => {
        // Gap-based sessions per user (a gap over 6h starts a new one),
        // summarized per session. One shuffle: the window partitions on
        // user_id and the groupBy keys are a superset of it.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        EventOps.sessionIntervals(ev, col("user_id"), col("tss"),
            col("event_id"), col("value"), gapSec = 21600L)
          .select(col("user_id"), col("session_seq"), col("s_start"),
            col("s_end"), col("n_events"), r4(col("sum_value")).as("sum_value"))
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id, value,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, tss, event_id, value,
             |    CASE WHEN lag(tss) OVER w IS NULL
             |           OR tss - lag(tss) OVER w > 21600 THEN 1 ELSE 0 END AS new_s
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
             |sess AS (
             |  SELECT user_id, tss, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tss, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM flagged)
             |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             |  min(tss) AS s_start, max(tss) AS s_end,
             |  count(*) AS n_events,
             |  floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value
             |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q72_asof_join",
      (s, dir) => {
        // Point-in-time join: each click gets the value of the latest
        // purchase by the same user at-or-before the click. Union +
        // per-key ordered window — one shuffle, no range scan; DuckDB's
        // native ASOF JOIN is the oracle.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("tss"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("tss"))
          .agg(max(col("value")).as("pv"))
        EventOps.asOfJoin(clicks, purchases, "user_id", "tss", "pv")
          .select(col("event_id"), col("user_id"), col("tss"),
            r4(col("asof_value")).as("pv"))
          .orderBy("event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss,
             |    max(value) AS pv
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.tss,
             |  floor((p.pv) * 10000.0 + 0.5) / 10000.0 AS pv
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.tss >= p.tss
             |ORDER BY c.event_id""".stripMargin)),

    Q("q73_rolling_zscore",
      (s, dir) => {
        // Trailing-window anomaly score per user: each event vs its
        // previous <=20 values. Fixed-point window sums make the score
        // engine-portable (see EventOps.rollingZScore); NULL until 5
        // prior events exist.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        EventOps.rollingZScore(ev, col("user_id"), col("tss"),
            col("event_id"), col("value"), lookback = 20, minPrev = 5,
            scale = 100L)
          .select(col("event_id"), col("user_id"), r4(col("zscore")).as("zscore"))
          .orderBy("event_id")
      },
      Some("""WITH s AS (
             |  SELECT event_id, user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss,
             |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |roll AS (
             |  SELECT event_id, user_id, v,
             |    count(v) OVER w AS n,
             |    CAST(sum(v) OVER w AS BIGINT) AS sv,
             |    CAST(sum(v * v) OVER w AS BIGINT) AS sv2
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id
             |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id,
             |  floor((CASE WHEN n >= 5 AND
             |      (CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(n AS DOUBLE) - 1.0) > 0
             |    THEN (CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
             |      / sqrt((CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(n AS DOUBLE) - 1.0))
             |    END) * 10000.0 + 0.5) / 10000.0 AS zscore
             |FROM roll ORDER BY event_id""".stripMargin)),

    Q("q74_session_overlap",
      (s, dir) => {
        // Cross-user session concurrency: for each session, how many
        // other sessions overlap it in time. Spark side is the bucketed
        // first-shared-bucket self-join (bounded candidates, no
        // distinct); the oracle is the naive O(n^2) inequality join.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        val iv = EventOps.sessionIntervals(ev, col("user_id"), col("tss"),
            col("event_id"), col("value"), gapSec = 21600L)
          .select(col("user_id"), col("session_seq"), col("s_start"), col("s_end"))
        EventOps.overlapCounts(iv, Seq("user_id", "session_seq"), bucketSec = 21600L)
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, tss, event_id,
             |    CASE WHEN lag(tss) OVER w IS NULL
             |           OR tss - lag(tss) OVER w > 21600 THEN 1 ELSE 0 END AS new_s
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
             |sess AS (
             |  SELECT user_id, tss,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tss, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM flagged),
             |iv AS (
             |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             |    min(tss) AS s_start, max(tss) AS s_end
             |  FROM sess GROUP BY 1, 2),
             |ov AS (
             |  SELECT a.user_id, a.session_seq, count(*) AS n_overlap
             |  FROM iv a JOIN iv b
             |    ON a.s_start <= b.s_end AND b.s_start <= a.s_end
             |    AND (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
             |  GROUP BY 1, 2)
             |SELECT iv.user_id, iv.session_seq,
             |  coalesce(ov.n_overlap, 0) AS n_overlap
             |FROM iv LEFT JOIN ov USING (user_id, session_seq)
             |ORDER BY 1, 2""".stripMargin)),

    Q("q85_conversion_funnel",
      (s, dir) => {
        // Ordered-stage funnel: first signup, first click AFTER that
        // signup, first purchase AFTER that click, per user. Three
        // user-level aggregations chained by joins — after the first
        // aggregation every frame is user-sized, so the corpus is
        // scanned once per stage type and never self-joined row×row.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .select("user_id", "event_type", "tss")
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("tss")).as("t_signup"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("tss") >= col("t_signup"))
          .groupBy("user_id").agg(min(col("tss")).as("t_click"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("tss") >= col("t_click"))
          .groupBy("user_id").agg(min(col("tss")).as("t_purchase"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_signup"),
            count(col("t_click")).as("n_click_after"),
            count(col("t_purchase")).as("n_purchase_after"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |s1 AS (SELECT user_id, min(tss) AS t_signup FROM ev
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT ev.user_id, min(tss) AS t_click FROM ev
             |       JOIN s1 ON ev.user_id = s1.user_id
             |       WHERE event_type = 'click' AND tss >= t_signup GROUP BY 1),
             |s3 AS (SELECT ev.user_id, min(tss) AS t_purchase FROM ev
             |       JOIN s2 ON ev.user_id = s2.user_id
             |       WHERE event_type = 'purchase' AND tss >= t_click GROUP BY 1)
             |SELECT count(*) AS n_signup,
             |  count(t_click) AS n_click_after,
             |  count(t_purchase) AS n_purchase_after
             |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin)),

    Q("q86_cohort_retention",
      (s, dir) => {
        // Weekly cohort retention: users grouped by first-seen week,
        // counted per (cohort week, weeks-since) activity cell. Two
        // aggregations and one join on user_id — the classic retention
        // matrix with no row×row self-join. Weeks are epoch-day/7
        // buckets (engine-portable integer arithmetic, no WEEK()
        // locale semantics).
        val ev = t(s, dir, "events")
          .withColumn("wk",
            floor(unix_timestamp(date_trunc("day", col("ts"))) / lit(604800L))
              .cast(LongType))
          .select("user_id", "wk")
        val first = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
        ev.join(first, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_wk", "weeks_since")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(floor(CAST(EXTRACT(EPOCH FROM date_trunc('day', ts)) AS BIGINT)
             |      / 604800.0) AS BIGINT) AS wk
             |  FROM events),
             |first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
             |SELECT cohort_wk, wk - cohort_wk AS weeks_since,
             |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
             |FROM ev JOIN first ON ev.user_id = first.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q87_event_transitions",
      (s, dir) => {
        // Behavioral transition matrix: adjacent (event → next event)
        // pairs per user via one lead() window — sequence-pattern
        // analysis with a single shuffle on the key, no self-join.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tss"), col("event_id"))
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .select("user_id", "event_id", "event_type", "tss")
        ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_tss", lead(col("tss"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"),
            r4(avg((col("next_tss") - col("tss")).cast(DoubleType)))
              .as("avg_gap_sec"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |t AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER w AS to_type,
             |    lead(tss) OVER w - tss AS gap
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id))
             |SELECT from_type, to_type, count(*) AS n,
             |  floor((avg(gap)) * 10000.0 + 0.5) / 10000.0 AS avg_gap_sec
             |FROM t WHERE to_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q91_gapfill_interp",
      (s, dir) => {
        // Hourly gap-fill + linear interpolation: per-user hour grid
        // from sequence(min,max), missing buckets filled by integer
        // linear interpolation between the surrounding observations
        // (prev/next via ignoreNulls running windows — one shuffle on
        // user_id covers grid build, join and both windows). All
        // arithmetic is fixed-point long with truncating div, so
        // interpolated values are bit-identical across engines. The
        // user_id % 10 subset keeps the oracle's output tractable; the
        // Spark plan is the full-scale shape.
        val obs = t(s, dir, "events")
          .filter(col("user_id") % 10 === 0)
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .withColumn("hh", expr("tss div 3600"))
          .groupBy(col("user_id"), col("hh"))
          .agg(sum(floor(col("value") * 10000).cast(LongType)).as("v"))
        val grid = obs.groupBy("user_id")
          .agg(min("hh").as("lo"), max("hh").as("hi"))
          .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("hh"))
        val wAll = Window.partitionBy("user_id").orderBy("hh")
        val wPrev = wAll.rowsBetween(Window.unboundedPreceding, 0)
        val wNext = wAll.rowsBetween(0, Window.unboundedFollowing)
        grid.join(obs, Seq("user_id", "hh"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
          .withColumn("ph", last(when(col("v").isNotNull, col("hh")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
          .withColumn("nh", first(when(col("v").isNotNull, col("hh")),
            ignoreNulls = true).over(wNext))
          .select(col("user_id"), col("hh"),
            when(col("v").isNotNull, col("v"))
              .otherwise(col("pv") +
                expr("((nv - pv) * (hh - ph)) div (nh - ph)")).as("v_fp"),
            when(col("v").isNull, lit(1L)).otherwise(lit(0L)).as("interpolated"))
          .orderBy("user_id", "hh")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) // 3600 AS hh,
             |    value
             |  FROM events WHERE user_id % 10 = 0),
             |obs AS (
             |  SELECT user_id, hh,
             |    CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS v
             |  FROM ev GROUP BY 1, 2),
             |bounds AS (SELECT user_id, min(hh) AS lo, max(hh) AS hi FROM obs GROUP BY 1),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(lo, hi)) AS hh FROM bounds),
             |pn AS (
             |  SELECT g.user_id, g.hh, o.v,
             |    last_value(o.v IGNORE NULLS) OVER wp AS pv,
             |    last_value(CASE WHEN o.v IS NOT NULL THEN g.hh END IGNORE NULLS) OVER wp AS ph,
             |    first_value(o.v IGNORE NULLS) OVER wn AS nv,
             |    first_value(CASE WHEN o.v IS NOT NULL THEN g.hh END IGNORE NULLS) OVER wn AS nh
             |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hh = g.hh
             |  WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.hh
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wn AS (PARTITION BY g.user_id ORDER BY g.hh
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, hh,
             |  CASE WHEN v IS NOT NULL THEN v
             |       ELSE pv + ((nv - pv) * (hh - ph)) // (nh - ph) END AS v_fp,
             |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS interpolated
             |FROM pn ORDER BY user_id, hh""".stripMargin)),

    Q("q92_time_weighted_avg",
      (s, dir) => {
        // Duration-weighted mean event value per user: each observation
        // weighted by seconds until the user's next event (lead window +
        // aggregation on the SAME key → one shuffle). Long sums stay
        // exact; the single final double division is IEEE
        // correctly-rounded in both engines, so r4 hash-gates it.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .withColumn("v", floor(col("value") * 10000).cast(LongType))
        GraphOps.timeWeightedAvg(ev, col("user_id"), col("tss"),
            col("event_id"), col("v"))
          .select(col("key").as("user_id"),
            r4(col("wsum").cast(DoubleType) /
              (col("dsum").cast(DoubleType) * 10000.0)).as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss,
             |    CAST(floor(value * 10000) AS BIGINT) AS v
             |  FROM events),
             |d AS (
             |  SELECT user_id, v,
             |    lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) - tss AS dur
             |  FROM s)
             |SELECT user_id,
             |  floor((CAST(sum(v * dur) AS DOUBLE) /
             |         (CAST(sum(dur) AS DOUBLE) * 10000.0)) * 10000.0 + 0.5) / 10000.0 AS twa
             |FROM d WHERE dur IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q95_rolling_range_window",
      (s, dir) => {
        // Trailing 7-day spend per customer via a RANGE (time-based,
        // not row-based) window frame on integer epoch seconds — one
        // shuffle on the customer key; peers at the same timestamp are
        // included by RANGE semantics in both engines. Fixed-point
        // cent sums stay exact.
        val w = Window.partitionBy("o_custkey").orderBy("ots")
          .rangeBetween(-604800L, 0L)
        t(s, dir, "orders")
          .withColumn("ots", unix_timestamp(col("o_orderdate")))
          .withColumn("price_fp", floor(col("o_totalprice") * 100).cast(LongType))
          .select(col("o_orderkey"), col("o_custkey"), col("ots"),
            count(lit(1)).over(w).as("n_7d"),
            sum(col("price_fp")).over(w).as("spend_7d_fp"))
          .orderBy("o_orderkey")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS ots,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_fp
             |  FROM orders)
             |SELECT o_orderkey, o_custkey, ots,
             |  CAST(count(*) OVER w AS BIGINT) AS n_7d,
             |  CAST(sum(price_fp) OVER w AS BIGINT) AS spend_7d_fp
             |FROM o
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY ots
             |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q98_attribution",
      (s, dir) => {
        // Last-touch marketing attribution: each purchase attributed to
        // the user's latest click at-or-before it, but only inside a
        // 7-day window — the as-of join operator reused with a struct
        // value (click time + id), then a gap gate. Clicks dedup to one
        // row per (user, second) so the as-of pick is deterministic in
        // both engines.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tss"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("tss"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("tss"),
            struct(col("tss").as("ctss"), col("click_id")).as("cv"))
        EventOps.asOfJoin(purchases, clicks, "user_id", "tss", "cv")
          .withColumn("gap", col("tss") - col("asof_value.ctss"))
          .select(col("event_id"), col("user_id"), col("tss"),
            when(col("gap") <= 604800L, col("asof_value.click_id"))
              .as("click_id"),
            when(col("gap") <= 604800L, col("gap")).as("gap_sec"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |p AS (SELECT event_id, user_id, tss FROM e WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, tss, max(event_id) AS click_id
             |  FROM e WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.tss,
             |  CASE WHEN p.tss - c.tss <= 604800 THEN c.click_id END AS click_id,
             |  CASE WHEN p.tss - c.tss <= 604800 THEN p.tss - c.tss END AS gap_sec
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.tss >= c.tss
             |ORDER BY p.event_id""".stripMargin)),

    Q("q103_session_paths",
      (s, dir) => {
        // Top session paths: the first five event types of each
        // 6-hour-gap session concatenated into a path string, counted
        // corpus-wide. Sessionize + rank + per-session aggregation all
        // partition on the user key (one exchange), then a path-sized
        // count. collect_list order is NOT deterministic in a
        // distributed shuffle, so the path is rebuilt by array_sort
        // over (tss, event_id, type) structs — the same total order the
        // oracle's ORDER BY inside string_agg uses.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        val sess = EventOps.sessionize(ev, col("user_id"), col("tss"),
          col("event_id"), gapSec = 21600L)
        val w = Window.partitionBy("user_id", "session_seq")
          .orderBy("tss", "event_id")
        sess.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .groupBy("user_id", "session_seq")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("tss"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, tss, event_id, event_type,
             |    CASE WHEN lag(tss) OVER w IS NULL
             |           OR tss - lag(tss) OVER w > 21600 THEN 1 ELSE 0 END AS new_s
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
             |sess AS (
             |  SELECT user_id, tss, event_id, event_type,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tss, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM flagged),
             |r AS (
             |  SELECT user_id, session_seq, event_type, tss, event_id,
             |    row_number() OVER (PARTITION BY user_id, session_seq
             |      ORDER BY tss, event_id) AS rn
             |  FROM sess),
             |p AS (
             |  SELECT user_id, session_seq,
             |    string_agg(event_type, '>' ORDER BY tss, event_id) AS path
             |  FROM r WHERE rn <= 5 GROUP BY 1, 2)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    Q("q111_funnel_pattern",
      (s, dir) => {
        // CEP-style three-step pattern (error → click → purchase, each
        // hop within 24 h) by COMPOSING two as-of joins: purchases take
        // their latest click, surviving rows take that click's latest
        // error. Each hop is one ordered window over a union — never an
        // inequality self-join — so the pattern match stays
        // shuffle-linear in the event volume. The oracle chains two
        // native ASOF JOINs with the same gates.
        val ev = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
        def typed(tpe: String) = ev.filter(col("event_type") === tpe)
          .groupBy(col("user_id"), col("tss"))
          .agg(max(col("event_id")).as(tpe + "_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("tss"))
        val clicks = typed("click")
          .select(col("user_id"), col("tss"),
            struct(col("tss").as("ctss"), col("click_id")).as("cv"))
        val errors = typed("error")
          .select(col("user_id"), col("tss"),
            struct(col("tss").as("etss"), col("error_id")).as("ev"))
        val withClick = EventOps.asOfJoin(purchases, clicks, "user_id", "tss", "cv")
          .filter(col("tss") - col("asof_value.ctss") <= 86400L)
          .select(col("purchase_id"), col("user_id"),
            col("tss").as("ptss"), col("asof_value.ctss").as("tss"),
            col("asof_value.click_id").as("click_id"))
        EventOps.asOfJoin(withClick, errors, "user_id", "tss", "ev")
          .filter(col("tss") - col("asof_value.etss") <= 86400L)
          .select(col("purchase_id"), col("user_id"), col("click_id"),
            col("asof_value.error_id").as("error_id"),
            (col("ptss") - col("asof_value.etss")).as("funnel_sec"))
          .orderBy("purchase_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |p AS (SELECT event_id AS purchase_id, user_id, tss FROM e
             |      WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, tss, max(event_id) AS click_id
             |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
             |er AS (SELECT user_id, tss, max(event_id) AS error_id
             |       FROM e WHERE event_type = 'error' GROUP BY 1, 2),
             |pc AS (
             |  SELECT p.purchase_id, p.user_id, p.tss AS ptss,
             |    c.tss AS ctss, c.click_id
             |  FROM p ASOF LEFT JOIN c
             |    ON p.user_id = c.user_id AND p.tss >= c.tss
             |  WHERE c.click_id IS NOT NULL AND p.tss - c.tss <= 86400)
             |SELECT pc.purchase_id, pc.user_id, pc.click_id,
             |  er.error_id, pc.ptss - er.tss AS funnel_sec
             |FROM pc ASOF LEFT JOIN er
             |  ON pc.user_id = er.user_id AND pc.ctss >= er.tss
             |WHERE er.error_id IS NOT NULL AND pc.ctss - er.tss <= 86400
             |ORDER BY pc.purchase_id""".stripMargin)),

    Q("q114_weekly_churn",
      (s, dir) => {
        // Weekly churn: users active in week w but absent in w+1. The
        // distinct (user, week) activity frame self-joins shifted by
        // one week — all frames are |users × weeks|-sized, the event
        // table is touched once.
        val act = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_timestamp(date_trunc('second', ts)) div 604800").as("wk"))
          .distinct()
        val retained = act.select(col("user_id"), col("wk"))
          .join(act.select(col("user_id"), (col("wk") - 1).as("wk")),
            Seq("user_id", "wk"))
          .groupBy("wk").agg(count(lit(1)).as("n_retained"))
        act.groupBy("wk").agg(count(lit(1)).as("n_active"))
          .join(retained, Seq("wk"), "left")
          .select(col("wk"), col("n_active"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            (col("n_active") - coalesce(col("n_retained"), lit(0L)))
              .as("n_churned"))
          .orderBy("wk")
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) // 604800 AS wk
             |  FROM events),
             |ret AS (
             |  SELECT a.wk, count(*) AS n_retained
             |  FROM act a JOIN act b
             |    ON b.user_id = a.user_id AND b.wk = a.wk + 1
             |  GROUP BY 1)
             |SELECT a.wk, CAST(count(*) AS BIGINT) AS n_active,
             |  CAST(coalesce(max(r.n_retained), 0) AS BIGINT) AS n_retained,
             |  CAST(count(*) - coalesce(max(r.n_retained), 0) AS BIGINT) AS n_churned
             |FROM act a LEFT JOIN ret r ON r.wk = a.wk
             |GROUP BY a.wk ORDER BY a.wk""".stripMargin)),

    Q("q122_concurrency_timeline",
      (s, dir) => {
        // Sweep-line concurrency: per-day user sessions (first→last
        // event of the day) swept to a boundary timeline, then reduced
        // to the day's peak. Each interval lives inside its day, so
        // the running sum is a DAY-partitioned window — never a global
        // single-partition sort; the ±1 deltas aggregate to (day, ts)
        // grain first (map-side combined, deterministic sweep keys).
        val iv = t(s, dir, "events")
          .select(col("user_id"),
            unix_timestamp(date_trunc("second", col("ts"))).as("tss"),
            unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
          .groupBy("user_id", "day_epoch")
          .agg(min(col("tss")).as("s_start"), max(col("tss")).as("s_end"))
        EventOps.concurrencyProfile(iv, Seq("day_epoch"))
          .groupBy("day_epoch")
          .agg(max(col("open")).as("max_concurrent"),
            count(lit(1)).as("n_boundaries"))
          .orderBy("day_epoch")
      },
      Some("""WITH iv AS (
             |  SELECT user_id,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('day', ts)) AS BIGINT) AS day_epoch,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', min(ts))) AS BIGINT) AS s_start,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', max(ts))) AS BIGINT) AS s_end
             |  FROM events GROUP BY 1, 2),
             |d AS (
             |  SELECT day_epoch, s_start AS ts, 1 AS dd FROM iv
             |  UNION ALL SELECT day_epoch, s_end AS ts, -1 AS dd FROM iv),
             |a AS (SELECT day_epoch, ts, sum(dd) AS delta FROM d GROUP BY 1, 2),
             |r AS (SELECT day_epoch,
             |        sum(delta) OVER (PARTITION BY day_epoch ORDER BY ts) AS open
             |      FROM a)
             |SELECT day_epoch, CAST(max(open) AS BIGINT) AS max_concurrent,
             |  CAST(count(*) AS BIGINT) AS n_boundaries
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q174_event_drift_timeline",
      (s, dir) => {
        // Drift TIMELINE over the event stream: per day, the total-
        // variation distance between that day's event-type mix and the
        // all-time mix — q161's exactness discipline (per-term 1e-12
        // floors, long sums) on the time axis, over the events table.
        // The day that spikes is the day the pipeline's input changed
        // character. One (day, type) count pass; the grid is
        // days × types (both small), the report day-sized.
        val k = t(s, dir, "events")
          .select(unix_timestamp(date_trunc("day", col("ts"))).as("day"),
            col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("k"))
          .pin()
        val nd = k.groupBy("day").agg(sum("k").as("nd"))
        val c = k.groupBy("event_type").agg(sum("k").as("c"))
        val tot = c.agg(sum("c").as("n"))
        val contrib = floor(abs(
          coalesce(col("k"), lit(0L)).cast(DoubleType) / col("nd").cast(DoubleType)
            - col("c").cast(DoubleType) / col("n").cast(DoubleType))
          * 1000000000000.0).cast(LongType)
        nd.crossJoin(broadcast(c))
          .join(k, Seq("day", "event_type"), "left")
          .crossJoin(broadcast(tot))
          .select(col("day"), col("nd"), contrib.as("contrib"))
          .groupBy("day")
          .agg(max("nd").as("n_events"), sum("contrib").as("tvs"))
          .select(col("day"), col("n_events"),
            expr("tvs div 200000000").as("tv_fp"))
          .orderBy("day")
      },
      Some("""WITH ev AS (
             |  SELECT CAST(EXTRACT(EPOCH FROM date_trunc('day', ts)) AS BIGINT) AS day,
             |    event_type
             |  FROM events),
             |k AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS k
             |  FROM ev GROUP BY 1, 2),
             |nd AS (SELECT day, CAST(sum(k) AS BIGINT) AS nd FROM k GROUP BY 1),
             |c AS (SELECT event_type, CAST(sum(k) AS BIGINT) AS c FROM k GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
             |g AS (
             |  SELECT nd.day, nd.nd, c.c, k.k
             |  FROM nd CROSS JOIN c
             |  LEFT JOIN k ON k.day = nd.day AND k.event_type = c.event_type),
             |con AS (
             |  SELECT day, nd,
             |    CAST(floor(abs(CAST(COALESCE(k, 0) AS DOUBLE) / CAST(nd AS DOUBLE)
             |      - CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000000.0) AS BIGINT) AS contrib
             |  FROM g CROSS JOIN tot)
             |SELECT day, CAST(max(nd) AS BIGINT) AS n_events,
             |  CAST(sum(contrib) // 200000000 AS BIGINT) AS tv_fp
             |FROM con GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q190_burst_detection",
      (s, dir) => {
        // Rate-burst detection over the event stream: hours where a
        // type's count exceeds 1.5× its trailing-24h hourly mean (with
        // an absolute floor of 3 events — a 2-on-a-baseline-of-1 is
        // noise, not a burst). The comparison is pure integer cross-
        // multiplication (2·24·n > 3·Σtrail), no division until the
        // reported ratio. The trailing window runs over a DENSE
        // per-type hour grid — without densification, silent hours
        // vanish and a row-based window silently stretches over days,
        // understating the baseline exactly when activity is sparse.
        // Scale shape: one (hour, type) count pass (map-side
        // combined); the grid is types × hours (explode of one
        // broadcast bounds row — tiny at any corpus size); the window
        // partitions BY TYPE over the grid, which is time-range-sized,
        // not event-sized. Full-window rows only (trail_n = 24), so
        // the first day warms up silently.
        val ev = t(s, dir, "events")
          .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
            col("event_type"))
          .groupBy("hour_ts", "event_type").agg(count(lit(1)).as("n_events"))
          .pin()
        val bounds = ev.agg(min("hour_ts").as("h0"), max("hour_ts").as("h1"))
        val grid = ev.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hour_ts"))
        val dense = grid.join(ev, Seq("event_type", "hour_ts"), "left")
          .na.fill(0L, Seq("n_events"))
        val w = Window.partitionBy("event_type").orderBy("hour_ts")
          .rowsBetween(-24, -1)
        dense
          .withColumn("trail_sum", coalesce(sum("n_events").over(w), lit(0L)))
          .withColumn("trail_n", count(lit(1)).over(w))
          .filter(col("trail_n") === 24 &&
            col("n_events") * 2 * 24 > col("trail_sum") * 3 &&
            col("n_events") >= 3)
          .select(col("event_type"), col("hour_ts"), col("n_events"),
            col("trail_sum"),
            expr("(10000 * 24 * n_events) div greatest(1, trail_sum)")
              .as("burst_ratio_fp"))
          .orderBy("event_type", "hour_ts")
      },
      Some("""WITH ev AS (
             |  SELECT CAST(EXTRACT(EPOCH FROM date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
             |    event_type
             |  FROM events),
             |k AS (SELECT hour_ts, event_type, CAST(count(*) AS BIGINT) AS n_events
             |  FROM ev GROUP BY 1, 2),
             |b AS (SELECT min(hour_ts) AS h0, max(hour_ts) AS h1 FROM k),
             |ty AS (SELECT DISTINCT event_type FROM k),
             |grid AS (
             |  SELECT event_type, unnest(generate_series(h0, h1, 3600)) AS hour_ts
             |  FROM ty CROSS JOIN b),
             |dense AS (
             |  SELECT g.event_type, g.hour_ts, coalesce(k.n_events, 0) AS n_events
             |  FROM grid g LEFT JOIN k
             |    ON k.event_type = g.event_type AND k.hour_ts = g.hour_ts),
             |wnd AS (
             |  SELECT event_type, hour_ts, n_events,
             |    sum(n_events) OVER (PARTITION BY event_type ORDER BY hour_ts
             |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
             |    count(*) OVER (PARTITION BY event_type ORDER BY hour_ts
             |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n
             |  FROM dense)
             |SELECT event_type, hour_ts, n_events,
             |  CAST(coalesce(trail_sum, 0) AS BIGINT) AS trail_sum,
             |  CAST((10000 * 24 * n_events) // greatest(1, trail_sum) AS BIGINT) AS burst_ratio_fp
             |FROM wnd
             |WHERE trail_n = 24 AND n_events * 2 * 24 > trail_sum * 3 AND n_events >= 3
             |ORDER BY event_type, hour_ts""".stripMargin)),
  )
}
