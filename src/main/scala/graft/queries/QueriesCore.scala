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

/** Reference-parity core: TPC-H-shaped analytics, dashboard profiles,
  * histograms, top-N, crossfilter — SURVEY §2 P/J/A/W/O/U/F/V rows.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesCore {

  val qs: Seq[Q] = Seq(

    Q("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            rnd(sum(col("l_quantity")), 2).as("sum_qty"),
            rnd(sum(col("l_extendedprice")), 2).as("sum_price"),
            rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            rnd(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
             |  floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price,
             |  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
             |  floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
             |  count(*) AS cnt
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q02_column_stats",
      (s, dir) => StatsOps.columnStats(t(s, dir, "events"), col("value"))
        .select(r4(col("min_value")).as("min_value"),
          r4(col("max_value")).as("max_value"),
          col("cnt"), col("null_cnt")),
      Some("""SELECT floor((min(value)) * 10000.0 + 0.5) / 10000.0 AS min_value,
             |  floor((max(value)) * 10000.0 + 0.5) / 10000.0 AS max_value,
             |  count(*) AS cnt,
             |  count(CASE WHEN value IS NULL THEN 1 END) AS null_cnt
             |FROM events WHERE value IS NOT NULL""".stripMargin)),

    Q("q03_availability",
      (s, dir) => StatsOps.availabilityCount(t(s, dir, "events"), col("value"), col("ts")),
      Some("SELECT count(*) AS cnt FROM events " +
        "WHERE value IS NOT NULL AND value != 0 AND ts IS NOT NULL")),

    Q("q04_hourly_profile",
      (s, dir) => TimeSeriesOps.timeBucketAgg(t(s, dir, "events"), col("ts"), col("value"))
        .select(col("bucket_epoch"), r4(col("avg_value")).as("avg_value"),
          r4(col("min_value")).as("min_value"), r4(col("max_value")).as("max_value"),
          col("cnt")),
      Some("""SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch,
             |  floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             |  floor((min(value)) * 10000.0 + 0.5) / 10000.0 AS min_value,
             |  floor((max(value)) * 10000.0 + 0.5) / 10000.0 AS max_value,
             |  count(*) AS cnt
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q05_percentile_hourly",
      (s, dir) => TimeSeriesOps.percentileFilteredHourly(
          t(s, dir, "events"), col("ts"), col("value"), 0.01, 0.99)
        .select(col("bucket_epoch"), r4(col("avg_value")).as("avg_value"),
          r4(col("min_value")).as("min_value"), r4(col("max_value")).as("max_value"),
          col("cnt")),
      Some("""WITH p AS (
             |  SELECT percentile_cont(0.01) WITHIN GROUP (ORDER BY value) AS p_low,
             |         percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS p_high
             |  FROM events WHERE value IS NOT NULL)
             |SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch,
             |  floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             |  floor((min(value)) * 10000.0 + 0.5) / 10000.0 AS min_value,
             |  floor((max(value)) * 10000.0 + 0.5) / 10000.0 AS max_value,
             |  count(*) AS cnt
             |FROM events, p
             |WHERE value IS NOT NULL AND value BETWEEN p_low AND p_high
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q06_iqr_filtered",
      (s, dir) => TimeSeriesOps.iqrFiltered(t(s, dir, "events"), col("value"))
        .agg(count(lit(1)).as("cnt"), r4(avg(col("value"))).as("avg_value")),
      Some("""WITH q AS (
             |  SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
             |         percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
             |  FROM events WHERE value IS NOT NULL)
             |SELECT count(*) AS cnt, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
             |FROM events, q
             |WHERE value IS NOT NULL
             |  AND value BETWEEN q1 - 1.5*(q3-q1) AND q3 + 1.5*(q3-q1)""".stripMargin)),

    Q("q07_smart_histogram",
      (s, dir) => HistogramOps.smartHistogram(t(s, dir, "events"), col("value"), 20)
        .select(col("bin_index"), col("cnt"), r4(col("avg_value")).as("avg_value"),
          r4(col("bin_start")).as("bin_start")),
      Some("""WITH r AS (
             |  SELECT min(value) AS mn, max(value) AS mx FROM events WHERE value IS NOT NULL),
             |w AS (SELECT mn, mx, (mx - mn) / 20.0 AS bw FROM r),
             |b AS (
             |  SELECT CAST(CASE WHEN bw = 0 THEN 0
             |              ELSE least(19, floor((value - mn) / bw)) END AS BIGINT) AS bin_index,
             |         value, mn, bw
             |  FROM events, w WHERE value IS NOT NULL)
             |SELECT bin_index, count(*) AS cnt, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             |  floor((min(mn + bin_index * bw)) * 10000.0 + 0.5) / 10000.0 AS bin_start
             |FROM b GROUP BY bin_index ORDER BY bin_index""".stripMargin)),

    Q("q08_series_histogram",
      (s, dir) => HistogramOps.seriesHistogram(t(s, dir, "events"), col("value"), 20),
      Some("""WITH r AS (
             |  SELECT min(value) AS mn, max(value) AS mx FROM events WHERE value IS NOT NULL),
             |c AS (
             |  SELECT CAST(floor((value - mn) / ((mx - mn) / 20.0)) AS BIGINT) AS bin_index,
             |         count(*) AS cnt
             |  FROM events, r
             |  WHERE value IS NOT NULL AND value >= mn AND value < mx
             |  GROUP BY 1)
             |SELECT bin_index, cnt FROM c WHERE bin_index <> 19
             |UNION ALL
             |SELECT 19 AS bin_index, COALESCE((SELECT cnt FROM c WHERE bin_index = 19), 0) AS cnt
             |ORDER BY bin_index""".stripMargin)),

    // ── Category counts / ranking / top-N (A9/W1/O3/O4) ───────────────,

    Q("q09_category_counts",
      (s, dir) => TopNOps.categoryCounts(t(s, dir, "events"), col("event_type")),
      Some("""SELECT event_type AS category, count(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY cnt DESC, category""".stripMargin)),

    Q("q10_ranked_counts",
      (s, dir) => TopNOps.rankedCounts(t(s, dir, "events"), col("event_type")),
      Some("""SELECT event_type AS category, count(*) AS cnt,
             |  CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) AS INT) AS rnk
             |FROM events GROUP BY event_type ORDER BY rnk""".stripMargin)),

    Q("q11_topn_others",
      (s, dir) => TopNOps.topNWithOthers(t(s, dir, "events"), col("event_type"), 3),
      Some("""WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
             |ranked AS (
             |  SELECT event_type, cnt,
             |    row_number() OVER (ORDER BY cnt DESC, event_type) AS rnk
             |  FROM c)
             |SELECT CASE WHEN rnk <= 3 THEN event_type ELSE 'Others' END AS category,
             |  CAST(sum(cnt) AS BIGINT) AS total
             |FROM ranked GROUP BY 1
             |ORDER BY CASE WHEN category = 'Others' THEN 1 ELSE 0 END, total DESC, category""".stripMargin)),

    // ── Filters and derived columns (P2/P6/P7/F*) ─────────────────────,

    Q("q12_time_range_probe",
      (s, dir) => StatsOps.timeRangeProbe(t(s, dir, "events"), col("ts")),
      Some("""SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('second', min(ts))) AS BIGINT) AS min_epoch,
             |  CAST(EXTRACT(EPOCH FROM date_trunc('second', max(ts))) AS BIGINT) AS max_epoch,
             |  count(*) AS cnt
             |FROM events""".stripMargin)),

    // ── Time-bucket aggregation (A3/A4/A5/A6) ────────────────────────,

    Q("q13_time_filter",
      (s, dir) => t(s, dir, "events")
        .filter(col("ts").between(lit("2024-01-02 00:00:00"), lit("2024-01-05 00:00:00")))
        .agg(count(lit(1)).as("cnt"), r4(avg(col("value"))).as("avg_value")),
      Some("""SELECT count(*) AS cnt, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
             |FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00'
             |             AND TIMESTAMP '2024-01-05 00:00:00'""".stripMargin)),

    Q("q14_user_durations",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("duration_seconds"),
          count(lit(1)).as("cnt"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(EXTRACT(EPOCH FROM date_trunc('second', max(ts)))
             |     - EXTRACT(EPOCH FROM date_trunc('second', min(ts))) AS BIGINT) AS duration_seconds,
             |  count(*) AS cnt
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("q15_granular_profile",
      (s, dir) => TimeSeriesOps.granularProfile(t(s, dir, "events"), col("ts"), col("value"), "day")
        .select(col("bucket_epoch"), r4(col("avg_value")).as("avg_value"),
          r4(col("stddev_value")).as("stddev_value"), col("cnt"),
          r4(col("q1")).as("q1"), r4(col("median")).as("median"), r4(col("q3")).as("q3")),
      Some("""SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('day', ts)) AS BIGINT) AS bucket_epoch,
             |  floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             |  floor((stddev_samp(value)) * 10000.0 + 0.5) / 10000.0 AS stddev_value,
             |  count(*) AS cnt,
             |  floor((percentile_cont(0.25) WITHIN GROUP (ORDER BY value)) * 10000.0 + 0.5) / 10000.0 AS q1,
             |  floor((percentile_cont(0.5) WITHIN GROUP (ORDER BY value)) * 10000.0 + 0.5) / 10000.0 AS median,
             |  floor((percentile_cont(0.75) WITHIN GROUP (ORDER BY value)) * 10000.0 + 0.5) / 10000.0 AS q3
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Histograms (A7/A8) ────────────────────────────────────────────,

    Q("q16_ratio_guarded",
      (s, dir) => t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          r4(DerivedOps.clip(
            coalesce(
              sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)) /
                nullif(sum(col("value")), lit(0.0)) * 100.0,
              lit(0.0)),
            0.0, 100.0)).as("purchase_pct"),
          count(lit(1)).as("cnt"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  floor((least(greatest(coalesce(
             |    sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
             |      / nullif(sum(value), 0) * 100, 0), 0), 100)) * 10000.0 + 0.5) / 10000.0 AS purchase_pct,
             |  count(*) AS cnt
             |FROM events WHERE value IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── Window lag/diff rates (W2/W3 + A10 rollup) ────────────────────,

    Q("q17_dim_join_rollup",
      (s, dir) => {
        // Small dims are broadcast explicitly: at 100 TB the fact side
        // streams map-side with zero shuffle for the joins.
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val rg = broadcast(t(s, dir, "region"))
        c.join(n, col("c_nationkey") === col("n_nationkey"))
          .join(rg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("cnt"), rnd(sum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS cnt,
             |  floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    Q("q18_fact_dim_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = broadcast(t(s, dir, "customer"))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), rnd(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy("c_mktsegment", "o_orderpriority")
      },
      Some("""SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
             |  floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment, o_orderpriority
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    Q("q19_unpivot_union",
      (s, dir) => {
        // U1 — wide→long fan-out + append union (hpc_transformers.py:330).
        val li = t(s, dir, "lineitem")
        val a = li.select(lit("price").as("metric"), col("l_extendedprice").as("val"))
        val b = li.select(lit("discount").as("metric"), col("l_discount").as("val"))
        a.unionByName(b)
          .groupBy("metric")
          .agg(count(lit(1)).as("cnt"), rnd(sum(col("val")), 2).as("total"))
          .orderBy("metric")
      },
      Some("""SELECT metric, count(*) AS cnt, floor((sum(val)) * 100.0 + 0.5) / 100.0 AS total
             |FROM (
             |  SELECT 'price' AS metric, l_extendedprice AS val FROM lineitem
             |  UNION ALL
             |  SELECT 'discount' AS metric, l_discount AS val FROM lineitem
             |)
             |GROUP BY metric ORDER BY metric""".stripMargin)),

    Q("q20_lag_rates",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tss"), col("event_id"))
        val d = t(s, dir, "events")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .withColumn("prev_v", lag(col("value"), 1).over(w))
          .withColumn("prev_t", lag(col("tss"), 1).over(w))
          .withColumn("dt", (col("tss") - col("prev_t")).cast(DoubleType))
          .withColumn("rate",
            when(col("prev_v").isNull, lit(0.0))
              .otherwise(when(col("dt") >= 0.1 && (col("value") - col("prev_v")) >= 0,
                (col("value") - col("prev_v")) / col("dt")).otherwise(lit(0.0))))
        d.select(col("event_id"), col("user_id"), r4(col("rate")).as("rate"))
          .orderBy("event_id")
      },
      Some("""WITH s AS (
             |  SELECT event_id, user_id, value,
             |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
             |  FROM events),
             |lagged AS (
             |  SELECT event_id, user_id, value, tss,
             |    lag(value) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_v,
             |    lag(tss)   OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_t
             |  FROM s)
             |SELECT event_id, user_id,
             |  floor((CASE WHEN prev_v IS NULL THEN 0
             |             WHEN (tss - prev_t) >= 0.1 AND (value - prev_v) >= 0
             |             THEN (value - prev_v) / (tss - prev_t)
             |             ELSE 0 END) * 10000.0 + 0.5) / 10000.0 AS rate
             |FROM lagged ORDER BY event_id""".stripMargin)),

    // ── Scalar-function suite (F6-F14) + clamp chain (§7.4.7) ─────────,

    Q("q21_scalar_suite",
      (s, dir) => t(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(lit("doc-"), col("lang"), lit("-"), col("doc_id").cast("string")).as("tag"),
          regexp_replace(col("source"), "src", "SOURCE").as("src_norm"),
          when(col("n_chars") > 300, "long").otherwise("short").as("size_class"),
          r4(DerivedOps.clip(col("n_chars").cast(DoubleType) / nullif(lit(100.0), lit(0.0)), 0.0, 100.0)).as("clipped"),
          floor(col("n_chars") / 100.0).cast(LongType).as("bucket"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  concat('doc-', lang, '-', CAST(doc_id AS VARCHAR)) AS tag,
             |  regexp_replace(source, 'src', 'SOURCE', 'g') AS src_norm,
             |  CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS size_class,
             |  floor((least(greatest(CAST(n_chars AS DOUBLE) / nullif(100.0, 0), 0), 100)) * 10000.0 + 0.5) / 10000.0 AS clipped,
             |  CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q22_clamp_chain",
      (s, dir) => t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("total"),
          (col("l_extendedprice") * col("l_discount")).as("free"),
          (col("l_extendedprice") * col("l_tax")).as("pages"))
        .withColumn("free2", least(col("free"), col("total")))
        .withColumn("used", greatest(col("total") - col("free2"), lit(0.0)))
        .withColumn("pages2", least(col("pages"), least(col("total"), col("used"))))
        .withColumn("minus_cache", greatest(col("used") - col("pages2"), lit(0.0)))
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("used")).as("used"), r4(col("minus_cache")).as("minus_cache"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_linenumber,
             |    l_extendedprice AS total,
             |    l_extendedprice * l_discount AS free,
             |    l_extendedprice * l_tax AS pages
             |  FROM lineitem),
             |step AS (
             |  SELECT l_orderkey, l_linenumber, total, pages,
             |    greatest(total - least(free, total), 0) AS used
             |  FROM base)
             |SELECT l_orderkey, l_linenumber,
             |  floor((used) * 10000.0 + 0.5) / 10000.0 AS used,
             |  floor((greatest(used - least(pages, least(total, used)), 0)) * 10000.0 + 0.5) / 10000.0 AS minus_cache
             |FROM step ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ── Projection suite (P1/P4/P5/O5) ───────────────────────────────,

    Q("q23_projection_suite",
      (s, dir) => t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          DerivedOps.castDouble(col("l_linenumber")).as("linenumber_double"),
          r4(DerivedOps.scaleUp(col("l_discount"))).as("discount_scaled"),
          col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(l_linenumber AS DOUBLE) AS linenumber_double,
             |  floor((l_discount * 1000000.0) * 10000.0 + 0.5) / 10000.0 AS discount_scaled,
             |  l_returnflag
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    // ── Interactive: distinct menu + crossfilter composition (V3/V5) ──,

    Q("q24_distinct_menu",
      (s, dir) => graft.interactive.Crossfilter.distinctMenu(
        t(s, dir, "events"), "event_type"),
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")),

    Q("q25_crossfilter",
      (s, dir) => {
        val cf = graft.interactive.Crossfilter.empty
          .withPredicate("hist", col("value") > 50)
          .withPredicate("menu", col("event_type") === "click")
          .withPredicate("brush", graft.interactive.Crossfilter.intervalBrush(
            col("ts"), "2024-01-02 00:00:00", "2024-01-10 00:00:00"))
        // the "line" chart sees all three other predicates
        cf(t(s, dir, "events"), "line")
          .agg(count(lit(1)).as("cnt"), r4(avg(col("value"))).as("avg_value"))
      },
      Some("""SELECT count(*) AS cnt, floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
             |FROM events
             |WHERE value > 50 AND event_type = 'click'
             |  AND ts BETWEEN TIMESTAMP '2024-01-02 00:00:00'
             |             AND TIMESTAMP '2024-01-10 00:00:00'""".stripMargin)),

    // ── Archive grouping (B10: monthly + quarterly rollups) ──────────,

    Q("q26_demo_generator",
      (s, dir) => {
        // Mirrors schema.ts:271-310's generate_series + random() demo
        // table, but partition-independent: pseudo-randoms derive from
        // PortableHash over (id, salt) so the output is identical on any
        // cluster AND reproducible in DuckDB — the generator itself is
        // under the oracle gate (was rows-only with xxhash64 randoms).
        val n = 500
        def u(salt: Int): Column =
          (PortableHash.base(concat(col("id").cast("string"), lit(":" + salt)))
            % 1000000L).cast(DoubleType) / 1e6
        s.range(n)
          .select(
            col("id").as("jid"),
            (lit(1704067200L) + (u(1) * 86400 * 30).cast(LongType)).as("time_epoch"),
            (u(2) * 9 + 1).cast(LongType).as("nhosts"),
            (u(3) * 31 + 1).cast(LongType).as("ncores"),
            concat(lit("demo-account-"), (u(4) * 100).cast(LongType).cast("string")).as("account"),
            when(u(5) < 0.9, "0").otherwise("1").as("exitcode"),
            rnd(u(6) * 100, 4).as("value_cpuuser"),
            rnd(u(7) * 16000, 4).as("value_memused"))
          .orderBy("jid")
      },
      {
        def uSql(salt: Int): String =
          s"(((('0x' || substr(md5(id::VARCHAR || ':$salt'), 1, 15))::BIGINT % 2147483647) % 1000000) / 1e6)"
        Some(s"""WITH ids AS (SELECT unnest(generate_series(0, 499)) AS id)
               |SELECT id AS jid,
               |  CAST(1704067200 + floor(${uSql(1)} * 86400 * 30) AS BIGINT) AS time_epoch,
               |  CAST(floor(${uSql(2)} * 9 + 1) AS BIGINT) AS nhosts,
               |  CAST(floor(${uSql(3)} * 31 + 1) AS BIGINT) AS ncores,
               |  'demo-account-' || CAST(CAST(floor(${uSql(4)} * 100) AS BIGINT) AS VARCHAR) AS account,
               |  CASE WHEN ${uSql(5)} < 0.9 THEN '0' ELSE '1' END AS exitcode,
               |  floor((${uSql(6)} * 100) * 10000.0 + 0.5) / 10000.0 AS value_cpuuser,
               |  floor((${uSql(7)} * 16000) * 10000.0 + 0.5) / 10000.0 AS value_memused
               |FROM ids ORDER BY jid""".stripMargin)
      }),

    // ── Text analysis (training-pipeline ext) ─────────────────────────,

    Q("q27_archive_grouping",
      (s, dir) => t(s, dir, "events")
        .groupBy(
          date_format(col("ts"), "yyyy-MM").as("month"),
          quarter(col("ts")).as("qtr"))
        .agg(count(lit(1)).as("cnt"), rnd(sum(col("value")), 2).as("total_value"))
        .orderBy("month"),
      Some("""SELECT strftime(ts, '%Y-%m') AS month,
             |  CAST(quarter(ts) AS INT) AS qtr,
             |  count(*) AS cnt, floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY month""".stripMargin)),

    // ── Demo-data generator (S9; deterministic hash-based "random") ───,

    Q("q42_shipping_priority",
      (s, dir) => {
        // TPC-H Q3 shape: 3-way join, date band, top-10 revenue.
        val c = broadcast(t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01"))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"),
            unix_timestamp(col("o_orderdate")).as("orderdate_epoch"))
          .agg(rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS orderdate_epoch,
             |  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    Q("q43_regional_revenue",
      (s, dir) => {
        // TPC-H Q5 shape: 6-way join (3 broadcast dims), revenue by nation.
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val li = t(s, dir, "lineitem")
        val sup = broadcast(t(s, dir, "supplier"))
        val n = broadcast(t(s, dir, "nation"))
        val rg = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(rg, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some("""SELECT n_name,
             |  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // ── Stats probes (A1/A2/A12) ──────────────────────────────────────,

    Q("q45_daily_profile_nyc",
      (s, dir) => TimeSeriesOps.timeBucketAgg(t(s, dir, "events"),
          col("ts"), col("value"), "day", tz = "America/New_York")
        .select(col("bucket_epoch"), r4(col("avg_value")).as("avg_value"),
          r4(col("min_value")).as("min_value"), r4(col("max_value")).as("max_value"),
          col("cnt")),
      Some("""SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('day',
             |    timezone('America/New_York', timezone('UTC', ts)))) AS BIGINT) AS bucket_epoch,
             |  floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             |  floor((min(value)) * 10000.0 + 0.5) / 10000.0 AS min_value,
             |  floor((max(value)) * 10000.0 + 0.5) / 10000.0 AS max_value,
             |  count(*) AS cnt
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Event-stream operators: sessionization, as-of join, interval
    //    overlap (EventOps; the classic telemetry/clickstream trio) ─────,
  )
}
