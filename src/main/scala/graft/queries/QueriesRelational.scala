package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}

import graft.analytics._
import graft.etl.{ChangeCapture, RawReaders}
import graft.ext._
import graft.QueryCaches.Pinned
import graft.QueryHelpers._

/** Warehouse-relational ops: pivot/rollup/cube, SCD2, upserts,
  * snapshots, referential audits, sketches (CMS/HLL), layout, skew.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesRelational {

  val qs: Seq[Q] = Seq(

    Q("q77_json_props",
      (s, dir) => {
        // Semi-structured column path: typed from_json parse of the
        // event props payload, then a plain relational rollup — the
        // schema is declared, so Catalyst prunes and the parse is a
        // narrow projection (no inference pass over the data).
        val ev = t(s, dir, "events").withColumn("k",
          from_json(col("props"), new StructType().add("k", LongType))
            .getField("k"))
        ev.groupBy("k")
          .agg(count(lit(1)).as("n"), r4(avg(col("value"))).as("avg_value"))
          .orderBy("k")
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  count(*) AS n,
             |  floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q78_pivot",
      (s, dir) => {
        // Long→wide pivot (the inverse of q19's U1 unpivot) with the
        // value list DECLARED — no extra distinct pass over the data,
        // and the plan is a single hash aggregation with one pivot
        // column per declared type.
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q79_rollup",
      (s, dir) => {
        // Hierarchical OLAP rollup: revenue at (region, nation), per
        // region, and grand total in ONE aggregation pass (Spark
        // expands grouping sets map-side — no three-scan union).
        // grouping() flags disambiguate real NULLs from subtotal rows.
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        rev.rollup(col("r_name"), col("n_name"))
          .agg(rnd(sum(col("o_totalprice")), 2).as("revenue"),
            count(lit(1)).as("n_orders"),
            grouping(col("r_name")).cast(LongType).as("g_region"),
            grouping(col("n_name")).cast(LongType).as("g_nation"))
          .orderBy(col("g_region"), col("g_nation"), col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue,
             |  count(*) AS n_orders,
             |  CAST(grouping(r_name) AS BIGINT) AS g_region,
             |  CAST(grouping(n_name) AS BIGINT) AS g_nation
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY g_region, g_nation, r_name, n_name""".stripMargin)),

    Q("q80_decile_profile",
      (s, dir) => {
        // Ranking-window family (ntile / percent_rank / cume_dist) as a
        // per-priority decile profile. The window partitions on the
        // group key — one priority's orders per frame, never a global
        // single-partition sort; GLOBAL quantiles at scale go through
        // the percentile-bounds pattern (q05/q06) instead.
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("decile", ntile(10).over(w).cast(LongType))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .groupBy(col("o_orderpriority"), col("decile"))
          .agg(count(lit(1)).as("n"),
            rnd(min(col("pr")), 6).as("min_pr"),
            rnd(max(col("cd")), 6).as("max_cd"),
            rnd(sum(col("o_totalprice")), 2).as("sum_price"))
          .orderBy("o_orderpriority", "decile")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority, o_totalprice,
             |    ntile(10) OVER w AS decile,
             |    percent_rank() OVER w AS pr,
             |    cume_dist() OVER w AS cd
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice, o_orderkey))
             |SELECT o_orderpriority, CAST(decile AS BIGINT) AS decile,
             |  count(*) AS n,
             |  floor(min(pr) * 1000000.0 + 0.5) / 1000000.0 AS min_pr,
             |  floor(max(cd) * 1000000.0 + 0.5) / 1000000.0 AS max_cd,
             |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS sum_price
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q81_upsert_latest_wins",
      (s, dir) => {
        // MERGE-style upsert without a table format: base ∪ updates,
        // latest version wins per key (deterministic tiebreak), one
        // shuffle on the key. The "updates" batch is derived
        // deterministically (every 100th event re-lands with a
        // corrected value and a higher version).
        val base = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            lit(0L).as("version"))
        val updates = base.filter(pmod(col("event_id"), lit(100)) === 0)
          .select(col("event_id"), col("user_id"),
            (col("value") * 2).as("value"), lit(1L).as("version"))
        val w = Window.partitionBy(col("event_id"))
          .orderBy(col("version").desc)
        val merged = base.unionByName(updates)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        merged.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), rnd(sum(col("value")), 2).as("sum_value"),
            sum(col("version")).as("n_updated"))
          .orderBy("user_id")
      },
      Some("""WITH base AS (
             |  SELECT event_id, user_id, value, 0 AS version FROM events),
             |updates AS (
             |  SELECT event_id, user_id, value * 2 AS value, 1 AS version
             |  FROM events WHERE event_id % 100 = 0),
             |merged AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_id
             |    ORDER BY version DESC) AS rn
             |  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates))
             |SELECT user_id, count(*) AS n,
             |  floor((sum(value)) * 100.0 + 0.5) / 100.0 AS sum_value,
             |  CAST(sum(version) AS BIGINT) AS n_updated
             |FROM merged WHERE rn = 1
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q83_referential_audit",
      (s, dir) => {
        // Data-quality audit: orphan counts across the star schema's
        // FK edges, each a broadcast/shuffled LEFT ANTI join (the
        // dimension side is the smaller key set — at scale the anti
        // join builds on distinct keys, never fact×dim pairs).
        def orphans(name: String, fact: DataFrame, fk: String,
                    dim: DataFrame, pk: String): DataFrame =
          fact.join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(name).as("edge"), col("n_orphans"))
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val p = t(s, dir, "part")
        val su = t(s, dir, "supplier")
        orphans("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
          .unionByName(orphans("lineitem->part", li, "l_partkey", p, "p_partkey"))
          .unionByName(orphans("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"))
          .unionByName(orphans("orders->customer", o, "o_custkey", c, "c_custkey"))
          .orderBy("edge")
      },
      Some("""SELECT 'lineitem->orders' AS edge, count(*) AS n_orphans
             |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
             |UNION ALL
             |SELECT 'lineitem->part', count(*) FROM lineitem
             |  WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
             |UNION ALL
             |SELECT 'lineitem->supplier', count(*) FROM lineitem
             |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
             |UNION ALL
             |SELECT 'orders->customer', count(*) FROM orders
             |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
             |ORDER BY edge""".stripMargin)),

    Q("q84_table_profile",
      (s, dir) => {
        // One-pass multi-column profile (nulls / distinct / min / max
        // per column): ALL stats come out of a single aggregation —
        // one scan, map-side combined — then pivot to long form for a
        // stable (column, stat) output. approx_count_distinct is the
        // scale path; here exact distinct keeps the oracle.
        val li = t(s, dir, "lineitem")
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val aggs = cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
            countDistinct(col(c)).as(s"${c}__distinct"),
            rnd(min(col(c)), 4).as(s"${c}__min"),
            rnd(max(col(c)), 4).as(s"${c}__max"))
        }
        val wide = li.agg(aggs.head, aggs.tail: _*)
        val long = cols.map { c =>
          wide.select(lit(c).as("column_name"),
            col(s"${c}__nulls").as("n_nulls"),
            col(s"${c}__distinct").as("n_distinct"),
            col(s"${c}__min").cast(DoubleType).as("min_v"),
            col(s"${c}__max").cast(DoubleType).as("max_v"))
        }.reduce(_ unionByName _)
        long.orderBy("column_name")
      },
      Some("""WITH w AS (
             |  SELECT
             |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
             |    CAST(count(DISTINCT l_quantity) AS BIGINT) AS q_distinct,
             |    floor(min(l_quantity) * 10000.0 + 0.5) / 10000.0 AS q_min,
             |    floor(max(l_quantity) * 10000.0 + 0.5) / 10000.0 AS q_max,
             |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
             |    CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS p_distinct,
             |    floor(min(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS p_min,
             |    floor(max(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS p_max,
             |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
             |    CAST(count(DISTINCT l_discount) AS BIGINT) AS d_distinct,
             |    floor(min(l_discount) * 10000.0 + 0.5) / 10000.0 AS d_min,
             |    floor(max(l_discount) * 10000.0 + 0.5) / 10000.0 AS d_max
             |  FROM lineitem)
             |SELECT 'l_discount' AS column_name, d_nulls AS n_nulls,
             |  d_distinct AS n_distinct, d_min AS min_v, d_max AS max_v FROM w
             |UNION ALL
             |SELECT 'l_extendedprice', p_nulls, p_distinct, p_min, p_max FROM w
             |UNION ALL
             |SELECT 'l_quantity', q_nulls, q_distinct, q_min, q_max FROM w
             |ORDER BY column_name""".stripMargin)),

    Q("q93_min_cost_supplier",
      (s, dir) => {
        // Cheapest observed offer per part (TPC-H Q2 shape): per-
        // (part,supplier) min price, then a per-part window top-1 with
        // deterministic supplier tiebreak, enriched through two
        // BROADCAST dimension joins — the big side never reshuffles for
        // the dims. Prices in fixed-point cents.
        val offers = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            floor(col("l_extendedprice") * 100).cast(LongType).as("price_fp"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min("price_fp").as("offer_fp"))
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("offer_fp"), col("l_suppkey"))
        offers.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .join(broadcast(t(s, dir, "part").select("p_partkey", "p_name")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"), col("offer_fp"))
          .orderBy("p_partkey")
      },
      Some("""WITH offers AS (
             |  SELECT l_partkey, l_suppkey,
             |    CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS offer_fp
             |  FROM lineitem GROUP BY 1, 2),
             |best AS (
             |  SELECT l_partkey, l_suppkey, offer_fp,
             |    row_number() OVER (PARTITION BY l_partkey
             |      ORDER BY offer_fp, l_suppkey) AS rn
             |  FROM offers)
             |SELECT p.p_partkey, p.p_name, s.s_name, b.offer_fp
             |FROM best b
             |JOIN part p ON p.p_partkey = b.l_partkey
             |JOIN supplier s ON s.s_suppkey = b.l_suppkey
             |WHERE b.rn = 1 ORDER BY p.p_partkey""".stripMargin)),

    Q("q96_scd2_intervals",
      (s, dir) => {
        // SCD2 dimension build from an event change log: per-user state
        // history with consecutive repeats collapsed, half-open validity
        // windows, NULL open end + is_current flag. Two windows + a
        // filter, all on the SAME key → the plan re-sorts after the
        // change filter but never reshuffles.
        eventStateIntervals(s, dir)
          .withColumn("is_current",
            when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)))
          .select("user_id", "version", "state", "valid_from", "valid_to",
            "is_current")
          .orderBy("user_id", "version")
      },
      Some(s"""WITH $scd2OracleCtes
             |SELECT user_id, version, state, valid_from, valid_to,
             |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM iv ORDER BY user_id, version""".stripMargin)),

    Q("q97_cube_totals",
      (s, dir) => {
        // Two-dimension CUBE (the grouping-sets sibling of q79's
        // rollup): leaf, both one-dim margins, and grand total in ONE
        // Expand + map-side-combined hash aggregation — never a union
        // of four scans. grouping() flags disambiguate subtotal NULLs.
        t(s, dir, "lineitem")
          .withColumn("qty_fp", floor(col("l_quantity") * 100).cast(LongType))
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum("qty_fp").as("sum_qty_fp"), count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
            grouping(col("l_linestatus")).cast(LongType).as("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
            col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_fp,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY 5, 6, 1, 2""".stripMargin)),

    Q("q100_snapshot_diff",
      (s, dir) => {
        // CDC derivation: recover the change stream between two
        // snapshot versions — one full-outer join on the key, null-
        // pattern classification, unchanged rows dropped. Snapshot B is
        // a deterministic mutation of orders (see ordersSnapshots), so
        // the oracle reconstructs the identical pair.
        val (snapA, snapB) = ordersSnapshots(s, dir)
        ChangeCapture.diff(snapA, snapB, "o_orderkey")
          .filter(col("change") =!= "unchanged")
          .select(col("o_orderkey"), col("change"),
            col("old.o_orderstatus").as("old_status"),
            col("new.o_orderstatus").as("new_status"),
            col("old.price_fp").as("old_price_fp"),
            col("new.price_fp").as("new_price_fp"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH $snapshotOracleCtes
             |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
             |       WHEN b.o_orderkey IS NULL THEN 'delete'
             |       ELSE 'update' END AS change,
             |  a.o_orderstatus AS old_status, b.o_orderstatus AS new_status,
             |  a.price_fp AS old_price_fp, b.price_fp AS new_price_fp
             |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
             |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
             |   OR a.o_orderstatus <> b.o_orderstatus
             |   OR a.price_fp <> b.price_fp
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q101_interval_lookup",
      (s, dir) => {
        // Point-in-interval lookup: each error event resolved to the
        // SCD2 state interval containing it. Because a key's intervals
        // are non-overlapping AND contiguous, the naive BETWEEN join is
        // reformulated as an as-of join on valid_from — one ordered
        // window instead of an O(events × versions) inequality join.
        // The oracle IS the naive BETWEEN join: the hash-match proves
        // the reformulation, including empty [t,t) intervals losing to
        // the later same-second version.
        val iv = eventStateIntervals(s, dir)
          .groupBy(col("user_id"), col("valid_from"))
          .agg(max(struct(col("version"), col("state"))).as("iv"))
          .select(col("user_id"), col("valid_from").as("tss"), col("iv"))
        val errors = t(s, dir, "events")
          .filter(col("event_type") === "error")
          .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
          .select(col("event_id"), col("user_id"), col("tss"))
        EventOps.asOfJoin(errors, iv, "user_id", "tss", "iv")
          .select(col("event_id"), col("user_id"), col("tss"),
            col("asof_value.version").as("version"),
            col("asof_value.state").as("state"))
          .orderBy("event_id")
      },
      Some(s"""WITH $scd2OracleCtes,
             |err AS (SELECT event_id, user_id, tss FROM s WHERE event_type = 'error')
             |SELECT e.event_id, e.user_id, e.tss, i.version, i.state
             |FROM err e JOIN iv i
             |  ON i.user_id = e.user_id AND i.valid_from <= e.tss
             |  AND (e.tss < i.valid_to OR i.valid_to IS NULL)
             |ORDER BY e.event_id""".stripMargin)),

    Q("q102_incremental_agg",
      (s, dir) => {
        // Incremental view maintenance: the per-status (count, sum)
        // aggregate of snapshot B produced WITHOUT scanning B — base
        // aggregate over A plus ±deltas derived from the q100 change
        // stream. The oracle recomputes the aggregate from B directly;
        // the hash-match proves maintenance ≡ recompute. At 100 TB the
        // delta path is O(changes) vs a full rescan.
        val (snapA, snapB) = ordersSnapshots(s, dir)
        val baseAgg = snapA.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum("price_fp").as("sum_price_fp"))
        val changes = ChangeCapture.diff(snapA, snapB, "o_orderkey")
          .filter(col("change") =!= "unchanged")
        ChangeCapture.maintainSumCount(baseAgg, changes,
            "o_orderstatus", "price_fp")
          .orderBy("o_orderstatus")
      },
      Some(s"""WITH $snapshotOracleCtes
             |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_fp) AS BIGINT) AS sum_price_fp
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q105_cms_freq",
      (s, dir) => {
        // Count-Min frequency estimation, deterministically: a 4×64
        // counter table deliberately narrower than the vocabulary so
        // collisions exercise the min-over-depth bound (est ≥ true).
        // The (term, n) frame persists — it feeds the counter build,
        // the query set, and the truth join, and its lineage is the
        // corpus tokenization.
        val tf = tp(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term").agg(count(lit(1)).as("true_n"))
          .pin()
        val counters = SketchOps.cmsCounters(tf, col("term"), col("true_n"),
          depth = 4, width = 64)
        SketchOps.cmsEstimate(counters, tf.select(col("term")), col("term"),
            depth = 4, width = 64)
          .join(tf, col("item") === col("term"))
          .select(col("item").as("term"), col("true_n"), col("est_n"))
          .orderBy("term")
      },
      Some {
        val cs = PortableHash.coeffs(4)
        val branches = cs.zipWithIndex.map { case ((a, b), i) =>
          s"SELECT term, true_n, $i AS d, ((h * ${a}::BIGINT + $b) % ${PortableHash.P}) % 64 AS bucket FROM hh"
        }.mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
           |  FROM documents),
           |tf AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS true_n
           |  FROM toks WHERE term <> '' GROUP BY 1),
           |hh AS (SELECT term, true_n,
           |         ${PortableHash.baseSql("term || ':cms'")} AS h FROM tf),
           |bk AS (
           |  $branches),
           |counters AS (
           |  SELECT d, bucket, CAST(sum(true_n) AS BIGINT) AS cnt
           |  FROM bk GROUP BY 1, 2),
           |est AS (
           |  SELECT b.term, min(c.cnt) AS est_n
           |  FROM bk b JOIN counters c USING (d, bucket) GROUP BY 1)
           |SELECT t.term, t.true_n, CAST(e.est_n AS BIGINT) AS est_n
           |FROM tf t JOIN est e ON e.term = t.term ORDER BY t.term""".stripMargin
      }),

    Q("q201_heavy_hitters",
      (s, dir) => {
        // Frequent 3-token shingles via the Misra–Gries summary — the
        // sketch that DISCOVERS heavy items in one bounded-state pass
        // (CMS needs the query set up front; exact top-N shuffles the
        // full shingle domain). k = 32768 holds the gate/bench corpora
        // in the exact regime (err_bound = 0, order-independent), so
        // the DuckDB oracle hash-gates the whole pipeline INCLUDING
        // the map-side partials merging across 32 partitions; above
        // that the output self-labels via err_bound (q126's `sampled`
        // convention). The exact-count arm exists for the oracle and
        // the true_n audit column — production reads the summary only.
        // Top-40 is taken BEFORE the truth join: the sort keys
        // (est desc, item asc) live entirely in the summary, and every
        // reported item exists in the corpus (MG counts only real
        // arrivals), so the join is 1:1 and limit-then-join ≡
        // join-then-limit. The audit counts then run over a
        // broadcast-semi-filtered gram stream — the corpus-gram-sized
        // exchange the unrestricted truth arm paid (the ×100 sweep's
        // heap-churn source) is gone; the summary pass is the only
        // full-corpus aggregation left, which is the operator's point.
        val grams = tp(s, dir, "documents")
          .select(explode(TextOps.shingles(col("text"), 3)).as("gram"))
        val hh = SketchOps.heavyHitters(grams, col("gram"), k = 32768)
        // the top-40 is MODEL-SIZED state (the IVF-centroid precedent):
        // collect it once — the summary pass runs exactly once — and
        // push the 40 grams down as a literal In predicate (InSet after
        // OptimizeIn) on the audit count's scan. Isolated warm time is
        // scan-dominated either way (two explode passes are intrinsic:
        // the summary must see every gram, the audit re-reads the 40);
        // what this buys is the corpus-gram-domain EXCHANGE the
        // unrestricted truth arm paid — 70M aggregation-state rows at
        // ×100 whose spill churned the shared-sweep heap (the q137
        // eviction incident) now never exist.
        val top = hh.orderBy(desc("est_n"), col("item")).limit(40)
        val topRows = top.collect().toIndexedSeq
        val topKeys = topRows.map(_.getString(0))
        val tf = grams.filter(col("gram").isin(topKeys: _*))
          .groupBy("gram").agg(count(lit(1)).as("true_n"))
        s.createDataFrame(s.sparkContext.parallelize(topRows, 1), top.schema)
          .join(tf, col("item") === col("gram"))
          .select(col("gram"), col("est_n"), col("true_n"), col("err_bound"))
          .orderBy(desc("est_n"), col("gram"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |g AS (SELECT unnest(sh) AS gram FROM s),
             |tf AS (SELECT gram, CAST(count(*) AS BIGINT) AS true_n FROM g GROUP BY 1)
             |SELECT gram, true_n AS est_n, true_n,
             |  CAST(0 AS BIGINT) AS err_bound
             |FROM tf ORDER BY est_n DESC, gram LIMIT 40""".stripMargin)),

    Q("q205_grouped_heavy_hitters",
      (s, dir) => {
        // Frequent items PER GROUP: the Misra–Gries aggregate run as a
        // grouped aggregation — the 100 TB shape for "top terms per
        // domain/language". State is k counters PER GROUP through the
        // map-side partials; the exact form's (group × term) exchange
        // never exists. This vocabulary fits k everywhere (err_bound
        // 0, order-independent), so the oracle hash-gates the grouped
        // partial-merge path end to end; top-5 per group is a window
        // over the summary's ≤ k reported rows, not over the corpus.
        val toks = tp(s, dir, "documents")
          .select(col("lang"),
            explode(split(trim(col("text")), "\\s+")).as("term"))
          .filter(col("term") =!= "")
        val mg = toks.groupBy("lang")
          .agg(graft.functions.FreqSketch.mgSummary(col("term"), 4096).as("mg"))
          .select(col("lang"), col("mg.err_bound").as("err_bound"),
            explode(col("mg.items")).as("e"))
          .select(col("lang"), col("e.item").as("term"),
            col("e.est").as("est_n"), col("err_bound"))
        val w = Window.partitionBy("lang").orderBy(desc("est_n"), col("term"))
        mg.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("lang"), col("rn").cast("long").as("rn"), col("term"),
            col("est_n"),
            // the gate's claim is the EXACT regime (err_bound 0); a
            // vocabulary that outgrows k (e.g. a scaled corpus salted
            // with per-copy tokens) must surface as an explicit error
            // here, not as a silent flip to the approximate regime
            // that the oracle then hash-mismatches
            (col("err_bound") + coalesce(assert_true(col("err_bound") === 0,
              concat(lit("q205: per-lang vocabulary outgrew k=4096; "),
                lit("approximate regime for lang "), col("lang"))),
              lit(0L))).as("err_bound"))
          .orderBy("lang", "rn")
      },
      Some("""WITH t AS (
             |  SELECT lang,
             |    unnest(string_split_regex(trim(text), '\s+')) AS term
             |  FROM documents),
             |tf AS (
             |  SELECT lang, term, CAST(count(*) AS BIGINT) AS est_n
             |  FROM t WHERE term <> '' GROUP BY 1, 2),
             |r AS (
             |  SELECT lang, term, est_n,
             |    row_number() OVER (PARTITION BY lang
             |                       ORDER BY est_n DESC, term) AS rn
             |  FROM tf)
             |SELECT lang, CAST(rn AS BIGINT) AS rn, term, est_n,
             |  CAST(0 AS BIGINT) AS err_bound
             |FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin)),

    Q("q202_jsonl_roundtrip",
      (s, dir) => {
        // JSONL ingestion, hash-gated end-to-end: the corpus writes out
        // as JSONL (the format LLM corpora actually arrive in — JSON
        // string escaping keeps embedded newlines on one line, which is
        // why JSONL beats CSV for text), an extra landed file injects 2
        // well-formed and 3 corrupt lines, and RawReaders
        // .jsonlQuarantined reads it back under the DECLARED schema
        // (never inferred — inference is a second full pass at 100 TB).
        // Clean rows must carry every value bit-exactly (the sums/max
        // prove it against the parquet originals) and exactly the 3
        // corrupt lines must land in quarantine, not vanish. The final
        // collect is ONE aggregate row (driver-sized), materialized so
        // the scratch dir can be deleted before the frame is consumed.
        val tmp = java.nio.file.Files.createTempDirectory("graft_q202").toString
        try {
          val schema = new StructType()
            .add("doc_id", LongType).add("text", StringType)
            .add("lang", StringType).add("source", StringType)
            .add("n_chars", LongType)
          tp(s, dir, "documents")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .coalesce(4)
            .write.mode("overwrite").json(tmp + "/docs")
          val extra = Seq(
            """{"doc_id":9000001,"text":"injected alpha","lang":"zz-a","source":"extra","n_chars":14}""",
            """{"doc_id":9000002,"text":"injected beta","lang":"zz-b","source":"extra","n_chars":13}""",
            """{"doc_id":9000003,"text":"truncated""",
            """{"doc_id":"not-a-number","text":"bad type","lang":"zz-c","source":"extra","n_chars":1}""",
            "plainly not json")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "docs", "extra.json"),
            extra.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (clean, quar) = RawReaders.jsonlQuarantined(s, tmp + "/docs", schema)
          val out = clean.agg(
              count(lit(1)).as("n_rows"),
              sum("n_chars").as("sum_chars"),
              countDistinct("lang").as("n_langs"),
              max("doc_id").as("max_doc_id"))
            .crossJoin(quar.agg(count(lit(1)).as("n_quarantined")))
          val rows = out.collect().toIndexedSeq
          s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
        } finally {
          val p = new org.apache.hadoop.fs.Path(tmp)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
      },
      Some("""SELECT CAST(count(*) + 2 AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) + 27 AS BIGINT) AS sum_chars,
             |  CAST(count(DISTINCT lang) + 2 AS BIGINT) AS n_langs,
             |  CAST(greatest(max(doc_id), 9000002) AS BIGINT) AS max_doc_id,
             |  CAST(3 AS BIGINT) AS n_quarantined
             |FROM documents""".stripMargin)),

    Q("q203_rolled_cms",
      (s, dir) => {
        // The sketch family under CDC, driver-oracle-gated: the corpus
        // mutates (the q200 mutation — deletes, edits, duplicates under
        // shifted ids), the Count-Min counter table rolls forward
        // through FrameMaintenance.rollForwardCms (token passes over
        // TOUCHED docs only; departed tokens subtract — CMS counters
        // are linear in the token counts, the one sketch that deletes
        // exactly), and the estimates come off the ROLLED table. The
        // oracle rebuilds the 4×64 table from the mutated corpus from
        // scratch — the hash match IS roll ≡ rebuild, exact equality.
        // No store configured in the gate → getOrBuild is identity and
        // the roll is pure dataflow.
        val docs = tp(s, dir, "documents").select("doc_id", "text")
        val mutated = docs
          .filter(pmod(col("doc_id"), lit(5)) =!= 2)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" v2 v2"))).otherwise(col("text")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(11)) === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        def toks(d: DataFrame): DataFrame = d
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("item"))
          .filter(col("item") =!= "")
          .groupBy("doc_id", "item").agg(count(lit(1)).as("n"))
        val rolled = graft.etl.FrameMaintenance.rollForwardCms(
          s, s"q203old:$dir", s"q203new:$dir", "cms4x64", docs, mutated,
          depth = 4, width = 64)(toks)
        val tf = toks(mutated).groupBy("item").agg(sum("n").as("true_n"))
        SketchOps.cmsEstimate(rolled, tf.select(col("item")), col("item"),
            depth = 4, width = 64)
          .join(tf, Seq("item"))
          .select(col("item").as("term"), col("true_n"), col("est_n"))
          .orderBy("term")
      },
      Some {
        val cs = PortableHash.coeffs(4)
        val branches = cs.zipWithIndex.map { case ((a, b), i) =>
          s"SELECT term, true_n, $i AS d, ((h * ${a}::BIGINT + $b) % ${PortableHash.P}) % 64 AS bucket FROM hh"
        }.mkString("\n  UNION ALL ")
        s"""WITH mut AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2 v2'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id % 5 <> 2
           |  UNION ALL
           |  SELECT doc_id + 1000000, text FROM documents
           |  WHERE doc_id % 11 = 3),
           |toks AS (
           |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
           |  FROM mut),
           |tf AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS true_n
           |  FROM toks WHERE term <> '' GROUP BY 1),
           |hh AS (SELECT term, true_n,
           |         ${PortableHash.baseSql("term || ':cms'")} AS h FROM tf),
           |bk AS (
           |  $branches),
           |counters AS (
           |  SELECT d, bucket, CAST(sum(true_n) AS BIGINT) AS cnt
           |  FROM bk GROUP BY 1, 2),
           |est AS (
           |  SELECT b.term, min(c.cnt) AS est_n
           |  FROM bk b JOIN counters c USING (d, bucket) GROUP BY 1)
           |SELECT t.term, t.true_n, CAST(e.est_n AS BIGINT) AS est_n
           |FROM tf t JOIN est e ON e.term = t.term ORDER BY t.term""".stripMargin
      }),

    Q("q106_hll_distinct",
      (s, dir) => {
        // HyperLogLog cardinality, deterministically: registers from
        // the portable 60-bit hash (rho via bin()-length — no clz/log
        // primitive), harmonic sum in EXACT fixed point (Σ 2^(54−Mj)
        // as longs), one IEEE division at the end — so the estimate
        // hash-gates against DuckDB running the identical pipeline.
        // The register build is one map-side-combined 256-group max.
        val ev = t(s, dir, "events").select(col("event_id"))
        val est = SketchOps.hllEstimate(
          SketchOps.hllRegisters(ev, col("event_id"), b = 10), b = 10)
        est.crossJoin(broadcast(ev.agg(countDistinct(col("event_id")).as("exact_n"))))
          .select(r4(col("est_raw")).as("est_distinct"), col("v_zero"),
            col("exact_n"))
      },
      Some(s"""WITH h AS (
             |  SELECT (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':hll'), 1, 15))::BIGINT) AS h
             |  FROM events),
             |r AS (
             |  SELECT h % 1024 AS bucket,
             |    CASE WHEN h // 1024 = 0 THEN 51
             |         ELSE 51 - length(bin(h // 1024)) END AS rho
             |  FROM h),
             |reg AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY 1),
             |agg AS (
             |  SELECT CAST(sum(1::BIGINT << CAST(54 - mj AS INT)) AS BIGINT) AS sp,
             |    count(*) AS present
             |  FROM reg)
             |SELECT
             |  floor((${SketchOps.hllNumerator(10)} /
             |    CAST(sp + (1024 - present) * (1::BIGINT << 54) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
             |    AS est_distinct,
             |  CAST(1024 - present AS BIGINT) AS v_zero,
             |  (SELECT CAST(count(DISTINCT event_id) AS BIGINT) FROM events) AS exact_n
             |FROM agg""".stripMargin)),

    Q("q107_hll_by_group",
      (s, dir) => {
        // Approximate distinct-per-group: active user-days per event
        // type via grouped HLL registers — state is 256 registers per
        // group instead of shuffling every (group, user, day) pair,
        // which is the count(DISTINCT) replacement that matters at
        // 100 TB. Exact counts ride along for the error column; the
        // whole output (estimates included) hash-gates because the
        // register pipeline is portable-hash deterministic.
        val ev = t(s, dir, "events")
          .withColumn("ud", concat(col("user_id").cast("string"), lit("@"),
            expr("unix_timestamp(date_trunc('second', ts)) div 86400")))
          .select(col("event_type"), col("ud"))
        val est = SketchOps.hllEstimateBy(
          SketchOps.hllRegistersBy(ev, col("event_type"), col("ud"), b = 8), b = 8)
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("ud")).as("exact_n"))
        est.join(exact, col("g") === col("event_type"))
          .select(col("event_type"), r4(col("est_raw")).as("est_user_days"),
            col("exact_n"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type,
             |    CAST(user_id AS VARCHAR) || '@' ||
             |    CAST(CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) // 86400 AS VARCHAR) AS ud
             |  FROM events),
             |h AS (
             |  SELECT event_type,
             |    (('0x' || substr(md5(ud || ':hll'), 1, 15))::BIGINT) AS h,
             |    ud
             |  FROM ev),
             |r AS (
             |  SELECT event_type, h % 256 AS bucket,
             |    CASE WHEN h // 256 = 0 THEN 53
             |         ELSE 53 - length(bin(h // 256)) END AS rho
             |  FROM h),
             |reg AS (SELECT event_type, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type,
             |    CAST(sum(1::BIGINT << CAST(54 - mj AS INT)) AS BIGINT) AS sp,
             |    count(*) AS present
             |  FROM reg GROUP BY 1),
             |exact AS (
             |  SELECT event_type, CAST(count(DISTINCT ud) AS BIGINT) AS exact_n
             |  FROM ev GROUP BY 1)
             |SELECT a.event_type,
             |  floor((${SketchOps.hllNumerator(8)} /
             |    CAST(sp + (256 - present) * (1::BIGINT << 54) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
             |    AS est_user_days,
             |  e.exact_n
             |FROM agg a JOIN exact e ON e.event_type = a.event_type
             |ORDER BY a.event_type""".stripMargin)),

    Q("q108_large_orders",
      (s, dir) => {
        // TPC-H Q18 shape: orders whose total line quantity crosses a
        // threshold, joined back to customer detail. The HAVING
        // pre-aggregation reduces lineitem to order keys BEFORE any
        // join — the join-back input is the filtered key set, never the
        // fact table; customer attaches by broadcast.
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(floor(col("l_quantity") * 100).cast(LongType)).as("qty_fp"))
          .filter(col("qty_fp") > 15000L)
        t(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, dir, "customer")
            .select("c_custkey", "c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("odate"),
            floor(col("o_totalprice") * 100).cast(LongType).as("total_fp"),
            col("qty_fp"))
          .orderBy("o_orderkey")
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey,
             |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_fp
             |  FROM lineitem GROUP BY 1
             |  HAVING CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) > 15000)
             |SELECT c.c_custkey, c.c_name, o.o_orderkey,
             |  CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS odate,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS total_fp,
             |  b.qty_fp
             |FROM orders o
             |JOIN big b ON b.l_orderkey = o.o_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |ORDER BY o.o_orderkey""".stripMargin)),

    Q("q109_supplier_part_counts",
      (s, dir) => {
        // TPC-H Q16 shape: distinct supplier count per (brand, type,
        // size) excluding a blocklisted supplier set (NOT IN → left
        // anti join on the KEY set). The distinct-agg shuffles
        // (brand,type,size,supplier) once; the blocklist is a tiny
        // broadcast anti join applied before it.
        val blocked = t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val offers = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
        offers
          .join(broadcast(t(s, dir, "part")
            .select("p_partkey", "p_brand", "p_type", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""WITH blocked AS (
             |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
             |offers AS (
             |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM blocked))
             |SELECT p.p_brand, p.p_type, p.p_size,
             |  CAST(count(DISTINCT o.l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM offers o JOIN part p ON p.p_partkey = o.l_partkey
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    Q("q110_sketch_merge",
      (s, dir) => {
        // Sketch mergeability, proven: HLL registers built SEPARATELY
        // over two overlapping event partitions, merged by per-bucket
        // max — while the oracle builds one register set over the UNION
        // directly. The hash-match proves merge(build(A), build(B)) ≡
        // build(A ∪ B), which is what lets partial sketches build
        // map-side per partition/day/source and combine in a tiny
        // reduce at 100 TB.
        val ev = t(s, dir, "events")
        val partA = ev.filter(col("event_id") % 3 =!= 0).select(col("event_id"))
        val partB = ev.filter(col("event_id") % 2 === 0).select(col("event_id"))
        val merged = SketchOps.hllMerge(
          SketchOps.hllRegisters(partA, col("event_id"), b = 10),
          SketchOps.hllRegisters(partB, col("event_id"), b = 10))
        val exact = partA.unionByName(partB).distinct()
          .agg(count(lit(1)).as("exact_n"))
        SketchOps.hllEstimate(merged, b = 10)
          .crossJoin(broadcast(exact))
          .select(r4(col("est_raw")).as("est_distinct"), col("v_zero"),
            col("exact_n"))
      },
      Some(s"""WITH u AS (
             |  SELECT event_id FROM events WHERE event_id % 3 <> 0
             |  UNION
             |  SELECT event_id FROM events WHERE event_id % 2 = 0),
             |h AS (
             |  SELECT (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':hll'), 1, 15))::BIGINT) AS h
             |  FROM u),
             |r AS (
             |  SELECT h % 1024 AS bucket,
             |    CASE WHEN h // 1024 = 0 THEN 51
             |         ELSE 51 - length(bin(h // 1024)) END AS rho
             |  FROM h),
             |reg AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY 1),
             |agg AS (
             |  SELECT CAST(sum(1::BIGINT << CAST(54 - mj AS INT)) AS BIGINT) AS sp,
             |    count(*) AS present
             |  FROM reg)
             |SELECT
             |  floor((${SketchOps.hllNumerator(10)} /
             |    CAST(sp + (1024 - present) * (1::BIGINT << 54) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
             |    AS est_distinct,
             |  CAST(1024 - present AS BIGINT) AS v_zero,
             |  (SELECT CAST(count(*) AS BIGINT) FROM u) AS exact_n
             |FROM agg""".stripMargin)),

    Q("q112_sole_blame_suppliers",
      (s, dir) => {
        // TPC-H Q21 shape: suppliers who were the SOLE returned-flag
        // supplier on a multi-supplier order. The correlated
        // EXISTS/NOT-EXISTS pair is reformulated as ONE order-level
        // aggregation (n_supp > 1 ⟺ another supplier exists;
        // n_r_supp = 1 ⟺ no other R supplier — and then the sole R
        // supplier IS min(R supplier)) — the fact table is scanned
        // and shuffled exactly once, never self-joined row × row.
        // (The round-6 sf10 rehearsal showed the previous two-
        // aggregate + join-back form spending 3 shuffles of the fact
        // table; this one-pass form is ~2× faster at 60M lineitems.)
        // The oracle runs the literal correlated subqueries, so the
        // hash-match proves the reformulation.
        // two-level aggregation instead of a double countDistinct: the
        // (orderkey, suppkey) rollup is one map-side-combined shuffle
        // of the fact table; a double countDistinct would instead
        // Expand every row 3× before shuffling
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_returnflag") === "R").as("isR"))
        li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("isR")).as("anyR"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"),
            sum(when(col("anyR"), 1L).otherwise(0L)).as("n_r_supp"),
            min(when(col("anyR"), col("l_suppkey"))).as("l_suppkey"))
          .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
          .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
      },
      Some("""WITH l1 AS (
             |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
             |  WHERE l_returnflag = 'R')
             |SELECT s.s_suppkey, s.s_name,
             |  CAST(count(*) AS BIGINT) AS numwait
             |FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
             |WHERE EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_returnflag = 'R')
             |GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey""".stripMargin)),

    Q("q113_market_share",
      (s, dir) => {
        // TPC-H Q8 shape: per order-year, the revenue share captured by
        // suppliers of one nation among orders placed by customers of
        // one region — a five-table join tree (all dims BROADCAST) into
        // ONE conditional aggregation; revenue in fixed-point cents so
        // the share ratio is a single portable division.
        val nation = t(s, dir, "nation")
        val customerSide = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation.select(col("n_nationkey").as("cn_key"),
            col("n_regionkey"))), col("c_nationkey") === col("cn_key"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("o_year"))
        val supplierNation = t(s, dir, "supplier")
          .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("supp_nation"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
              .cast(LongType).as("rev_fp"))
          .join(customerSide, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supplierNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy("o_year")
          .agg(
            sum(when(col("supp_nation") === "NATION_3", col("rev_fp"))
              .otherwise(lit(0L))).as("nation_rev_fp"),
            sum(col("rev_fp")).as("total_rev_fp"))
          .select(col("o_year"),
            r4(col("nation_rev_fp").cast(DoubleType) /
              col("total_rev_fp").cast(DoubleType)).as("mkt_share"),
            col("nation_rev_fp"), col("total_rev_fp"))
          .orderBy("o_year")
      },
      Some("""WITH rev AS (
             |  SELECT year(o.o_orderdate) AS o_year,
             |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT) AS rev_fp,
             |    sn.n_name AS supp_nation
             |  FROM lineitem l
             |  JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
             |  JOIN region r ON r.r_regionkey = cn.n_regionkey
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
             |  WHERE r.r_name = 'ASIA')
             |SELECT CAST(o_year AS BIGINT) AS o_year,
             |  floor((CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_fp ELSE 0 END) AS DOUBLE) /
             |         CAST(sum(rev_fp) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mkt_share,
             |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_fp ELSE 0 END) AS BIGINT) AS nation_rev_fp,
             |  CAST(sum(rev_fp) AS BIGINT) AS total_rev_fp
             |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q115_heatmap_bins",
      (s, dir) => {
        // 2-D heatmap binning (hour-of-day × clamped value decile):
        // one map-side-combined aggregation over two derived integer
        // bin keys — the dashboard heatmap primitive.
        t(s, dir, "events")
          .select(
            (expr("unix_timestamp(date_trunc('second', ts)) div 3600") % 24)
              .as("hod"),
            least(greatest(floor(col("value") / 10), lit(0)), lit(9))
              .cast(LongType).as("vbin"),
            floor(col("value") * 10000).cast(LongType).as("v_fp"))
          .groupBy("hod", "vbin")
          .agg(count(lit(1)).as("n"), sum("v_fp").as("sum_v_fp"))
          .orderBy("hod", "vbin")
      },
      Some("""SELECT
             |  (CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) // 3600) % 24 AS hod,
             |  CAST(least(greatest(floor(value / 10), 0), 9) AS BIGINT) AS vbin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_v_fp
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q116_golden_record",
      (s, dir) => {
        // Multi-source golden record: per key and per FIELD, take the
        // value from the highest-priority source that has it. The Spark
        // plan is the n-source-scalable form — union + ONE aggregation
        // with min-over-(priority, value) structs (nulls demoted to
        // priority 99) — while the oracle is the naive per-pair
        // LEFT JOIN + COALESCE, so the hash-match proves the
        // reformulation. Source A is fresher but partial (every 5th key
        // missing entirely, every 3rd missing the balance).
        val base = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"),
            floor(col("c_acctbal") * 100).cast(LongType).as("bal_fp"))
        val a = base.filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey"), lit(1L).as("prio"),
            concat(lit("A_"), col("c_name")).as("name"),
            when(col("c_custkey") % 3 === 0, lit(null).cast(LongType))
              .otherwise(col("bal_fp")).as("bal_fp"))
        val b = base.select(col("c_custkey"), lit(2L).as("prio"),
          col("c_name").as("name"), col("bal_fp"))
        a.unionByName(b)
          .groupBy("c_custkey")
          .agg(
            min(struct(
              when(col("name").isNull, lit(99L)).otherwise(col("prio")).as("p"),
              col("name").as("v"))).as("gn"),
            min(struct(
              when(col("bal_fp").isNull, lit(99L)).otherwise(col("prio")).as("p"),
              col("bal_fp").as("v"))).as("gb"))
          .select(col("c_custkey"), col("gn.v").as("golden_name"),
            col("gb.v").as("golden_bal_fp"))
          .orderBy("c_custkey")
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_fp
             |  FROM customer),
             |a AS (
             |  SELECT c_custkey, 'A_' || c_name AS name,
             |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE bal_fp END AS bal_fp
             |  FROM base WHERE c_custkey % 5 <> 0),
             |b AS (SELECT c_custkey, c_name AS name, bal_fp FROM base)
             |SELECT b.c_custkey,
             |  COALESCE(a.name, b.name) AS golden_name,
             |  COALESCE(a.bal_fp, b.bal_fp) AS golden_bal_fp
             |FROM b LEFT JOIN a ON a.c_custkey = b.c_custkey
             |ORDER BY 1""".stripMargin)),

    Q("q117_decimal_totals",
      (s, dir) => {
        // True DECIMAL arithmetic (the money path most engines expose
        // directly, complementing this repo's fixed-point-long
        // convention): prices quantized to DECIMAL(18,2) at the scan,
        // then exact decimal sums — Spark's Decimal aggregation and
        // DuckDB's produce the same digits in any accumulation order,
        // so the totals hash-gate with no rounding wrapper at all.
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_extendedprice").cast("decimal(18,2)").as("price"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(BigDecimal(1)).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(18,4)").as("disc_price"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("price").cast("decimal(18,2)").as("sum_price"),
            sum("disc_price").cast("decimal(18,4)").as("sum_disc_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             |        AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q118_salted_agg",
      (s, dir) => {
        // Skew-safe aggregation: hot keys are salted into sub-
        // partitions, partial-summed, then combined — the two-phase
        // shape for non-combinable or buffer-heavy aggregates where
        // one reducer would otherwise own the whole hot key. Sums are
        // fixed-point longs, so salting cannot change the answer — and
        // the oracle is the PLAIN single-phase GROUP BY, proving it.
        SkewOps.saltedSum(
            t(s, dir, "events")
              .select(col("event_type"),
                floor(col("value") * 10000).cast(LongType).as("v_fp")),
            "event_type", "v_fp", salt = 16)
          .select(col("event_type"), col("sum_v_fp"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_v_fp
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q119_share_of_region",
      (s, dir) => {
        // Percent-of-total within group (the BI "ratio to report"):
        // nation revenue as a share of its region — one aggregation to
        // nation grain, then a region-partitioned window sum; the
        // share is a single portable division over exact longs.
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(floor(col("o_totalprice") * 100).cast(LongType))
            .as("rev_fp"))
        rev.withColumn("region_rev_fp",
            sum(col("rev_fp")).over(Window.partitionBy("r_name")))
          .select(col("r_name"), col("n_name"), col("rev_fp"),
            r4(col("rev_fp").cast(DoubleType) /
              col("region_rev_fp").cast(DoubleType)).as("share"))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH rev AS (
             |  SELECT r.r_name, n.n_name,
             |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_fp
             |  FROM orders o
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  JOIN nation n ON n.n_nationkey = c.c_nationkey
             |  JOIN region r ON r.r_regionkey = n.n_regionkey
             |  GROUP BY 1, 2)
             |SELECT r_name, n_name, rev_fp,
             |  floor((CAST(rev_fp AS DOUBLE) /
             |         CAST(sum(rev_fp) OVER (PARTITION BY r_name) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS share
             |FROM rev ORDER BY r_name, n_name""".stripMargin)),

    Q("q121_percentile_disc",
      (s, dir) => {
        // Discrete (type-1) quantiles per group: the returned values
        // are ACTUAL data points, carried verbatim — no interpolation
        // arithmetic, so the doubles hash-gate with no rounding
        // wrapper. Complements q05's interpolating percentile; both
        // engines use the SQL-standard first-cume ≥ p element.
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
            expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  quantile_disc(value, 0.5) AS p50,
             |  quantile_disc(value, 0.9) AS p90,
             |  quantile_disc(value, 0.99) AS p99,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q127_bloom_semijoin",
      (s, dir) => {
        // Explicit Bloom runtime filter ahead of a semi-join: the build
        // side's key set folds into a 4 KiB bitset (distributed bit_or,
        // driver holds only index metadata), the probe side prunes with
        // a narrow k-hash projection BEFORE the exact join kills the
        // false positives. Oracle = the plain semi-join: the hash-match
        // proves the prune is answer-preserving. NATION_19 is populated
        // at every test scale (sf0.001 has only 10 suppliers total, so
        // most nations are empty there — the smoke suite needs rows).
        val supKeys = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_19")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("l_suppkey"))
        val bits = BloomPruneOps.buildBits(supKeys, col("l_suppkey"),
          mBits = 4096, k = 3)
        t(s, dir, "lineitem")
          .filter(BloomPruneOps.mightContain(bits, col("l_suppkey"),
            mBits = 4096, k = 3))
          .join(broadcast(supKeys), Seq("l_suppkey"), "left_semi")
          .groupBy("l_suppkey")
          .agg(sum(floor(col("l_quantity")).cast(LongType)).as("qty"),
            count(lit(1)).as("n_items"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey,
             |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem
             |WHERE l_suppkey IN (
             |  SELECT s_suppkey FROM supplier
             |  JOIN nation ON n_nationkey = s_nationkey
             |  WHERE n_name = 'NATION_19')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q128_map_metadata",
      (s, dir) => {
        // MapType as a first-class metadata column: per-user event-type
        // count maps built with map_from_entries, then genuinely
        // map-operated on — higher-order map_filter (hot types only),
        // element_at lookup, size() — before exploding back to rows.
        // The OUTPUT is the exploded canonical (key, value) form: DuckDB
        // ≤1.x round-trips parquet MAP unreliably (the STATUS.md map
        // blocker), so the oracle gates the exploded representation —
        // the map semantics are still what's being proven, relationally
        // re-derived on the oracle side.
        val counts = t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val maps = counts.groupBy("user_id")
          .agg(map_from_entries(
            array_sort(collect_list(struct(col("event_type"), col("n")))))
            .as("m"))
        maps
          .withColumn("n_types", size(col("m")).cast(LongType))
          .withColumn("n_clicks", coalesce(element_at(col("m"), "click"), lit(0L)))
          .withColumn("hot", map_filter(col("m"), (_, v) => v >= 20L))
          .select(col("user_id"), col("n_types"), col("n_clicks"),
            explode(col("hot")).as(Seq("etype", "n_events")))
          .orderBy("user_id", "etype")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS n_clicks
             |  FROM c GROUP BY 1)
             |SELECT c.user_id, u.n_types, u.n_clicks,
             |  c.event_type AS etype, c.n AS n_events
             |FROM c JOIN u USING (user_id)
             |WHERE c.n >= 20
             |ORDER BY 1, 4""".stripMargin)),

    Q("q141_zorder_layout",
      (s, dir) => {
        // Z-order (Morton-curve) data-layout simulation — the
        // Delta/Iceberg OPTIMIZE ZORDER decision query: for a two-column
        // box predicate, how many files does min/max pruning skip under
        // a Z-clustered layout vs the natural insertion-order layout?
        // At 100 TB this IS the difference between reading a handful of
        // files and the whole table (ParquetSink.writeZOrdered performs
        // the actual clustered write; this query computes the layout
        // comparison relationally so it is oracle-checkable). Plan
        // shape: one tiny range agg broadcast everywhere, one pass
        // assigning both layouts' file ids (pure bit arithmetic inside
        // codegen), one groupBy per layout over file-count-sized frames.
        // The box is range-relative (20%-30% of each dimension), so the
        // query is scale-free.
        val li = tp(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey")
        val r = li.agg(
          min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
          min("l_orderkey").as("omin"), max("l_orderkey").as("omax"))
        val u = li.crossJoin(broadcast(r))
          .withColumn("zv", graft.functions.ZOrder.zAddress(
            col("l_partkey"), col("pmin"), col("pmax"),
            col("l_suppkey"), col("smin"), col("smax")))
          .withColumn("zfile", expr("(zv * 64) div 4294967296"))
          .withColumn("lfile",
            expr("((l_orderkey - omin) * 64) div (omax - omin + 1)"))
          .withColumn("plo", expr("pmin + ((pmax - pmin) * 2) div 10"))
          .withColumn("phi", expr("pmin + ((pmax - pmin) * 3) div 10"))
          .withColumn("slo", expr("smin + ((smax - smin) * 2) div 10"))
          .withColumn("shi", expr("smin + ((smax - smin) * 3) div 10"))
          .withColumn("hit",
            (col("l_partkey").between(col("plo"), col("phi")) &&
              col("l_suppkey").between(col("slo"), col("shi"))).cast(LongType))
          .pin()
        def layout(fileCol: String, name: String): DataFrame =
          u.groupBy(col(fileCol).as("f"))
            .agg(min("l_partkey").as("fpmin"), max("l_partkey").as("fpmax"),
              min("l_suppkey").as("fsmin"), max("l_suppkey").as("fsmax"),
              count(lit(1)).as("cnt"), sum("hit").as("match_cnt"),
              min("plo").as("plo"), min("phi").as("phi"),
              min("slo").as("slo"), min("shi").as("shi"))
            .withColumn("scanned",
              (col("fpmin") <= col("phi") && col("fpmax") >= col("plo") &&
                col("fsmin") <= col("shi") && col("fsmax") >= col("slo"))
                .cast(LongType))
            .agg(
              count(lit(1)).as("n_files"),
              sum("scanned").as("files_scanned"),
              sum(col("scanned") * col("cnt")).as("rows_read"),
              sum("cnt").as("rows_total"),
              sum("match_cnt").as("rows_matched"))
            .select(lit(name).as("layout"), col("n_files"),
              col("files_scanned"), col("rows_read"), col("rows_total"),
              col("rows_matched"))
        layout("lfile", "linear").unionAll(layout("zfile", "zorder"))
          .orderBy("layout")
      },
      Some("""WITH r AS (
             |  SELECT min(l_partkey) pmin, max(l_partkey) pmax,
             |         min(l_suppkey) smin, max(l_suppkey) smax,
             |         min(l_orderkey) omin, max(l_orderkey) omax
             |  FROM lineitem),
             |u0 AS (
             |  SELECT l_partkey, l_suppkey,
             |    ((least(greatest(l_partkey, pmin), pmax) - pmin) * 65535)
             |      // greatest(pmax - pmin, 1) AS ux,
             |    ((least(greatest(l_suppkey, smin), smax) - smin) * 65535)
             |      // greatest(smax - smin, 1) AS uy,
             |    ((l_orderkey - omin) * 64) // (omax - omin + 1) AS lfile,
             |    pmin + ((pmax - pmin) * 2) // 10 AS plo,
             |    pmin + ((pmax - pmin) * 3) // 10 AS phi,
             |    smin + ((smax - smin) * 2) // 10 AS slo,
             |    smin + ((smax - smin) * 3) // 10 AS shi
             |  FROM lineitem CROSS JOIN r),
             |s1 AS (SELECT *, (ux | (ux << 8)) & 16711935 AS ax,
             |                 (uy | (uy << 8)) & 16711935 AS ay FROM u0),
             |s2 AS (SELECT *, (ax | (ax << 4)) & 252645135 AS bx,
             |                 (ay | (ay << 4)) & 252645135 AS "by" FROM s1),
             |s3 AS (SELECT *, (bx | (bx << 2)) & 858993459 AS cx,
             |                 ("by" | ("by" << 2)) & 858993459 AS cy FROM s2),
             |s4 AS (SELECT *, (cx | (cx << 1)) & 1431655765 AS dx,
             |                 (cy | (cy << 1)) & 1431655765 AS dy FROM s3),
             |u AS (SELECT l_partkey, l_suppkey, lfile, plo, phi, slo, shi,
             |    ((dx | (dy << 1)) * 64) // 4294967296 AS zfile,
             |    CASE WHEN l_partkey BETWEEN plo AND phi
             |          AND l_suppkey BETWEEN slo AND shi THEN 1 ELSE 0 END AS hit
             |  FROM s4),
             |fl AS (SELECT lfile AS f, min(l_partkey) fpmin, max(l_partkey) fpmax,
             |    min(l_suppkey) fsmin, max(l_suppkey) fsmax, count(*) cnt,
             |    sum(hit) match_cnt, min(plo) plo, min(phi) phi,
             |    min(slo) slo, min(shi) shi
             |  FROM u GROUP BY 1),
             |fz AS (SELECT zfile AS f, min(l_partkey) fpmin, max(l_partkey) fpmax,
             |    min(l_suppkey) fsmin, max(l_suppkey) fsmax, count(*) cnt,
             |    sum(hit) match_cnt, min(plo) plo, min(phi) phi,
             |    min(slo) slo, min(shi) shi
             |  FROM u GROUP BY 1),
             |sl AS (SELECT 'linear' AS layout, CAST(count(*) AS BIGINT) n_files,
             |    CAST(sum(CASE WHEN fpmin <= phi AND fpmax >= plo
             |      AND fsmin <= shi AND fsmax >= slo THEN 1 ELSE 0 END) AS BIGINT) files_scanned,
             |    CAST(sum(CASE WHEN fpmin <= phi AND fpmax >= plo
             |      AND fsmin <= shi AND fsmax >= slo THEN cnt ELSE 0 END) AS BIGINT) rows_read,
             |    CAST(sum(cnt) AS BIGINT) rows_total,
             |    CAST(sum(match_cnt) AS BIGINT) rows_matched
             |  FROM fl),
             |sz AS (SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) n_files,
             |    CAST(sum(CASE WHEN fpmin <= phi AND fpmax >= plo
             |      AND fsmin <= shi AND fsmax >= slo THEN 1 ELSE 0 END) AS BIGINT) files_scanned,
             |    CAST(sum(CASE WHEN fpmin <= phi AND fpmax >= plo
             |      AND fsmin <= shi AND fsmax >= slo THEN cnt ELSE 0 END) AS BIGINT) rows_read,
             |    CAST(sum(cnt) AS BIGINT) rows_total,
             |    CAST(sum(match_cnt) AS BIGINT) rows_matched
             |  FROM fz)
             |SELECT * FROM sl UNION ALL SELECT * FROM sz ORDER BY layout""".stripMargin)),

    Q("q147_skew_diagnostics",
      (s, dir) => {
        // Pre-join skew probe — the diagnostic run BEFORE keying a
        // 100 TB shuffle: the per-key count distribution of each
        // candidate join key, its hot-key pressure (max/mean,
        // fixed-point), and the salt factor the q118 salted-agg pattern
        // would need (ceil(max/mean), capped at 32 — more buckets than
        // executor-slots-per-hot-key stops paying). One map-side-
        // combined count per key column, then key-count-sized rollups;
        // percentile_disc over the per-key counts is per-column
        // (3 bounded groups), not per-key.
        val li = tp(s, dir, "lineitem")
        def dist(keyCol: String): DataFrame =
          li.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
            .agg(
              count(lit(1)).as("n_keys"),
              sum("c").as("n_rows"),
              max("c").as("max_cnt"),
              expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
                .cast(LongType).as("p50_cnt"),
              expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
                .cast(LongType).as("p99_cnt"))
            .select(lit(keyCol).as("join_key"), col("n_keys"), col("n_rows"),
              col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
              expr("(10000 * max_cnt * n_keys) div n_rows").as("hot_ratio_fp"),
              least(lit(32L),
                expr("((max_cnt * n_keys) + n_rows - 1) div n_rows"))
                .as("suggested_salt"))
        dist("l_orderkey").unionAll(dist("l_partkey"))
          .unionAll(dist("l_suppkey"))
          .orderBy("join_key")
      },
      Some("""WITH src AS (
             |  SELECT 'l_orderkey' AS join_key, l_orderkey AS k FROM lineitem
             |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
             |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
             |pk AS (SELECT join_key, k, count(*) AS c FROM src GROUP BY 1, 2)
             |SELECT join_key,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(max(c) AS BIGINT) AS max_cnt,
             |  CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_cnt,
             |  CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_cnt,
             |  CAST((10000 * max(c) * count(*)) // sum(c) AS BIGINT) AS hot_ratio_fp,
             |  CAST(least(32, ((max(c) * count(*)) + sum(c) - 1) // sum(c)) AS BIGINT)
             |    AS suggested_salt
             |FROM pk GROUP BY join_key ORDER BY join_key""".stripMargin)),

    Q("q148_hll_overlap",
      (s, dir) => {
        // Sketch-algebra source overlap: the HLL counterpart of q135's
        // exact pairwise Jaccard — per-source shingle registers built
        // ONCE (one map-side-combined pass, m registers per source),
        // then every pairwise union estimated by max-merging the two
        // register sets and the intersection by inclusion-exclusion.
        // This is the 100 TB protocol: S sources cost S sketch builds +
        // S²·m register rows of pure algebra, while q135's exact form
        // re-joins the corpus-sized shingle frame. Pair membership is
        // exploded into (pair, member) rows so the merge is an
        // EQUI-join against the register frame.
        val b = 8
        val m = 1L << b
        val num = SketchOps.hllNumerator(b)
        val sh = tp(s, dir, "documents")
          .select(col("source"),
            explode(array_distinct(TextOps.shingles(col("text"), 3))).as("sh"))
          .distinct()
        // coalesce(1): the register frame is SKETCH-bounded (≤ m rows
        // per source, m = 256 here) at any corpus size, so its final
        // aggregation stage and every downstream register-algebra pass
        // is 1-task by construction — the map-side (corpus-sized
        // shingle pass) keeps full parallelism. Unpinned at 32
        // partitions, each of the ~6 algebra rollups paid 32 task
        // launches over ~1k rows.
        val regs = SketchOps.hllRegistersBy(sh, col("source"), col("sh"), b)
          .withColumnRenamed("g", "source").coalesce(1).pin()
        def harmonic(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                     outName: String): DataFrame =
          grouped
            .agg(sum(expr("shiftleft(1L, cast(54 - mj as int))")).as("_sp"),
              count(lit(1)).as("_present"))
            .withColumn(outName,
              lit(num) / (col("_sp") + (lit(m) - col("_present")) * lit(1L << 54))
                .cast(DoubleType))
            .drop("_sp", "_present")
        val perSrc = harmonic(regs.groupBy("source"), "e")
        val srcs = regs.select("source").distinct()
        val pairs = srcs.as("a").crossJoin(srcs.as("b"))
          .filter(col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
        val members = pairs.select(col("src_a"), col("src_b"),
          explode(array(col("src_a"), col("src_b"))).as("source"))
        val unionEst = harmonic(
          members.join(regs, "source")
            .groupBy("src_a", "src_b", "bucket")
            .agg(max("mj").as("mj"))
            .groupBy("src_a", "src_b"), "e_union")
        unionEst
          .join(perSrc.select(col("source").as("src_a"), col("e").as("e_a")), "src_a")
          .join(perSrc.select(col("source").as("src_b"), col("e").as("e_b")), "src_b")
          .select(col("src_a"), col("src_b"),
            r4(col("e_a")).as("est_a"), r4(col("e_b")).as("est_b"),
            r4(col("e_union")).as("est_union"),
            r4(greatest(lit(0.0), col("e_a") + col("e_b") - col("e_union")))
              .as("est_inter"))
          .orderBy("src_a", "src_b")
      },
      // q135's shingle derivation + q107's register algebra, with the
      // pair merge re-derived over exploded (pair, member) rows
      Some(s"""WITH t AS (
             |  SELECT source, string_split_regex(trim(text), '\\s+') AS toks
             |  FROM documents),
             |s3 AS (
             |  SELECT source,
             |    CASE WHEN len(toks) >= 3
             |      THEN list_transform(generate_series(0, len(toks) - 3),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh3
             |  FROM t),
             |sh AS (SELECT DISTINCT source, unnest(sh3) AS sh FROM s3),
             |h AS (SELECT source,
             |    (('0x' || substr(md5(sh || ':hll'), 1, 15))::BIGINT) AS h
             |  FROM sh),
             |r AS (SELECT source, h % 256 AS bucket,
             |    CASE WHEN h // 256 = 0 THEN 53
             |         ELSE 53 - length(bin(h // 256)) END AS rho
             |  FROM h),
             |reg AS (SELECT source, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
             |est AS (
             |  SELECT source,
             |    ${SketchOps.hllNumerator(8)} /
             |      CAST(sum(1::BIGINT << CAST(54 - mj AS INT))
             |        + (256 - count(*)) * (1::BIGINT << 54) AS DOUBLE) AS e
             |  FROM reg GROUP BY source),
             |pairs AS (
             |  SELECT a.source AS src_a, b.source AS src_b
             |  FROM (SELECT DISTINCT source FROM reg) a
             |  JOIN (SELECT DISTINCT source FROM reg) b ON a.source < b.source),
             |members AS (
             |  SELECT src_a, src_b, src_a AS source FROM pairs
             |  UNION ALL SELECT src_a, src_b, src_b FROM pairs),
             |pregs AS (
             |  SELECT m.src_a, m.src_b, r2.bucket, max(r2.mj) AS mj
             |  FROM members m JOIN reg r2 USING (source)
             |  GROUP BY 1, 2, 3),
             |uest AS (
             |  SELECT src_a, src_b,
             |    ${SketchOps.hllNumerator(8)} /
             |      CAST(sum(1::BIGINT << CAST(54 - mj AS INT))
             |        + (256 - count(*)) * (1::BIGINT << 54) AS DOUBLE) AS e_union
             |  FROM pregs GROUP BY 1, 2)
             |SELECT u.src_a, u.src_b,
             |  floor(ea.e * 10000.0 + 0.5) / 10000.0 AS est_a,
             |  floor(eb.e * 10000.0 + 0.5) / 10000.0 AS est_b,
             |  floor(u.e_union * 10000.0 + 0.5) / 10000.0 AS est_union,
             |  floor(greatest(0.0, ea.e + eb.e - u.e_union) * 10000.0 + 0.5) / 10000.0
             |    AS est_inter
             |FROM uest u
             |JOIN est ea ON ea.source = u.src_a
             |JOIN est eb ON eb.source = u.src_b
             |ORDER BY u.src_a, u.src_b""".stripMargin)),
  )
}
