package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}

import graft.analytics._
import graft.etl.ChangeCapture
import graft.ext._
import graft.QueryCaches.Pinned

/** The registry's query record: name, plan builder, optional DuckDB
  * oracle SQL (column-name-identical to the Spark output — see the
  * conventions on [[Queries]]). */
case class Q(name: String,
             run: (SparkSession, String) => DataFrame,
             oracle: Option[String])

/** Shared plan builders and oracle-CTE generators for the query family
  * files (Queries*.scala): table loaders, rounding helpers, the purchase
  * graph, PCA/IVF/PQ fits and their unrolled DuckDB oracle forms. */
private[graft] object QueryHelpers {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Bipartite customer↔supplier purchase graph (shared by the graph
    * analytics family q89/q90/q153/q189): node ids disambiguated by
    * parity (customer c → 2c, supplier p → 2p+1), both edge directions
    * from one explode pass over the distinct pair set — same pattern as
    * [[graft.ext.DedupOps.resolveClusters]]'s edge build.
    *
    * SESSION-SHARED MATERIALIZATION (the [[minhashSigs]] pattern): the
    * orders⋈lineitem distinct+explode build is the family's dominant
    * cold cost (48M edges ≈ 50-70 s at the ×100 rehearsal) and is a
    * pure function of the corpus, so one persisted copy per
    * (session, dir) serves every graph query. GraphOps operators
    * additionally CacheManager-share their casted working copies
    * (plan-keyed), so the build was already paid once per FIRST
    * family query — this makes the amortization explicit and
    * independent of plan-equality accidents. */
  def purchaseGraph(s: SparkSession, dir: String): DataFrame =
    sharedFrame("pgraph", s, dir) {
      val cs = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
        .distinct()
      cs.select(explode(array(
          struct(col("c").as("src"), col("p").as("dst")),
          struct(col("p").as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }

  /** The 8-core of [[purchaseGraph]] at the q189 operating point —
    * memoized per (session, dir) like every other corpus-derived
    * artifact (IVF fit, MinHash signatures): k-core is iterative
    * (its per-round frames are fresh localCheckpoint RDDs, so
    * CacheManager plan-keying can never share repeat runs), and the
    * peeled core is a stable engagement-tier artifact a dashboard
    * queries many times per build. */
  def kCore8(s: SparkSession, dir: String): DataFrame =
    sharedFrame("kcore8r4", s, dir) {
      GraphOps.kCore(purchaseGraph(s, dir), k = 8, rounds = 4)
    }

  /** Depth-4 BFS labeling from the smallest node of [[purchaseGraph]]
    * (the q90 operating point) — memoized per (session, dir) for the
    * same reason as [[kCore8]]: bfsLevels truncates every round's
    * frontier to a fresh checkpoint RDD (GraphOps round-10 plan-growth
    * fix), so CacheManager plan-keying can never share repeat runs;
    * the shared-frame store can, and the reachability labeling is a
    * stable per-corpus artifact anyway. */
  def bfs4(s: SparkSession, dir: String): DataFrame =
    sharedFrame("bfs4", s, dir) {
      val g = purchaseGraph(s, dir)
      GraphOps.bfsLevels(g, g.agg(min(col("src")).as("id")), maxDepth = 4)
    }

  /** Oracle-side CTEs mirroring [[purchaseGraph]] (UNION ALL is exact:
    * the two directions are parity-disjoint). */
  val purchaseGraphCtes: String =
    """cs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS (
      |  SELECT c AS src, p AS dst FROM cs
      |  UNION ALL SELECT p AS src, c AS dst FROM cs)"""

  /** Unrolled fixed-point PageRank oracle (scale 1e6, damping 85/100 →
    * teleport term 150000 exactly): each round re-derives
    * rankᵢ = teleport + (85·Σ rankᵢ₋₁ div outdeg) div 100 in DuckDB's
    * truncating `//` — the same arithmetic GraphOps.pageRank runs, so
    * the full rank vector hash-matches. */
  /** The PageRank iteration CTEs alone (outdeg/nodes/r0/r1..rN),
    * expecting an `edges(src, dst)` CTE in scope — q89 instantiates it
    * on the purchase graph, q212 on the extracted link graph; the
    * caller writes its own final SELECT over `r<iters>`. */
  def pageRankRoundsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.id,
         |    CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r.pr // d.deg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN outdeg d ON d.src = e.src
         |    JOIN r${i - 1} r ON r.id = e.src
         |    GROUP BY 1) s ON s.id = n.id)"""
    }.mkString(",\n")
    s"""outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$rounds""".stripMargin
  }

  def pageRankOracleSql(iters: Int): String =
    s"""WITH $purchaseGraphCtes,
       |${pageRankRoundsSql(iters)}
       |SELECT id AS node_id, pr AS rank_fp FROM r$iters ORDER BY node_id""".stripMargin

  /** Unrolled synchronous label-propagation oracle mirroring
    * [[graft.analytics.GraphOps.labelPropagation]]: self-looped edge
    * list, per-round (node,label) counts, argmax with (count DESC,
    * label ASC) — the row_number form is exactly the engine's
    * max(struct(c, -lbl)). */
  def lpaOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT es.dst AS id, l.lbl, count(*) AS c
         |  FROM es JOIN l${i - 1} l ON l.id = es.src GROUP BY 1, 2),
         |l$i AS (
         |  SELECT id, lbl FROM (
         |    SELECT id, lbl,
         |      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH $purchaseGraphCtes,
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |es AS (SELECT src, dst FROM edges UNION ALL SELECT id, id FROM nodes),
       |l0 AS (SELECT id, id AS lbl FROM nodes),
       |$rounds
       |SELECT l$iters.id AS node_id, l$iters.lbl AS community,
       |  sz.n AS n_members
       |FROM l$iters JOIN (
       |  SELECT lbl, CAST(count(*) AS BIGINT) AS n FROM l$iters GROUP BY 1) sz
       |  ON sz.lbl = l$iters.lbl
       |ORDER BY node_id""".stripMargin
  }

  /** Shared PCA fit (q154/q191): globally int8-quantized embedding
    * frame (vec_id, label, q — pinned: the quantization scan serves
    * the Gram pass here and any projection consumer), plus the
    * SIGN-FIXED top principal direction (1e6 fixed point) and the
    * dominant-eigenvalue estimate from 6 integer power-iteration
    * rounds on the DRIVER over the collected d²-long covariance
    * (model-sized state — an in-plan iteration was measured
    * exponentially worse: each round's broadcast re-executes every
    * earlier round's uncached subtree, 2^6 re-evaluations). Scala Long
    * division truncates toward zero exactly like Spark's div and
    * DuckDB's //, so the driver arithmetic stays engine-portable. See
    * q154's scaladoc for the overflow envelope. */
  def pcaFit(s: SparkSession, dir: String): (DataFrame, Array[Long], Long) = {
    val emb = tp(s, dir, "embeddings")
    val gm = emb.agg(
      (greatest(max(graft.functions.VecExpressions.vecAbsMax(
        col("embedding"))), lit(1e-30)) / 127.0).as("gsc"))
    val qv = emb.crossJoin(broadcast(gm))
      .select(col("vec_id"), col("label"),
        expr("""transform(embedding, x ->
          CAST(greatest(-127.0D, least(127.0D,
            floor(CAST(x AS DOUBLE) / gsc + 0.5D))) AS BIGINT))""").as("q"))
      .pin()
    // Gram/sum accumulation as a per-partition d×d long accumulator
    // (the shape q154's scaladoc promises for scale): each partition
    // emits ONE (d², d, 1) partial instead of d² product rows per
    // VECTOR — the explode-flatten form this replaces shuffled 820M
    // rows at the ×100 rehearsal (77 s; this form runs the same data
    // in ~8 s). Long sums are exactly associative, so the partials
    // fold to bit-identical totals at any partitioning and the oracle
    // (which still states the relational form) is unchanged.
    import s.implicits._
    val d = embDim
    // treeAggregate, not mapPartitions+collect: the driver receives ONE
    // (d², d, 1) triple regardless of partition count (log-depth combine
    // on executors), so driver memory is O(d²) — not O(partitions·d²),
    // which at 100 TB (~1e5 partitions) would be GBs. Long addition is
    // exactly associative, so the totals are bit-identical to any other
    // fold order and the relational oracle is unchanged.
    val (gTot, sTot, n) = qv.select(col("q")).as[Array[Long]].rdd.treeAggregate(
      (Array.ofDim[Long](d * d), Array.ofDim[Long](d), 0L))(
      seqOp = { case ((g, sv, cnt), qrow) =>
        var i = 0
        while (i < d) {
          val qi = qrow(i); sv(i) += qi
          var j = 0
          while (j < d) { g(i * d + j) += qi * qrow(j); j += 1 }
          i += 1
        }
        (g, sv, cnt + 1)
      },
      combOp = { case ((g1, s1, n1), (g2, s2, n2)) =>
        var k = 0
        while (k < d * d) { g1(k) += g2(k); k += 1 }
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        (g1, s1, n1 + n2)
      })
    require(n > 0, "pcaFit: empty embedding corpus")
    // integer-centered covariance: same truncating division as Spark's
    // div / DuckDB's // (all operands here are exact longs)
    val cm = Array.tabulate(d, d)((i, j) => gTot(i * d + j) - (sTot(i) * sTot(j)) / n)
    val top0 = (0 until d).maxBy(i => (cm(i)(i), -i))
    var v = Array.tabulate(d)(i => if (i == top0) 1000000L else 0L)
    var lambdaEst = 0L
    val iters = 6
    for (k <- 1 to iters) {
      val m = Array.tabulate(d)(i =>
        (0 until d).map(j => cm(i)(j) * v(j)).sum)
      val mx = m.map(math.abs).max
      v = m.map(_ / math.max(mx / 1000000L, 1L))
      if (k == iters) lambdaEst = mx / 1000000L
    }
    val topAbs = (0 until d).maxBy(i => (math.abs(v(i)), -i))
    val sg = if (v(topAbs) < 0) -1L else 1L
    (qv, v.map(_ * sg), lambdaEst)
  }

  /** Unrolled k-core peeling oracle mirroring [[graft.analytics
    * .GraphOps.kCore]]: per round, degrees over the current edge set,
    * the ≥k survivor set, and the edge restriction — pure set algebra,
    * so the full surviving (node, degree) table hash-gates. */
  def kcoreOracleSql(k: Int, rounds: Int): String = {
    // MATERIALIZED: each e_i references e_{i-1} three times — left
    // inlined, DuckDB re-expands the chain 3^rounds times
    val steps = (1 to rounds).map { i =>
      s"""kp$i AS MATERIALIZED (
         |  SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN kp$i a ON a.src = e.src
         |  JOIN kp$i b ON b.src = e.dst)"""
    }.mkString(",\n")
    s"""WITH $purchaseGraphCtes,
       |e0 AS MATERIALIZED (SELECT src, dst FROM edges),
       |$steps
       |SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
       |FROM e$rounds GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Unrolled integer power-iteration oracle mirroring q154: global
    * int8 quantization, exact long Gram/sum accumulators, truncated
    * integer-centered covariance, and the fixed-point matvec
    * normalization — every `//` has the same truncate-toward-zero
    * semantics as Spark's `div`, so the full eigvector hash-gates. */
  /** CTE prefix shared by the PCA-derived oracles (q154/q191): ends
    * with `qv(vec_id, label, q)`, `v$iters(i, v)` (UNSIGNED top
    * direction), `sg(sg)` (the sign fix) and `le(lambda_est)`. */
  def pcaOracleCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT cm.i, CAST(sum(cm.c * v.v) AS BIGINT) AS m
         |  FROM cm JOIN v${i - 1} v ON v.i = cm.j GROUP BY 1),
         |x$i AS MATERIALIZED (SELECT max(abs(m)) AS mx FROM m$i),
         |v$i AS MATERIALIZED (
         |  SELECT i, m // greatest(mx // 1000000, 1) AS v
         |  FROM m$i CROSS JOIN x$i)"""
    }.mkString(",\n")
    s"""gm AS (
       |  SELECT greatest(max(list_max(list_transform(embedding,
       |    x -> abs(x::DOUBLE)))), 1e-30) / 127.0 AS gsc
       |  FROM embeddings),
       |qv AS MATERIALIZED (
       |  SELECT vec_id, label, list_transform(embedding, x ->
       |    CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / gsc + 0.5)))
       |      AS BIGINT)) AS q
       |  FROM embeddings CROSS JOIN gm),
       |el AS (
       |  SELECT vec_id, unnest(generate_series(0, len(q) - 1)) AS i, q
       |  FROM qv),
       |e2 AS MATERIALIZED (SELECT vec_id, i, q[i + 1] AS qi FROM el),
       |sv AS MATERIALIZED (SELECT i, CAST(sum(qi) AS BIGINT) AS s FROM e2 GROUP BY 1),
       |gr AS MATERIALIZED (
       |  SELECT a.i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS g
       |  FROM e2 a JOIN e2 b USING (vec_id) GROUP BY 1, 2),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |cm AS MATERIALIZED (
       |  SELECT gr.i, gr.j, gr.g - (sa.s * sb.s) // nn.n AS c
       |  FROM gr JOIN sv sa ON sa.i = gr.i JOIN sv sb ON sb.i = gr.j
       |  CROSS JOIN nn),
       |t0 AS (SELECT i AS ti FROM cm WHERE i = j ORDER BY c DESC, i LIMIT 1),
       |v0 AS (
       |  SELECT DISTINCT cm.i,
       |    CASE WHEN cm.i = t0.ti THEN 1000000 ELSE 0 END AS v
       |  FROM cm CROSS JOIN t0),
       |$rounds,
       |sg AS (
       |  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
       |  FROM v$iters ORDER BY abs(v) DESC, i LIMIT 1),
       |le AS (SELECT mx // 1000000 AS lambda_est FROM x$iters)""".stripMargin
  }

  def pcaOracleSql(iters: Int): String =
    s"""WITH ${pcaOracleCtes(iters)}
       |SELECT v.i AS dim, CAST(v.v * sg.sg AS BIGINT) AS v_fp,
       |  CAST(lambda_est AS BIGINT) AS lambda_est
       |FROM v$iters v CROSS JOIN sg CROSS JOIN le
       |ORDER BY dim""".stripMargin

  /** SCD2 state intervals from the event log (shared by q96/q101):
    * consecutive repeats collapsed, half-open [valid_from, valid_to)
    * windows, NULL open end. Two windows + a filter on one key. */
  def eventStateIntervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tss"), col("event_id"))
    t(s, dir, "events")
      .withColumn("tss", unix_timestamp(date_trunc("second", col("ts"))))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), col("tss"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("valid_from", col("tss"))
      .withColumn("valid_to", lead(col("tss"), 1).over(w))
  }

  /** Oracle CTE prefix mirroring [[eventStateIntervals]]. */
  val scd2OracleCtes: String =
    """s AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(EXTRACT(EPOCH FROM date_trunc('second', ts)) AS BIGINT) AS tss
      |  FROM events),
      |c AS (
      |  SELECT user_id, event_id, event_type AS state, tss,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev
      |  FROM s),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> state),
      |iv AS (
      |  SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, state,
      |    tss AS valid_from, lead(tss) OVER w AS valid_to
      |  FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id))"""

  /** The two deterministic snapshot versions of `orders` shared by the
    * CDC queries (q100/q102): every 11th key deleted, every 7th
    * repriced (+1.00 before fixed-point conversion, so both engines run
    * the identical IEEE ops), every 17th re-keyed as an insert. */
  def ordersSnapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val snapA = base.select(col("o_orderkey"), col("o_orderstatus"),
      floor(col("o_totalprice") * 100).cast(LongType).as("price_fp"))
    val snapB = base.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 7 === 0,
          floor((col("o_totalprice") + 1.0) * 100))
          .otherwise(floor(col("o_totalprice") * 100))
          .cast(LongType).as("price_fp"))
      .unionByName(base.filter(col("o_orderkey") % 17 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast(LongType).as("price_fp")))
    (snapA, snapB)
  }

  /** Oracle CTE prefix mirroring [[ordersSnapshots]]. */
  val snapshotOracleCtes: String =
    """base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_fp
      |  FROM orders),
      |a AS (SELECT o_orderkey, o_orderstatus, price_fp FROM base),
      |b AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 7 = 0
      |         THEN CAST(floor((o_totalprice + 1.0) * 100) AS BIGINT)
      |         ELSE price_fp END AS price_fp
      |  FROM base WHERE o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_orderstatus, price_fp
      |  FROM base WHERE o_orderkey % 17 = 0)"""

  /** Table load + CONDITIONAL repartition to cluster parallelism: the
    * right plan when a narrow scan of few files feeds CPU-bound per-row
    * work (regex/tokenize/hash) — a single parquet row group is one
    * split, so without the repartition the whole text pipeline runs on
    * one core. The condition is the fix for the other end of the scale:
    * at corpus sizes where the scan already plans >= cores splits, the
    * old unconditional form was a full-corpus round-robin shuffle (plus
    * its sort-before-repartition pass) that moved every row to decide
    * nothing (guide §2.4). The scan's planned split count is a pure
    * function of the file layout — memoized per (session, dir, table)
    * so the 100+ call sites don't re-plan the probe. */
  def tp(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(s, dir, name)
    val cores = s.sparkContext.defaultParallelism
    val parts = scanParts.getOrBuild(s, (dir, name))(df.rdd.getNumPartitions)
    if (parts < cores) df.repartition(cores) else df
  }

  private val scanParts = new graft.SessionMemo[(String, String), Int]

  /** Engine-portable rounding: floor(x*10^n + 0.5)/10^n computed with
    * the SAME fp ops the oracle SQL uses, so both engines produce
    * bit-identical rounded values. Engine round() primitives disagree on
    * manufactured ties (observed 1/100k rows at sf0.1: DuckDB's
    * multiply-then-std::round vs Spark's BigDecimal HALF_UP). */
  def rnd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }
  def r4(c: Column): Column = rnd(c, 4)
  def r6(c: Column): Column = rnd(c, 6)

  /** Shared by the model-evaluation queries (q123/q124): the q120
    * linear scorer's exact-long logit per document plus the binary
    * lang='en' label. */
  def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    val nTokens = TextOps.tokenCount(col("text")).cast(LongType)
    val stopHits = TextOps
      .wordSetHits(col("text"),
        Seq("the", "a", "of", "and", "to", "in", "is", "that"))
      .cast(LongType)
    val nDigits = regexp_count(col("text"), lit("[0-9]")).cast(LongType)
    tp(s, dir, "documents")
      .select(col("doc_id"),
        (lit(3L) * col("n_chars") + lit(5L) * nTokens -
          lit(2L) * nDigits + lit(11L) * stopHits).as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("label"))
  }

  /** The q140 classifier's standardized feature frame (shared by the
    * calibration query q160): q31-rule labels + four surface features,
    * z-scored against broadcast corpus moments, persisted. */
  def qualityLrFrame(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val nt = TextOps.tokenCount(txt).cast(DoubleType)
    val f0 = tp(s, dir, "documents")
      .filter(TextOps.tokenCount(txt) > 0)
      .select(
        when(TextOps.qualityScore(txt) >= 0.7, 1.0).otherwise(0.0).as("y"),
        nt.as("x1"),
        TextOps.punctRatio(txt).as("x2"),
        TextOps.stopwordRatio(txt).as("x3"),
        (size(array_distinct(TextOps.tokens(txt))).cast(DoubleType) /
          greatest(nt, lit(1.0))).as("x4"))
    val stRow = f0.agg(
      avg("x1").as("m1"), greatest(stddev_pop("x1"), lit(1e-12)).as("s1"),
      avg("x2").as("m2"), greatest(stddev_pop("x2"), lit(1e-12)).as("s2"),
      avg("x3").as("m3"), greatest(stddev_pop("x3"), lit(1e-12)).as("s3"),
      avg("x4").as("m4"), greatest(stddev_pop("x4"), lit(1e-12)).as("s4"))
    f0.crossJoin(broadcast(stRow))
      .select(col("y") +: Seq("z1", "z2", "z3", "z4").zipWithIndex.map {
        case (z, i) =>
          ((col(s"x${i + 1}") - col(s"m${i + 1}")) / col(s"s${i + 1}")).as(z)
      }: _*)
      .pin()
  }

  /** Oracle CTE chain for the q140 hard-sigmoid LR fit, shared with the
    * calibration query q160: feature/label derivation, standardization,
    * the full 6-step GD unroll, ending with `sc(y, p)` scored under the
    * final weights `w6`. DuckDB re-derives the identical weights
    * because the hard sigmoid keeps every operation in IEEE-exact
    * rational arithmetic (final rounding absorbs summation-order
    * noise). */
  val qualityLrOracleCtes: String = {
    val head =
      """WITH toksq AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS t,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS DOUBLE) AS stop_hits,
        |    CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS DOUBLE) AS n_punct
        |  FROM documents),
        |f0 AS (
        |  SELECT doc_id,
        |    CASE WHEN floor((least(n_tokens / 64.0, 1.0) * 0.4
        |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
        |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 >= 0.7
        |      THEN 1.0 ELSE 0.0 END AS y,
        |    n_tokens AS x1,
        |    n_punct / greatest(length(text), 1.0) AS x2,
        |    stop_hits / greatest(n_tokens, 1.0) AS x3,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / greatest(n_tokens, 1.0) AS x4
        |  FROM toksq WHERE len(t) > 0),
        |st AS (
        |  SELECT avg(x1) m1, greatest(stddev_pop(x1), 1e-12) s1,
        |         avg(x2) m2, greatest(stddev_pop(x2), 1e-12) s2,
        |         avg(x3) m3, greatest(stddev_pop(x3), 1e-12) s3,
        |         avg(x4) m4, greatest(stddev_pop(x4), 1e-12) s4
        |  FROM f0),
        |f AS (
        |  SELECT y, (x1-m1)/s1 AS z1, (x2-m2)/s2 AS z2,
        |         (x3-m3)/s3 AS z3, (x4-m4)/s4 AS z4
        |  FROM f0 CROSS JOIN st),
        |w0 AS (SELECT 0.0 wb, 0.0 w1, 0.0 w2, 0.0 w3, 0.0 w4)""".stripMargin
    val steps = (1 to 6).map { i =>
      s""",
         |p$i AS (SELECT y, z1, z2, z3, z4,
         |  least(greatest((wb + w1*z1 + w2*z2 + w3*z3 + w4*z4) * 0.25 + 0.5, 0), 1) AS p
         |  FROM f CROSS JOIN w${i - 1}),
         |g$i AS (SELECT avg(p - y) gb, avg((p-y)*z1) g1, avg((p-y)*z2) g2,
         |  avg((p-y)*z3) g3, avg((p-y)*z4) g4 FROM p$i),
         |w$i AS (SELECT wb - 2.0*gb AS wb, w1 - 2.0*g1 AS w1, w2 - 2.0*g2 AS w2,
         |  w3 - 2.0*g3 AS w3, w4 - 2.0*g4 AS w4 FROM w${i - 1} CROSS JOIN g$i)""".stripMargin
    }.mkString
    val sc =
      """,
        |sc AS (SELECT y,
        |  least(greatest((wb + w1*z1 + w2*z2 + w3*z3 + w4*z4) * 0.25 + 0.5, 0), 1) AS p
        |  FROM f CROSS JOIN w6)""".stripMargin
    head + steps + sc
  }

  /** Oracle CTE mirroring [[scoredDocs]] (ends with table `sc`). */
  val scoredDocsCte: String =
    """WITH f AS (
      |  SELECT doc_id, n_chars, lang,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
      |    len(regexp_extract_all(text, '[0-9]')) AS n_digits
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(3 * n_chars + 5 * n_tokens - 2 * n_digits + 11 * stop_hits AS BIGINT) AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      |  FROM f)""".stripMargin

  /** Dimensionality of the test embeddings table (fixed by TESTDATA.md);
    * the hyperplane-LSH queries and their generated oracle SQL share it. */
  val embDim = 64

  /** Parameterized oracle CTE fragment RE-DERIVING the IVF fit in SQL:
    * portable-hash sample init, two Lloyd rounds over the
    * ~[[graft.ext.SimilarityOps.ivfFitSampleCap]]-row hash-threshold
    * sample `<p>fit` (the full corpus at gate scale, where the
    * threshold admits every row) with exact fixed-point mean sums
    * (order-independent in both engines), 6-decimal normalized
    * centroids, final assignment `<p>asgF` over the FULL `<p>corpus`
    * (defined by `corpusSql`, columns (cid, v DOUBLE[])). Every CTE
    * name is prefixed with `p` so two fits (q207's frozen + re-fit)
    * compose in one statement; the centroid and assignment CTEs are
    * MATERIALIZED — DuckDB inlines CTEs per reference, and an inlined
    * k-means chain re-fits once per downstream mention. Possible
    * because every ivfFit arithmetic step is engine-portable. */
  def ivfFitCtes(corpusSql: String, p: String = ""): String = {
    val P = graft.ext.PortableHash.P
    // one spherical-k-means round: assignment against cent${r-1},
    // fixed-point mean, normalize+round; empty clusters keep their
    // previous centroid (the LEFT JOIN + COALESCE)
    def round(r: Int): String =
      s"""${p}asg$r AS (
         |  SELECT cid, v, kid FROM (
         |    SELECT c.cid, c.v, k.kid,
         |      row_number() OVER (PARTITION BY c.cid
         |        ORDER BY list_dot_product(c.v, k.c) DESC, k.kid DESC) AS rn
         |    FROM ${p}fit c CROSS JOIN ${p}cent${r - 1} k) t WHERE rn = 1),
         |${p}sums$r AS (
         |  SELECT kid, pos, CAST(sum(CAST(floor(v[pos] * 10000000.0) AS BIGINT)) AS DOUBLE) AS sf, count(*) AS n
         |  FROM ${p}asg$r CROSS JOIN generate_series(1, $embDim) AS g(pos)
         |  GROUP BY kid, pos),
         |${p}newc$r AS (
         |  SELECT kid, list(sf / n / 10000000.0 ORDER BY pos) AS m FROM ${p}sums$r GROUP BY kid),
         |${p}norm$r AS (
         |  SELECT kid, m, sqrt(list_sum(list_transform(m, x -> x * x))) AS nn FROM ${p}newc$r),
         |${p}cent$r AS MATERIALIZED (
         |  SELECT k.kid, COALESCE(list_transform(n.m,
         |      x -> CASE WHEN n.nn > 0 THEN floor(x / n.nn * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END), k.c) AS c
         |  FROM ${p}cent${r - 1} k LEFT JOIN ${p}norm$r n USING (kid)),""".stripMargin
    s"""${p}corpus AS MATERIALIZED (
       |  $corpusSql),
       |${p}fit AS MATERIALIZED (
       |  SELECT cid, v FROM ${p}corpus
       |  WHERE ('0x' || substr(md5(cid::VARCHAR), 1, 15))::BIGINT % $P <
       |    $P // greatest(1, CAST(ceil((SELECT count(*) FROM ${p}corpus) /
       |      ${graft.ext.SimilarityOps.ivfFitSampleCap}.0) AS BIGINT))),
       |${p}samp AS (
       |  SELECT v FROM ${p}corpus
       |  ORDER BY ('0x' || substr(md5(cid::VARCHAR), 1, 15))::BIGINT % $P, cid
       |  LIMIT 16),
       |${p}sampn AS (
       |  SELECT list_transform(v,
       |      x -> CASE WHEN nn > 0 THEN floor(x / nn * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END) AS c
       |  FROM (SELECT v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn FROM ${p}samp) t),
       |${p}cent0 AS (SELECT row_number() OVER (ORDER BY c) - 1 AS kid, c FROM ${p}sampn),
       |${round(1)}
       |${round(2)}
       |${p}asgF AS MATERIALIZED (
       |  SELECT cid, v, kid FROM (
       |    SELECT c.cid, c.v, k.kid,
       |      row_number() OVER (PARTITION BY c.cid
       |        ORDER BY list_dot_product(c.v, k.c) DESC, k.kid DESC) AS rn
       |    FROM ${p}corpus c CROSS JOIN ${p}cent2 k) t WHERE rn = 1)""".stripMargin
  }

  /** Oracle CTE chain for the q41/q70 shape: the [[ivfFitCtes]] fit
    * over the full embeddings table plus the query set `q` and probe
    * set `probe` (nlist=16, nprobe=4). Callers append a scoring tail. */
  lazy val ivfOracleCtes: String =
    s"""WITH ${ivfFitCtes(
         "SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")},
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 16),
       |probe AS (
       |  SELECT qid, kid FROM (
       |    SELECT q.qid, k.kid,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_dot_product(q.qv, k.c) DESC, k.kid ASC) AS rn
       |    FROM q CROSS JOIN cent2 k) t WHERE rn <= 4)""".stripMargin

  /** Oracle CTE body replaying [[graft.ext.CorpusPipeline.cleanSummary]]
    * — language gate → quality gate → exact dedup → fingerprint
    * near-dup resolution → one-row attrition funnel — over any
    * `(doc_id, text)` source CTE/table `src`. q48 instantiates it on
    * the raw `documents` table; q211 on the HTML-extraction CTE
    * (funnel-after-ingress, same body — the two gates can never
    * diverge in their funnel arithmetic). Caller prepends `WITH `. */
  def corpusFunnelSql(src: String): String =
    s"""h AS (
       |  SELECT doc_id, text,
       |    len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|that)\\b')) AS h_en,
       |    len(regexp_extract_all(text, '\\b(el|la|de|que|y|en|un|es)\\b')) AS h_es,
       |    len(regexp_extract_all(text, '\\b(der|die|das|und|ist|von|ein|zu)\\b')) AS h_de,
       |    len(regexp_extract_all(text, '\\b(le|la|de|et|un|est|que|en)\\b')) AS h_fr
       |  FROM $src),
       |u AS (
       |  SELECT doc_id, unnest(['de','en','es','fr']) AS code,
       |         unnest([h_de, h_en, h_es, h_fr]) AS hits,
       |         unnest([0, 1, 2, 3]) AS rank
       |  FROM h),
       |best AS (
       |  SELECT doc_id, arg_max(code, hits * 10 + rank) AS code, max(hits) AS mh
       |  FROM u GROUP BY doc_id),
       |lang AS (
       |  SELECT doc_id, CASE WHEN mh > 0 THEN code ELSE 'und' END AS pred FROM best),
       |toks AS (
       |  SELECT doc_id, text,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|that)\\b')) AS stop_hits,
       |    length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS n_punct
       |  FROM $src),
       |qual AS (
       |  SELECT doc_id,
       |    floor((least(n_tokens / 64.0, 1.0) * 0.4
       |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
       |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS quality
       |  FROM toks),
       |g AS (
       |  SELECT d.doc_id, d.text FROM $src d
       |  JOIN lang ON lang.doc_id = d.doc_id
       |  JOIN qual ON qual.doc_id = d.doc_id
       |  WHERE lang.pred = 'en' AND qual.quality >= 0.5),
       |e AS (SELECT DISTINCT text FROM g),
       |sh AS (
       |  SELECT CASE WHEN len(tk) >= 5
       |    THEN list_transform(generate_series(0, len(tk) - 5),
       |           i -> array_to_string(list_slice(tk, i + 1, i + 5), ' '))
       |    ELSE [array_to_string(tk, ' ')] END AS sh
       |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS tk FROM e)),
       |f AS (SELECT list_min(list_transform(sh, x -> md5(x))) AS fp FROM sh)
       |SELECT (SELECT count(*) FROM $src) AS n_input,
       |       (SELECT count(*) FROM g) AS n_gated,
       |       (SELECT count(*) FROM e) AS n_exact,
       |       (SELECT count(DISTINCT fp) FROM f) AS n_final""".stripMargin

  /** q163's IPF fit on collected model-sized cells, shared with the
    * apply query q169: (source, lang, n_docs, obs_fp, raked_fp,
    * weight_fp) — see q163's scaladoc for the arithmetic contract. */
  def ipfRakedCells(s: SparkSession, dir: String)
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val cells = tp(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val total = cells.map(_._3).sum
    val nSources = cells.map(_._1).distinct.length
    val rowT = 1000000000L / nSources
    val colT: Map[String, Long] = cells.groupBy(_._2)
      .map { case (l, cs) => l -> (cs.map(_._3).sum * 1000000000L) / total }
    var m: Map[(String, String), Long] =
      cells.map(x => (x._1, x._2) -> (x._3 * 1000000000L) / total).toMap
    for (_ <- 1 to 3) {
      val rowSum = m.groupBy(_._1._1).map { case (src, e) => src -> e.values.sum }
      m = m.map { case ((src, l), v) => (src, l) -> (v * rowT) / rowSum(src) }
      val colSum = m.groupBy(_._1._2).map { case (l, e) => l -> e.values.sum }
      m = m.map { case ((src, l), v) => (src, l) -> (v * colT(l)) / colSum(l) }
    }
    cells.map { case (src, l, n) =>
      val obs = (n * 1000000000L) / total
      val rk = m((src, l))
      (src, l, n, obs, rk, (rk * 1000000L) / obs)
    }.toSeq
  }

  /** UniMax water-filling allocation frame (shared by q178/q184): one
    * token-count scan, then lang-cardinality windows. Columns: lang,
    * n_tokens, cap_tokens, n_total, s_langs, budget, capped (int),
    * water_level, alloc_tokens. Cap E = 1 epoch, budget = 80% of the
    * corpus — see q178's scaladoc for the closed-form derivation. */
  def unimaxAlloc(s: SparkSession, dir: String): DataFrame = {
    val ns = tp(s, dir, "documents")
      .groupBy("lang")
      .agg(sum(TextOps.tokenCount(col("text")).cast(LongType)).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens")) // epoch cap E = 1
    val tot = ns.agg(sum("n_tokens").as("n_total"),
      count(lit(1)).as("s_langs"))
    val w = Window.orderBy("cap_tokens", "lang")
    val ranked = ns.crossJoin(broadcast(tot))
      .withColumn("budget", expr("(4 * n_total) div 5"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cumcap", sum("cap_tokens").over(w))
      .withColumn("b_here",
        (col("cap_tokens") * (col("s_langs") - col("rn") + 1) <=
          col("budget") - (col("cumcap") - col("cap_tokens")))
          .cast(IntegerType))
      .withColumn("capped", min("b_here").over(w))
      .pin()
    val roll = ranked.agg(
      sum("capped").cast(LongType).as("k_capped"),
      sum(col("capped") * col("cap_tokens")).as("capsum"))
    ranked.crossJoin(broadcast(roll))
      .withColumn("water_level",
        when(col("s_langs") > col("k_capped"),
          expr("(budget - capsum) div (s_langs - k_capped)"))
          .otherwise(lit(0L)))
      .withColumn("alloc_tokens",
        when(col("capped") === 1, col("cap_tokens"))
          .otherwise(col("water_level")))
  }

  /** Oracle CTE chain mirroring [[unimaxAlloc]] (shared by q178/q184):
    * ends with `ua(lang, n_tokens, cap_tokens, capped, water_level,
    * alloc_tokens, n_total, s_langs)`. */
  val unimaxOracleCtes: String =
    """ns AS (
      |  SELECT lang,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total,
      |    CAST(count(*) AS BIGINT) AS s_langs FROM ns),
      |rk AS (
      |  SELECT lang, n_tokens, n_tokens AS cap_tokens, n_total, s_langs,
      |    (4 * n_total) // 5 AS budget,
      |    row_number() OVER (ORDER BY n_tokens, lang) AS rn,
      |    sum(n_tokens) OVER (ORDER BY n_tokens, lang) AS cumcap
      |  FROM ns CROSS JOIN tot),
      |fl AS (
      |  SELECT *, CASE WHEN cap_tokens * (s_langs - rn + 1)
      |      <= budget - (cumcap - cap_tokens) THEN 1 ELSE 0 END AS b_here
      |  FROM rk),
      |cp AS (
      |  SELECT *, min(b_here) OVER (ORDER BY cap_tokens, lang) AS capped
      |  FROM fl),
      |roll AS (
      |  SELECT CAST(sum(capped) AS BIGINT) AS k_capped,
      |    CAST(sum(capped * cap_tokens) AS BIGINT) AS capsum FROM cp),
      |ua AS (
      |  SELECT lang, n_tokens, cap_tokens, CAST(capped AS BIGINT) AS capped,
      |    CAST(CASE WHEN s_langs > k_capped
      |      THEN (budget - capsum) // (s_langs - k_capped)
      |      ELSE 0 END AS BIGINT) AS water_level,
      |    CAST(CASE WHEN capped = 1 THEN cap_tokens
      |      WHEN s_langs > k_capped
      |      THEN (budget - capsum) // (s_langs - k_capped)
      |      ELSE 0 END AS BIGINT) AS alloc_tokens,
      |    n_total, s_langs
      |  FROM cp CROSS JOIN roll)""".stripMargin

  /** Oracle CTE prefix mirroring [[ipfRakedCells]] (shared by
    * q163/q169): ends with `r3b(source, lang, n, m)` and `tot(t, ns)`. */
  val ipfOracleCtes: String = {
    val rounds = (1 to 3).map { r =>
      val prev = if (r == 1) "m0" else s"r${r - 1}b"
      s"""r${r}a AS (
         |  SELECT source, lang, n,
         |    CAST((m * (1000000000 // ns)) // (sum(m) OVER (PARTITION BY source)) AS BIGINT) AS m
         |  FROM $prev CROSS JOIN tot),
         |r${r}b AS (
         |  SELECT r.source, r.lang, r.n,
         |    CAST((r.m * ct.ctf) // (sum(r.m) OVER (PARTITION BY r.lang)) AS BIGINT) AS m
         |  FROM r${r}a r JOIN ct USING (lang))"""
    }.mkString(",\n")
    s"""WITH c AS (
       |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS t,
       |    CAST(count(DISTINCT source) AS BIGINT) AS ns FROM c),
       |ct AS (
       |  SELECT lang, CAST((sum(n) * 1000000000) // t AS BIGINT) AS ctf
       |  FROM c CROSS JOIN tot GROUP BY lang, t),
       |m0 AS (
       |  SELECT source, lang, n, CAST((n * 1000000000) // t AS BIGINT) AS m
       |  FROM c CROSS JOIN tot),
       |$rounds"""
  }

  /** Subspace distance to one centroid LITERAL — codegen'd, no join
    * (expects the 16-element `subq` column). */
  def pqDistTo(cv: Array[Long]): Column = expr(
    s"""aggregate(zip_with(subq, array(${cv.map(_ + "L").mkString(",")}),
      (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)""")

  /** Argmin over one subspace's codebook, ties to the smaller kid. */
  def pqArgminFor(cent: Array[Array[Array[Long]]], sb: Int): Column =
    array_min(array(cent(sb).zipWithIndex.map { case (cv, j) =>
      struct(pqDistTo(cv).as("d"), lit(j).as("k"))
    }: _*)).getField("k")

  /** Per-row PQ code: CASE over the subspace id, each branch a literal
    * codebook argmin. */
  def pqKidExpr(cent: Array[Array[Array[Long]]]): Column =
    when(col("s") === 0, pqArgminFor(cent, 0))
      .when(col("s") === 1, pqArgminFor(cent, 1))
      .when(col("s") === 2, pqArgminFor(cent, 2))
      .otherwise(pqArgminFor(cent, 3))

  /** Per-row assigned-code squared distance (the PQ residual): the min
    * over the subspace's codebook — same structs as [[pqArgminFor]],
    * `d` field instead of `k`. */
  def pqMinDistExpr(cent: Array[Array[Array[Long]]]): Column = {
    def minFor(sb: Int): Column =
      array_min(array(cent(sb).zipWithIndex.map { case (cv, j) =>
        struct(pqDistTo(cv).as("d"), lit(j).as("k"))
      }: _*)).getField("d")
    when(col("s") === 0, minFor(0)).when(col("s") === 1, minFor(1))
      .when(col("s") === 2, minFor(2)).otherwise(minFor(3))
  }

  /** q168's PQ codebook fit, shared with the distortion profile q171:
    * globally int8-quantized corpus (q154's quantization), 4 subspaces
    * × 16 dims, 16-centroid integer codebooks trained by 2 k-means
    * rounds (codegen'd literal argmin assignment, truncating integer
    * means updated on collected MODEL-sized sums). Returns the pinned
    * quantized frame (vec_id, q), the pinned subvector frame
    * (vec_id, s, subq), and the trained 4×16×16 codebook.
    *
    * Memoized per (session, dir) — the [[graft.ext.SimilarityOps.ivfFitCached]]
    * discipline: the fit's two k-means rounds each run a codebook-argmin
    * scan plus a (corpus·64)-row posexplode rollup, which a per-call fit
    * re-paid on EVERY q168/q171 execution (measured ~2/3 of q168's warm
    * time at the ×1000 rehearsal). The codebook is a pure function of
    * the corpus, so one fit per session serves all callers. */
  def pqFitted(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Array[Long]]]) =
    pqFits.getOrBuild(s, dir)(pqFitBuild(s, dir))

  private val pqFits = new graft.SessionMemo[
    String, (DataFrame, DataFrame, Array[Array[Array[Long]]])]

  private def pqFitBuild(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Array[Long]]]) = {
    val emb = tp(s, dir, "embeddings")
    val gm = emb.agg(
      (greatest(max(graft.functions.VecExpressions.vecAbsMax(
        col("embedding"))), lit(1e-30)) / 127.0).as("gsc"))
    // durable through FrameStore when configured (identity otherwise):
    // the quantized corpus and trained codebook publish once per
    // corpus, so a FRESH SESSION re-hydrates the fit from parquet
    // instead of re-paying the quantization pass + 2 k-means rounds
    val qv = graft.etl.FrameStore.getOrBuild(s, dir, "pq-qv") {
      emb.crossJoin(broadcast(gm))
        .select(col("vec_id"),
          expr("""transform(embedding, x ->
            CAST(greatest(-127.0D, least(127.0D,
              floor(CAST(x AS DOUBLE) / gsc + 0.5D))) AS BIGINT))""").as("q"))
    }
      // bare persist, NOT .pin(): the fit is session-shared (the
      // ivfFitCached/sharedFrame discipline), so a sweep's per-query
      // drain() must never evict it — pinned qv/sub silently re-ran
      // the quantization pipeline on every post-drain q168/q171 call
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sub = qv.select(col("vec_id"), explode(expr(
        """transform(sequence(0, 3), s ->
          named_struct('s', CAST(s AS INT), 'subq', slice(q, s * 16 + 1, 16)))"""))
        .as("t"))
      .select(col("vec_id"), col("t").getField("s").as("s"),
        col("t").getField("subq").as("subq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lazy val trained: Array[Array[Array[Long]]] = {
      val smp = qv
        .orderBy(PortableHash.base(col("vec_id").cast("string")), col("vec_id"))
        .limit(16).select("q").collect()
        .map(_.getSeq[Long](0).toArray)
      var cent: Array[Array[Array[Long]]] = Array.tabulate(4, 16) {
        (sb, j) => Array.tabulate(16)(p => smp(j)(sb * 16 + p))
      }
      for (_ <- 1 to 2) {
        val sums = sub.withColumn("kid", pqKidExpr(cent))
          .select(col("s"), col("kid"),
            posexplode(col("subq")).as(Seq("p0", "x")))
          .groupBy("s", "kid", "p0")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .collect()
        val upd = sums.map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4)))).toMap
        cent = Array.tabulate(4, 16) { (sb, j) =>
          Array.tabulate(16) { p =>
            upd.get((sb, j, p)) match {
              case Some((sx, n)) => sx / n
              case None => cent(sb)(j)(p)
            }
          }
        }
      }
      cent
    }
    val centFrame = graft.etl.FrameStore.getOrBuild(s, dir, "pq-cent") {
      import s.implicits._
      trained.zipWithIndex.flatMap { case (book, sb) =>
        book.zipWithIndex.flatMap { case (cv, kid) =>
          cv.zipWithIndex.map { case (c, pos) => (sb, kid, pos, c) }
        }
      }.toSeq.toDF("sb", "kid", "pos", "c")
    }
    val cent = {
      val rows = centFrame.collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
      Array.tabulate(4, 16)((sb, j) => Array.tabulate(16)(p => rows((sb, j, p))))
    }
    (qv, sub, cent)
  }

  /** Oracle CTE prefix re-deriving the full [[pqFitted]] codebook fit
    * (shared by q168/q171): ends with `dF(vec_id, s, kid, dist)` — all
    * 16 per-subspace code distances per vector under the final
    * codebook — and `aF(vec_id, s, kid)` — the assigned codes. */
  val pqOracleCtes: String = {
    val P = PortableHash.P
    val rounds = (1 to 2).map { r =>
      s"""d$r AS (
         |  SELECT e.vec_id, e.s, c.kid,
         |    CAST(sum((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS dist
         |  FROM e JOIN c${r - 1} c ON c.s = e.s AND c.pos = e.pos
         |  GROUP BY 1, 2, 3),
         |a$r AS (
         |  SELECT vec_id, s, kid FROM (
         |    SELECT vec_id, s, kid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, kid) AS rn
         |    FROM d$r) WHERE rn = 1),
         |m$r AS (
         |  SELECT a.s, a.kid, e.pos, CAST(sum(e.x) AS BIGINT) AS sx,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM a$r a JOIN e ON e.vec_id = a.vec_id AND e.s = a.s
         |  GROUP BY 1, 2, 3),
         |c$r AS (
         |  SELECT p.s, p.kid, p.pos, COALESCE(m.sx // m.n, p.c) AS c
         |  FROM c${r - 1} p LEFT JOIN m$r m
         |    ON m.s = p.s AND m.kid = p.kid AND m.pos = p.pos)"""
    }.mkString(",\n")
    s"""WITH gm AS (
       |  SELECT greatest(max(list_max(list_transform(embedding,
       |    x -> abs(x::DOUBLE)))), 1e-30) / 127.0 AS gsc
       |  FROM embeddings),
       |qv AS (
       |  SELECT vec_id, list_transform(embedding, x ->
       |    CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / gsc + 0.5)))
       |      AS BIGINT)) AS q
       |  FROM embeddings CROSS JOIN gm),
       |e AS (
       |  SELECT vec_id, (i // 16) AS s, (i % 16) + 1 AS pos, q[i + 1] AS x
       |  FROM (SELECT vec_id, q, unnest(generate_series(0, len(q) - 1)) AS i
       |        FROM qv)),
       |smp AS (
       |  SELECT q, rn - 1 AS j FROM (
       |    SELECT q, row_number() OVER (ORDER BY
       |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % $P,
       |      vec_id) AS rn
       |    FROM qv) WHERE rn <= 16),
       |c0 AS (
       |  SELECT (gi.i // 16) AS s, smp.j AS kid, (gi.i % 16) + 1 AS pos,
       |    smp.q[gi.i + 1] AS c
       |  FROM smp CROSS JOIN generate_series(0, 63) AS gi(i)),
       |$rounds,
       |dF AS (
       |  SELECT e.vec_id, e.s, c.kid,
       |    CAST(sum((e.x - c.c) * (e.x - c.c)) AS BIGINT) AS dist
       |  FROM e JOIN c2 c ON c.s = e.s AND c.pos = e.pos
       |  GROUP BY 1, 2, 3),
       |aF AS (
       |  SELECT vec_id, s, kid FROM (
       |    SELECT vec_id, s, kid,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, kid) AS rn
       |    FROM dF) WHERE rn = 1)"""
  }

  /** Session-shared corpus-derived frames for the dedup-verify family —
    * the [[graft.ext.SimilarityOps.ivfFitCached]] precedent applied to
    * text dedup: the per-document distinct 3-gram shingle sets and the
    * production MinHash candidate-pair frame are each a pure function of
    * the corpus, rebuilt identically by q46/q158/q172/q185/q186 before
    * this round. One persisted copy per (session, dir) now serves the
    * whole family (a production deployment persists the same artifacts
    * next to the corpus — [[graft.ext.SignatureStore]] is the durable
    * form). MEMORY_AND_DISK and NOT registered with [[QueryCaches]], so
    * a sweep's per-query drain() can't evict an index its later queries
    * share — the explicitly-amortized-index class, same as the IVF fit. */
  private val sharedFrames = new graft.SessionMemo[(String, String), DataFrame]

  // SessionMemo keys on CachePolicy.sessionId (weak-keyed UUID), not
  // identityHashCode: identity hashes can collide after an old session
  // is GC'd, which would serve a frame bound to a stopped SparkContext
  // to a new session. When a durable frame store is configured
  // (spark.graft.frameStore.path / SPARK_GRAFT_FRAME_STORE), the build
  // routes through [[graft.etl.FrameStore]]: the first session PAYS the
  // build and publishes it as parquet; every later session — including
  // a fresh process — answers off the stored artifact, which is the
  // 100 TB deployment shape (family indexes persisted next to the
  // corpus, not rebuilt per session).
  private def sharedFrame(key: String, s: SparkSession, dir: String)
                         (build: => DataFrame): DataFrame =
    sharedFrames.getOrBuild(s, (dir, key)) {
      graft.etl.FrameStore.getOrBuild(s, dir, key)(build)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** ExactSubstr dupSpanProfile oracle, parameterized to mirror
    * [[graft.ext.ExactSubstrOps.dupSpanProfile]] at any (gram length,
    * merge distance): rolling l-token grams on the md5-prefix key,
    * duplicated-key semi-filter, gaps-and-islands with gap ≤ mergeGap,
    * coverage per doc. q139 pins the 8-token fine setting; q194 the
    * longer-gram + merge-distance setting (Lee et al.'s 50-token
    * threshold regime scaled to this corpus's ~56-token median docs). */
  def exactSubstrOracleSql(l: Int, mergeGap: Int, limit: Int,
                           src: String = "documents",
                           prelude: String = ""): String =
    s"""WITH $prelude d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |  FROM $src),
       |nz AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM d
       |  WHERE len(t) >= $l),
       |gpos AS (SELECT doc_id, n, t,
       |  unnest(generate_series(0, CAST(n AS INT) - $l)) AS pos FROM nz),
       |g AS (SELECT doc_id, n, pos,
       |  substr(md5(array_to_string(t[pos + 1 : pos + $l], ' ')), 1, 15) AS gkey
       |  FROM gpos),
       |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, n, pos FROM g
       |  WHERE gkey IN (SELECT gkey FROM dup)),
       |m AS (SELECT doc_id, n, pos,
       |  max(pos + ${l - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM dp),
       |mk AS (SELECT doc_id, n, pos,
       |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 + $mergeGap
       |    THEN 1 ELSE 0 END AS ns
       |  FROM m),
       |sp AS (SELECT doc_id, n, pos,
       |  sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       |  FROM mk),
       |spans AS (SELECT doc_id, n, span_id, min(pos) AS st, max(pos) + ${l - 1} AS en
       |  FROM sp GROUP BY 1, 2, 3),
       |outp AS (SELECT doc_id, count(*) AS n_spans,
       |  sum(en - st + 1) AS dup_tokens, n AS n_tokens
       |  FROM spans GROUP BY doc_id, n)
       |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
       |  CAST(dup_tokens AS BIGINT) AS dup_tokens, n_tokens,
       |  CAST((10000 * dup_tokens) // n_tokens AS BIGINT) AS coverage_fp
       |FROM outp ORDER BY coverage_fp DESC, doc_id LIMIT $limit""".stripMargin

  /** Corpus table counts, one count job per (session, dir, table) —
    * the size probes that route diagnostics between their full-corpus
    * and sampled/auto-sized plans. Parquet count is metadata-cheap;
    * memoized so a sweep pays it once. */
  private val tableCounts = new graft.SessionMemo[(String, String), Long]

  def tableCount(s: SparkSession, dir: String, table: String): Long =
    tableCounts.getOrBuild(s, (dir, table))(t(s, dir, table).count())

  def documentCount(s: SparkSession, dir: String): Long =
    tableCount(s, dir, "documents")

  /** Above this corpus size the band-sensitivity diagnostic (q176)
    * runs on the deterministic 25% sample instead of the full corpus:
    * its finest arm (2-row bands) is quadratic BY CONSTRUCTION — it
    * materializes the candidate explosion the S-curve exists to warn
    * about — and at 5M docs it ran 27 minutes and failed a sweep with
    * an executor memory condition. Banding statistics are pair-level,
    * so precision transfers from the sample; candidate volume scales
    * ~(1/s)². The ×100 rehearsal corpus (500k docs) stays on the full
    * form; the ×1000 regime (5M) routes to the sample. */
  val BandSensitivityFullFormMaxDocs = 1000000L

  /** Above this corpus size q126's exact prefix-filtered set-similarity
    * join runs on a CONSTANT-SIZE deterministic sample (every m-th doc,
    * m = ⌈n/target⌉, reported as `sample_mod`): its candidate volume is
    * Σ f² over prefix-token document frequencies, which the round-11
    * sf1 sweep measured QUADRATIC in corpus size on this corpus
    * (312k → 36.2M candidates for 10× docs — rarest-per-doc shingles
    * are still common, so PPJoin's length + positional filters bound
    * the verify, not the join); a fractional sample (the first r11 cut)
    * only delays the blow-up (20 s at ×100, minutes at ×1000), while
    * the modulus cap pins the audit at ~target docs at ANY corpus
    * size. 20k keeps the driver gate (sf0.01, 2k docs) and the sf0.1
    * bench (5k docs) on the exact full form; the production-scale
    * exact-recall answer is the LSH cascade, with this operator as its
    * fixed-size audit. */
  val SetSimAuditTargetDocs = 20000L

  /** q50's capped-audit target — same rationale as
    * [[SetSimAuditTargetDocs]]: simhash band-bucket collisions grow
    * quadratically on a clustered corpus (22.9 s at ×100, minutes at
    * ×1000 even with the hamming-first shuffle fix). 50k keeps sf1 on
    * the exact full form. */
  val SimHashAuditTargetDocs = 50000L

  /** q197's capped-demo target: the CDC registry query rebuilds the
    * maintained gram index + the previous strip + one incremental step
    * on EVERY execution (a deployment pays the index once and keeps
    * it — the per-execution rebuild is demo scaffolding), and at ×1000
    * the un-capped all-grams index (≈280M rows over 5M docs) exhausted
    * the box's spill disk mid-sweep and poisoned the five queries
    * behind it. 100k docs keeps sf1 (50k) on the full form and bounds
    * the demo at any scale; `sample_mod` distinguishes capped runs. */
  val SubstrCdcTargetDocs = 100000L

  /** Every-m-th-doc modulus capping a corpus at ~`target` docs;
    * 1 = full form. SQL-expressible per corpus (the builder bakes the
    * literal m into plan AND output, so gated results are
    * distinguishable — the q176 `sampled`-flag precedent, generalized
    * to carry the sampling rate). */
  def auditSampleMod(s: SparkSession, dir: String, target: Long): Long =
    math.max(1L, (documentCount(s, dir) + target - 1) / target)

  /** Above this embedding-corpus size q47 stops pinning the
    * hyperplane-LSH width at signBits = 6 (64 buckets — the
    * oracle-expressible form) and routes through
    * [[graft.ext.SimilarityOps.autoSignBits]] instead: with pinned
    * width, bucket occupancy grows linearly with the corpus and the
    * within-bucket pair join quadratically — the ×1000 rehearsal
    * measured the pinned arm at 1311 s on 2M vectors vs 78 s for the
    * occupancy-targeted sizing. 500k keeps the ×100 regime (200k vecs,
    * 32 s) on the oracle-pinned form and gates the regime where the
    * pinned arm goes superlinear. The q47 output carries the bits
    * actually used (`sign_bits`), so gated results are distinguishable
    * from pinned ones — the q195 est_full_candidates precedent. */
  val EmbClusterPinnedBitsMaxVecs = 500000L

  /** q150's model-prune gate: above this many documents the trigram
    * LM drops singleton trigrams (n_abc = 1) from the model before
    * scoring — Brants et al.'s min-count pruning, the standard lever
    * that keeps the model side of the LM-scoring join broadcastable
    * at web scale (on a ScaleUp corpus, where copies make most
    * trigrams unique, singletons ARE the model: the ×1000 rehearsal's
    * scoring chain shuffled a ~50M-type model five times). Like the
    * q47/q176 gates, the output carries a `pruned` flag so gated
    * results are distinguishable, and the oracle corpus (sf0.01,
    * 2k docs) stays far below the gate on the exact full form. */
  val LmPruneMinDocs = 1000000L

  /** q150's trigram stupid-backoff LM (Brants et al., α = 2/5 exact):
    * train on even doc_ids, score odd doc_ids, all surprisals integer
    * reciprocals (see the q150 scaladoc for the per-class forms).
    * Returns the per-document aggregate frame (doc_id, n_trigrams,
    * n_tri_hit, n_backoff_bi, n_backoff_uni, n_oov, avg_surprisal_fp),
    * unordered. `pruneSingletons` derives EVERY model table from the
    * singleton-pruned trigram set — pruned trigrams score through
    * backoff exactly as unseen ones do. */
  def trigramBackoffLm(s: SparkSession, dir: String,
                       pruneSingletons: Boolean): DataFrame =
    // The per-document trigram-count frame is the LM family's one
    // corpus-sized build (tokenize + explode + count) and a pure
    // function of the corpus — session-shared like minhashSigs, and
    // DURABLE through FrameStore: every model table and the held-out
    // scoring side are cheap derivations of this frame.
    trigramBackoffLmFrom(
      sharedFrame("lmtridb", s, dir)(docTrigramCounts(tp(s, dir, "documents"))),
      pruneSingletons)

  /** Fixture-frame form (LmPruneSpec): build the trigram counts
    * inline, no session sharing. */
  def trigramBackoffLm(docs: DataFrame, pruneSingletons: Boolean): DataFrame =
    trigramBackoffLmFrom(docTrigramCounts(docs).pin(), pruneSingletons)

  /** `(doc_id, t1, t2, t3, k)` — per-document trigram counts. */
  private def docTrigramCounts(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 2),
          slice(toks, lit(2), size(toks) - 2),
          slice(toks, lit(3), size(toks) - 2))).as("p"))
      .select(col("doc_id"),
        col("p").getField("0").as("t1"),
        col("p").getField("1").as("t2"),
        col("p").getField("2").as("t3"))
      .groupBy("doc_id", "t1", "t2", "t3").agg(count(lit(1)).as("k"))
  }

  private def trigramBackoffLmFrom(db: DataFrame,
                                   pruneSingletons: Boolean): DataFrame = {
    // The model is PINNED (gram-TYPE-sized — every model table below
    // re-aggregates it, which unpinned meant ~6 re-aggregations of the
    // corpus-sized trigram frame per run), and the rollups a gram
    // consumes only on ITS OWN hit branch (n_ab on tri-hit, n_b on
    // bigram-hit) pre-join into that gram's model table — model-sized
    // shuffles that cut the held-out frame's scoring joins from 5 to
    // 3. Both rollups derive from the (possibly pruned) model, so a
    // hit row always carries its head count: values are identical to
    // the 5-join form.
    val tri0 = db.filter(col("doc_id") % 2 === 0)
      .groupBy("t1", "t2", "t3").agg(sum("k").as("n_abc"))
    val tri = (if (pruneSingletons) tri0.filter(col("n_abc") >= 2L) else tri0)
      .pin()
    // head counts ride on the model rows via windows (the q138
    // discipline extended to both orders): n_ab over (t1,t2) on tri and
    // n_b over t2 on big replace two separate rollup aggregations and
    // their joins — the pinned tri now feeds 3 derivations instead of
    // 5, and the model-side plan drops 2 exchanges + 2 joins. Values
    // are identical (same integer sums, same row multiplicity).
    val triJ = tri.withColumn("n_ab",
      sum("n_abc").over(Window.partitionBy("t1", "t2")))
    val bigJ = tri.groupBy("t2", "t3").agg(sum("n_abc").as("n_bc"))
      .withColumn("n_b", sum("n_bc").over(Window.partitionBy("t2")))
    val uni = tri.groupBy("t3").agg(sum("n_abc").as("n_c"))
    val tot = tri.agg(sum("n_abc").as("n_tot"))
    val sc = db.filter(col("doc_id") % 2 === 1)
      .join(triJ, Seq("t1", "t2", "t3"), "left")
      .join(bigJ, Seq("t2", "t3"), "left")
      .join(uni, Seq("t3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("s",
        when(col("n_abc").isNotNull, expr("(1000000 * n_ab) div n_abc"))
          .when(col("n_bc").isNotNull, expr("(5000000 * n_b) div (2 * n_bc)"))
          .when(col("n_c").isNotNull, expr("(25000000 * n_tot) div (4 * n_c)"))
          .otherwise(lit(1000000000000L)))
    sc.groupBy("doc_id")
      .agg(sum("k").as("n_trigrams"),
        sum(when(col("n_abc").isNotNull, col("k")).otherwise(0L))
          .as("n_tri_hit"),
        sum(when(col("n_abc").isNull && col("n_bc").isNotNull, col("k"))
          .otherwise(0L)).as("n_backoff_bi"),
        sum(when(col("n_abc").isNull && col("n_bc").isNull &&
          col("n_c").isNotNull, col("k")).otherwise(0L)).as("n_backoff_uni"),
        sum(when(col("n_abc").isNull && col("n_bc").isNull &&
          col("n_c").isNull, col("k")).otherwise(0L)).as("n_oov"),
        sum(col("k") * col("s")).as("s_fp"))
      .select(col("doc_id"), col("n_trigrams"), col("n_tri_hit"),
        col("n_backoff_bi"), col("n_backoff_uni"), col("n_oov"),
        expr("s_fp div n_trigrams").as("avg_surprisal_fp"))
  }

  /** The three-way LSH S-curve frame shared by q176/q195: the SAME
    * 32-hash signatures banded (4×8, 8×4, 16×2), each config scored by
    * candidate volume and exact-Jaccard precision (verified on
    * candidates only — never all-pairs). `sample` restricts both
    * inputs to the deterministic 25% slice (doc_id % 4 — SQL-
    * expressible, so the sampled form stays exactly oracled). Both
    * inputs are FILTERS of the session-shared signature/shingle
    * frames — zero new corpus passes. */
  /** Session-shared sign-LSH near-dup pair frame over the embeddings
    * table at the oracle-pinned threshold 0.4 — one bucket+verify
    * build per (session, dir, bits) serves every consumer (q40's pair
    * count, q47's cluster resolution below its gate, the q175-family
    * multi-method audit); above the q47 gate the autoSignBits width
    * gets its own keyed build. The ×1000 rehearsal measured q47
    * warm ≈ cold (68.5 s) because each call re-ran the bucket join +
    * cosine verify over the full corpus — the resolution itself is
    * q44-cheap once the pairs are a shared frame. */
  def embNearDupPairs(s: SparkSession, dir: String, bits: Int): DataFrame =
    sharedFrame(s"embpairs$bits", s, dir) {
      DedupOps.embeddingNearDupPairs(tp(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), threshold = 0.4,
        dim = embDim, signBits = bits)
    }

  /** Session-shared resolved near-dup clusters over
    * [[embNearDupPairs]]: resolveClusters' per-round localCheckpoints
    * defeat CacheManager plan-keyed reuse across calls (the
    * bfs4/kCore8 precedent), so the LABEL FRAME is the shared artifact
    * — it is exactly what a dedup pipeline persists next to the
    * corpus. ×1000 measured the per-call resolution at 52 s over the
    * auto-width pair set; shared, q47 answers group-count-sized. */
  def embNearDupClusters(s: SparkSession, dir: String, bits: Int): DataFrame =
    sharedFrame(s"embclusters$bits", s, dir) {
      DedupOps.resolveClusters(
        embNearDupPairs(s, dir, bits).select("id_a", "id_b"))
    }

  def bandSensitivityFrame(s: SparkSession, dir: String,
                           sample: Boolean): DataFrame =
    // session-shared (3-row scoreboard; q176 above its gate and q195
    // read the SAME sampled build, and repeats of either skip the
    // banded candidate joins + exact-Jaccard verification entirely)
    sharedFrame(s"bandsens-$sample", s, dir) {
      bandSensitivityBuild(s, dir, sample)
    }

  private def bandSensitivityBuild(s: SparkSession, dir: String,
                                   sample: Boolean): DataFrame = {
    val keep = pmod(col("doc_id"), lit(4)) === 0
    val sigs = if (sample) minhashSigs(s, dir).filter(keep)
               else minhashSigs(s, dir)
    val sd = if (sample) shingleSets(s, dir).filter(keep)
             else shingleSets(s, dir)
    val perConfig = Seq(4, 8, 16).map { b =>
      DedupOps.candidatePairsFromSignatures(sigs, numHashes = 32, bands = b)
        .join(sd.select(col("doc_id").as("id_a"), col("sd").as("sd_a")), "id_a")
        .join(sd.select(col("doc_id").as("id_b"), col("sd").as("sd_b")), "id_b")
        .select((DedupOps.jaccardFromShingleSets(col("sd_a"), col("sd_b"))
          >= 0.5).cast(LongType).as("is_true"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum("is_true"), lit(0L)).as("n_true"))
        .select(lit(b.toLong).as("bands"), lit((32 / b).toLong).as("rows_per_band"),
          col("n_candidates"), col("n_true"))
    }
    perConfig.reduce(_ unionByName _)
      .select(col("bands"), col("rows_per_band"), col("n_candidates"),
        col("n_true"),
        when(col("n_candidates") > 0,
          expr("(10000 * n_true) div n_candidates")).otherwise(0L)
          .as("precision_fp"))
  }

  /** `(gkey, doc_id, n_tokens, pos)` — the 8-gram ExactSubstr
    * duplicated-occurrence frame over `documents` (one row per
    * occurrence of a corpus-duplicated 8-gram). The ExactSubstr family
    * analogue of [[minhashSigs]]: the gram pass + gram-count shuffle +
    * semi-join feedback (the family's dominant cost — the ×1000
    * rehearsal measured the 8-gram build disk-bound when every query
    * re-derived it) runs ONCE per (session, dir); q139's profile,
    * q143's strip and q145's keep-one election are all cheap
    * derivations of this one persisted frame. */
  def exactSubstrDupOcc8(s: SparkSession, dir: String): DataFrame =
    sharedFrame("esdup8", s, dir) {
      ExactSubstrOps.dupOccurrences(tp(s, dir, "documents"),
        col("doc_id"), col("text"), l = 8, minOccurrences = 2L)
    }

  /** The island-merged maximal spans of [[exactSubstrDupOcc8]]
    * (contiguous merge, the 8-gram oracles' pinned form) — span-count-
    * sized; the per-document window over the duplicated positions (the
    * ×1000 spill site) also runs once per session. */
  def exactSubstrSpans8(s: SparkSession, dir: String): DataFrame =
    sharedFrame("esspans8", s, dir) {
      ExactSubstrOps.mergedSpans(exactSubstrDupOcc8(s, dir),
        l = 8, mergeGap = 0)
    }

  /** The l=20 + mergeGap=4 family frame — the production DEFAULT
    * ExactSubstr operating point ([[graft.ext.ExactSubstrOps.DefaultL]]).
    * q194 previously re-derived the full longer-gram build on every
    * run (the ×1000 rehearsal measured its warm time equal to its
    * cold 151 s for exactly that reason); like the 8-gram frames, the
    * gram build + island merge now run once per (session, dir). */
  def exactSubstrSpans20(s: SparkSession, dir: String): DataFrame =
    sharedFrame("esspans20", s, dir) {
      ExactSubstrOps.mergedSpans(
        ExactSubstrOps.dupOccurrences(tp(s, dir, "documents"),
          col("doc_id"), col("text"), l = 20, minOccurrences = 2L),
        l = 20, mergeGap = 4)
    }

  /** The 8-gram incremental-maintenance state
    * ([[graft.ext.ExactSubstrOps.SubstrState]]) over `documents` —
    * ALL-grams occurrence frame + gram-count table, both session-shared
    * (and FrameStore-durable) family artifacts: the CDC query q197
    * starts every step from this persisted index, exactly as a
    * deployment would. `cnt` derives from the shared `occ` through the
    * one shared rule ([[graft.ext.ExactSubstrOps.countsFromOcc]]). */
  def exactSubstrState8(s: SparkSession, dir: String)
      : ExactSubstrOps.SubstrState = {
    val occ = sharedFrame("esocc8", s, dir) {
      ExactSubstrOps.initState(tp(s, dir, "documents"),
        col("doc_id"), col("text"), l = 8).occ
    }
    ExactSubstrOps.SubstrState(occ,
      sharedFrame("escnt8", s, dir)(ExactSubstrOps.countsFromOcc(occ)))
  }

  /** `(doc_id, sd)` — each document's DISTINCT 3-gram shingle set. */
  def shingleSets(s: SparkSession, dir: String): DataFrame =
    sharedFrame("sd3", s, dir) {
      tp(s, dir, "documents").select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
    }

  /** `(doc_id, sig)` — the production 32-hash MinHash signature frame
    * (3-token shingles, portable hash family). Shared by every banding
    * consumer: [[minhashPairs]] derives the default 8-band candidates
    * from it, and q176/q181 band it their own ways — the corpus
    * signature pass (the family's dominant cost at scale) runs once. */
  def minhashSigs(s: SparkSession, dir: String): DataFrame =
    sharedFrame("mhsigs", s, dir) {
      DedupOps.minhashSignatures(tp(s, dir, "documents"),
        col("doc_id"), col("text"), shingleSize = 3, numHashes = 32)
    }

  /** The production q35-path MinHash LSH candidate pairs
    * `(id_a, id_b, est_jaccard)` at the default (3-shingle, 32-hash,
    * 8-band) parameters — candidate-sized, never all-pairs; the band
    * join reads the shared [[minhashSigs]] frame. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    sharedFrame("mhpairs", s, dir) {
      DedupOps.candidatePairsFromSignatures(minhashSigs(s, dir),
        numHashes = 32, bands = 8)
    }
}
