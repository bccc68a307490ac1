package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}

import graft.analytics._
import graft.etl.ChangeCapture
import graft.ext._
import graft.QueryCaches.Pinned

/** Driver-facing query registry: one entry per SURVEY §2 operator (plus
  * the training-pipeline extensions), each with a DuckDB oracle where the
  * semantics are SQL-expressible.
  *
  * Conventions shared by the Spark plan and the oracle SQL so the
  * driver's column-sorted value-hash comparison is stable:
  *  - identical output column names on both sides;
  *  - DOUBLE outputs rounded (4-6 decimals) to absorb summation-order
  *    float noise, via the engine-portable floor(x*10^n + 0.5)/10^n in
  *    BOTH plans (engine round() primitives disagree on manufactured
  *    fp ties — observed 1/100k rows at sf0.1);
  *  - timestamps exported as BIGINT epoch seconds of a date_trunc
  *    (engine timestamp precision — ns vs µs — never leaks);
  *  - every ranking gets a deterministic tiebreak;
  *  - DuckDB integer SUMs cast back to BIGINT (DuckDB widens to HUGEINT).
  */
object Queries {

  case class Q(name: String,
               run: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Bipartite customer↔supplier purchase graph (shared by the graph
    * analytics queries q89/q90): node ids disambiguated by parity
    * (customer c → 2c, supplier p → 2p+1), both edge directions from one
    * explode pass over the distinct pair set — same pattern as
    * [[graft.ext.DedupOps.resolveClusters]]'s edge build. */
  private def purchaseGraph(s: SparkSession, dir: String): DataFrame = {
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

  /** Oracle-side CTEs mirroring [[purchaseGraph]] (UNION ALL is exact:
    * the two directions are parity-disjoint). */
  private val purchaseGraphCtes: String =
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
  private def pageRankOracleSql(iters: Int): String = {
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
    s"""WITH $purchaseGraphCtes,
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT id AS node_id, pr AS rank_fp FROM r$iters ORDER BY node_id""".stripMargin
  }

  /** Unrolled synchronous label-propagation oracle mirroring
    * [[graft.analytics.GraphOps.labelPropagation]]: self-looped edge
    * list, per-round (node,label) counts, argmax with (count DESC,
    * label ASC) — the row_number form is exactly the engine's
    * max(struct(c, -lbl)). */
  private def lpaOracleSql(iters: Int): String = {
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
  private def pcaFit(s: SparkSession, dir: String): (DataFrame, Array[Long], Long) = {
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
    val parts = qv.select(col("q")).as[Array[Long]].mapPartitions { it =>
      val g = Array.ofDim[Long](d * d)
      val sv = Array.ofDim[Long](d)
      var n = 0L
      it.foreach { q =>
        var i = 0
        while (i < d) {
          val qi = q(i); sv(i) += qi
          var j = 0
          while (j < d) { g(i * d + j) += qi * q(j); j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator((g.toSeq, sv.toSeq, n))
    }.collect()
    require(parts.nonEmpty, "pcaFit: empty embedding corpus")
    val gTot = Array.ofDim[Long](d * d)
    val sTot = Array.ofDim[Long](d)
    var n = 0L
    parts.foreach { case (gp, sp, np) =>
      var k = 0
      while (k < d * d) { gTot(k) += gp(k); k += 1 }
      var i = 0
      while (i < d) { sTot(i) += sp(i); i += 1 }
      n += np
    }
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
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
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
  private def pcaOracleCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""m$i AS (
         |  SELECT cm.i, CAST(sum(cm.c * v.v) AS BIGINT) AS m
         |  FROM cm JOIN v${i - 1} v ON v.i = cm.j GROUP BY 1),
         |x$i AS (SELECT max(abs(m)) AS mx FROM m$i),
         |v$i AS (
         |  SELECT i, m // greatest(mx // 1000000, 1) AS v
         |  FROM m$i CROSS JOIN x$i)"""
    }.mkString(",\n")
    s"""gm AS (
       |  SELECT greatest(max(list_max(list_transform(embedding,
       |    x -> abs(x::DOUBLE)))), 1e-30) / 127.0 AS gsc
       |  FROM embeddings),
       |qv AS (
       |  SELECT vec_id, label, list_transform(embedding, x ->
       |    CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / gsc + 0.5)))
       |      AS BIGINT)) AS q
       |  FROM embeddings CROSS JOIN gm),
       |el AS (
       |  SELECT vec_id, unnest(generate_series(0, len(q) - 1)) AS i, q
       |  FROM qv),
       |e2 AS (SELECT vec_id, i, q[i + 1] AS qi FROM el),
       |sv AS (SELECT i, CAST(sum(qi) AS BIGINT) AS s FROM e2 GROUP BY 1),
       |gr AS (
       |  SELECT a.i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS g
       |  FROM e2 a JOIN e2 b USING (vec_id) GROUP BY 1, 2),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |cm AS (
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

  private def pcaOracleSql(iters: Int): String =
    s"""WITH ${pcaOracleCtes(iters)}
       |SELECT v.i AS dim, CAST(v.v * sg.sg AS BIGINT) AS v_fp,
       |  CAST(lambda_est AS BIGINT) AS lambda_est
       |FROM v$iters v CROSS JOIN sg CROSS JOIN le
       |ORDER BY dim""".stripMargin

  /** SCD2 state intervals from the event log (shared by q96/q101):
    * consecutive repeats collapsed, half-open [valid_from, valid_to)
    * windows, NULL open end. Two windows + a filter on one key. */
  private def eventStateIntervals(s: SparkSession, dir: String): DataFrame = {
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
  private val scd2OracleCtes: String =
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
  private def ordersSnapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
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
  private val snapshotOracleCtes: String =
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

  /** Table load + repartition to cluster parallelism: the right plan
    * when a narrow scan of few files feeds CPU-bound per-row work
    * (regex/tokenize/hash) — a single parquet row group is one split, so
    * without this the whole text pipeline runs on one core. The shuffled
    * bytes are just the input rows, negligible next to the compute. */
  private def tp(s: SparkSession, dir: String, name: String): DataFrame =
    t(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  /** Engine-portable rounding: floor(x*10^n + 0.5)/10^n computed with
    * the SAME fp ops the oracle SQL uses, so both engines produce
    * bit-identical rounded values. Engine round() primitives disagree on
    * manufactured ties (observed 1/100k rows at sf0.1: DuckDB's
    * multiply-then-std::round vs Spark's BigDecimal HALF_UP). */
  private def rnd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }
  private def r4(c: Column): Column = rnd(c, 4)
  private def r6(c: Column): Column = rnd(c, 6)

  /** Shared by the model-evaluation queries (q123/q124): the q120
    * linear scorer's exact-long logit per document plus the binary
    * lang='en' label. */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame = {
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
  private def qualityLrFrame(s: SparkSession, dir: String): DataFrame = {
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
  private val qualityLrOracleCtes: String = {
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
  private val scoredDocsCte: String =
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
  private val embDim = 64

  /** Oracle CTE chain RE-DERIVING the IVF fit in SQL (shared by q41 and
    * q70): portable-hash sample init, two Lloyd rounds with exact
    * fixed-point mean sums (order-independent in both engines),
    * 6-decimal normalized centroids, final assignment `asgF`, query set
    * `q`, probe set `probe` (nlist=16, nprobe=4). Callers append their
    * scoring tail. Possible because every ivfFit arithmetic step is
    * engine-portable. */
  private lazy val ivfOracleCtes: String = {
    val P = graft.ext.PortableHash.P
    // one spherical-k-means round: assignment against cent${r-1},
    // fixed-point mean, normalize+round; empty clusters keep their
    // previous centroid (the LEFT JOIN + COALESCE)
    def round(r: Int): String =
      s"""asg$r AS (
         |  SELECT cid, v, kid FROM (
         |    SELECT c.cid, c.v, k.kid,
         |      row_number() OVER (PARTITION BY c.cid
         |        ORDER BY list_dot_product(c.v, k.c) DESC, k.kid DESC) AS rn
         |    FROM corpus c CROSS JOIN cent${r - 1} k) t WHERE rn = 1),
         |sums$r AS (
         |  SELECT kid, pos, CAST(sum(CAST(floor(v[pos] * 10000000.0) AS BIGINT)) AS DOUBLE) AS sf, count(*) AS n
         |  FROM asg$r CROSS JOIN generate_series(1, $embDim) AS g(pos)
         |  GROUP BY kid, pos),
         |newc$r AS (
         |  SELECT kid, list(sf / n / 10000000.0 ORDER BY pos) AS m FROM sums$r GROUP BY kid),
         |norm$r AS (
         |  SELECT kid, m, sqrt(list_sum(list_transform(m, x -> x * x))) AS nn FROM newc$r),
         |cent$r AS (
         |  SELECT k.kid, COALESCE(list_transform(n.m,
         |      x -> CASE WHEN n.nn > 0 THEN floor(x / n.nn * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END), k.c) AS c
         |  FROM cent${r - 1} k LEFT JOIN norm$r n USING (kid)),""".stripMargin
    s"""WITH corpus AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |samp AS (
       |  SELECT v FROM corpus
       |  ORDER BY ('0x' || substr(md5(cid::VARCHAR), 1, 15))::BIGINT % $P, cid
       |  LIMIT 16),
       |sampn AS (
       |  SELECT list_transform(v,
       |      x -> CASE WHEN nn > 0 THEN floor(x / nn * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END) AS c
       |  FROM (SELECT v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn FROM samp) t),
       |cent0 AS (SELECT row_number() OVER (ORDER BY c) - 1 AS kid, c FROM sampn),
       |${round(1)}
       |${round(2)}
       |asgF AS (
       |  SELECT cid, v, kid FROM (
       |    SELECT c.cid, c.v, k.kid,
       |      row_number() OVER (PARTITION BY c.cid
       |        ORDER BY list_dot_product(c.v, k.c) DESC, k.kid DESC) AS rn
       |    FROM corpus c CROSS JOIN cent2 k) t WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 16),
       |probe AS (
       |  SELECT qid, kid FROM (
       |    SELECT q.qid, k.kid,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_dot_product(q.qv, k.c) DESC, k.kid ASC) AS rn
       |    FROM q CROSS JOIN cent2 k) t WHERE rn <= 4)""".stripMargin
  }

  /** q163's IPF fit on collected model-sized cells, shared with the
    * apply query q169: (source, lang, n_docs, obs_fp, raked_fp,
    * weight_fp) — see q163's scaladoc for the arithmetic contract. */
  private def ipfRakedCells(s: SparkSession, dir: String)
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
  private def unimaxAlloc(s: SparkSession, dir: String): DataFrame = {
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
  private val unimaxOracleCtes: String =
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
  private val ipfOracleCtes: String = {
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
  private def pqDistTo(cv: Array[Long]): Column = expr(
    s"""aggregate(zip_with(subq, array(${cv.map(_ + "L").mkString(",")}),
      (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)""")

  /** Argmin over one subspace's codebook, ties to the smaller kid. */
  private def pqArgminFor(cent: Array[Array[Array[Long]]], sb: Int): Column =
    array_min(array(cent(sb).zipWithIndex.map { case (cv, j) =>
      struct(pqDistTo(cv).as("d"), lit(j).as("k"))
    }: _*)).getField("k")

  /** Per-row PQ code: CASE over the subspace id, each branch a literal
    * codebook argmin. */
  private def pqKidExpr(cent: Array[Array[Array[Long]]]): Column =
    when(col("s") === 0, pqArgminFor(cent, 0))
      .when(col("s") === 1, pqArgminFor(cent, 1))
      .when(col("s") === 2, pqArgminFor(cent, 2))
      .otherwise(pqArgminFor(cent, 3))

  /** Per-row assigned-code squared distance (the PQ residual): the min
    * over the subspace's codebook — same structs as [[pqArgminFor]],
    * `d` field instead of `k`. */
  private def pqMinDistExpr(cent: Array[Array[Array[Long]]]): Column = {
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
    * (vec_id, s, subq), and the trained 4×16×16 codebook. */
  private def pqFitted(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Array[Long]]]) = {
    val emb = tp(s, dir, "embeddings")
    val gm = emb.agg(
      (greatest(max(graft.functions.VecExpressions.vecAbsMax(
        col("embedding"))), lit(1e-30)) / 127.0).as("gsc"))
    val qv = emb.crossJoin(broadcast(gm))
      .select(col("vec_id"),
        expr("""transform(embedding, x ->
          CAST(greatest(-127.0D, least(127.0D,
            floor(CAST(x AS DOUBLE) / gsc + 0.5D))) AS BIGINT))""").as("q"))
      .pin()
    val sub = qv.select(col("vec_id"), explode(expr(
        """transform(sequence(0, 3), s ->
          named_struct('s', CAST(s AS INT), 'subq', slice(q, s * 16 + 1, 16)))"""))
        .as("t"))
      .select(col("vec_id"), col("t").getField("s").as("s"),
        col("t").getField("subq").as("subq"))
      .pin()
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
    (qv, sub, cent)
  }

  /** Oracle CTE prefix re-deriving the full [[pqFitted]] codebook fit
    * (shared by q168/q171): ends with `dF(vec_id, s, kid, dist)` — all
    * 16 per-subspace code distances per vector under the final
    * codebook — and `aF(vec_id, s, kid)` — the assigned codes. */
  private val pqOracleCtes: String = {
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

  val all: Seq[Q] = Seq(

    // ── TPC-H-shaped core ─────────────────────────────────────────────

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

    // ── Stats probes (A1/A2/A12) ──────────────────────────────────────

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

    Q("q12_time_range_probe",
      (s, dir) => StatsOps.timeRangeProbe(t(s, dir, "events"), col("ts")),
      Some("""SELECT
             |  CAST(EXTRACT(EPOCH FROM date_trunc('second', min(ts))) AS BIGINT) AS min_epoch,
             |  CAST(EXTRACT(EPOCH FROM date_trunc('second', max(ts))) AS BIGINT) AS max_epoch,
             |  count(*) AS cnt
             |FROM events""".stripMargin)),

    // ── Time-bucket aggregation (A3/A4/A5/A6) ────────────────────────

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

    // ── Histograms (A7/A8) ────────────────────────────────────────────

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

    // ── Category counts / ranking / top-N (A9/W1/O3/O4) ───────────────

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

    // ── Filters and derived columns (P2/P6/P7/F*) ─────────────────────

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

    // ── Window lag/diff rates (W2/W3 + A10 rollup) ────────────────────

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

    // ── Scalar-function suite (F6-F14) + clamp chain (§7.4.7) ─────────

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

    // ── Projection suite (P1/P4/P5/O5) ───────────────────────────────

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

    // ── Interactive: distinct menu + crossfilter composition (V3/V5) ──

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

    // ── Archive grouping (B10: monthly + quarterly rollups) ──────────

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

    // ── Demo-data generator (S9; deterministic hash-based "random") ───

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

    // ── Text analysis (training-pipeline ext) ─────────────────────────

    Q("q30_text_stats",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("docs"),
          sum(TextOps.tokenCount(col("text")).cast(LongType)).as("total_tokens"),
          r4(avg(col("n_chars").cast(DoubleType))).as("avg_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS docs,
             |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
             |  floor((avg(CAST(n_chars AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("q31_quality_scores",
      (s, dir) => tp(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, text,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents)
             |SELECT doc_id,
             |  floor((least(n_tokens / 64.0, 1.0) * 0.4
             |    + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |    + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS quality,
             |  CAST(n_tokens AS INT) AS n_tokens
             |FROM toks ORDER BY doc_id""".stripMargin)),

    Q("q32_lang_id",
      (s, dir) => tp(s, dir, "documents")
        .groupBy(TextOps.langId(col("text")).as("pred_lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("pred_lang"),
      // tiebreak parity: Spark takes array_max(struct(hits, code)) —
      // larger code wins ties — mirrored here by hits*10 + code rank.
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS h_en,
             |    len(regexp_extract_all(text, '\b(el|la|de|que|y|en|un|es)\b')) AS h_es,
             |    len(regexp_extract_all(text, '\b(der|die|das|und|ist|von|ein|zu)\b')) AS h_de,
             |    len(regexp_extract_all(text, '\b(le|la|de|et|un|est|que|en)\b')) AS h_fr
             |  FROM documents),
             |u AS (
             |  SELECT doc_id, unnest(['de','en','es','fr']) AS code,
             |         unnest([h_de, h_en, h_es, h_fr]) AS hits,
             |         unnest([0, 1, 2, 3]) AS rank
             |  FROM h),
             |best AS (
             |  SELECT doc_id, arg_max(code, hits * 10 + rank) AS code, max(hits) AS mh
             |  FROM u GROUP BY doc_id)
             |SELECT CASE WHEN mh > 0 THEN code ELSE 'und' END AS pred_lang,
             |       count(*) AS cnt
             |FROM best GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q33_fingerprints",
      (s, dir) => tp(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text"), 5).as("fp"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 5
             |      THEN list_transform(generate_series(0, len(toks) - 5),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh
             |  FROM t)
             |SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ── Deduplication (training-pipeline ext) ─────────────────────────

    Q("q34_exact_dup_classes",
      (s, dir) => DedupOps.exactDupClasses(t(s, dir, "documents"), col("doc_id"), col("text"))
        .groupBy(col("copies"))
        .agg(count(lit(1)).as("n_classes"))
        .orderBy("copies"),
      Some("""SELECT copies, count(*) AS n_classes FROM (
             |  SELECT md5(text) AS digest, count(*) AS copies
             |  FROM documents GROUP BY 1)
             |GROUP BY copies ORDER BY copies""".stripMargin)),

    Q("q35_minhash_neardup",
      (s, dir) => DedupOps.minhashCandidatePairs(
          tp(s, dir, "documents"), col("doc_id"), col("text"))
        .filter(col("est_jaccard") >= 0.5)
        .agg(count(lit(1)).as("candidate_pairs")),
      // Fully oracled since the portable (md5-derived universal) hash
      // family landed: DuckDB reproduces the exact signatures, band
      // buckets and the est-jaccard filter.
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.sig AS sig_a, c.sig AS sig_b
             |  FROM bk a JOIN bk c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id)
             |SELECT CAST(count(*) AS BIGINT) AS candidate_pairs FROM p
             |WHERE len(list_filter(generate_series(1, 32), i -> sig_a[i] = sig_b[i])) / 32.0 >= 0.5""".stripMargin)),

    Q("q36_simhash_classes",
      (s, dir) => DedupOps.simhashSignatures(
          tp(s, dir, "documents"), col("doc_id"), col("text"))
        .groupBy(col("simhash")).agg(count(lit(1)).as("copies"))
        .groupBy(col("copies")).agg(count(lit(1)).as("n_classes"))
        .orderBy("copies"),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
             |h AS (SELECT doc_id, ${PortableHash.int32Sql("t", 0)} AS h1,
             |             ${PortableHash.int32Sql("t", 1)} AS h2 FROM tok),
             |v AS (SELECT doc_id,
             |      ${PortableHash.simhashSumsSql("h1", "h2")}
             |      FROM h GROUP BY doc_id),
             |sh AS (SELECT doc_id, ${PortableHash.simhashPackSql} AS simhash FROM v),
             |c AS (SELECT simhash, CAST(count(*) AS BIGINT) AS copies FROM sh GROUP BY simhash)
             |SELECT copies, CAST(count(*) AS BIGINT) AS n_classes
             |FROM c GROUP BY copies ORDER BY copies""".stripMargin)),

    Q("q50_simhash_neardup",
      (s, dir) => DedupOps.simhashNearDupPairs(
          tp(s, dir, "documents"), col("doc_id"), col("text"),
          maxHamming = 3, bands = 4)
        .agg(count(lit(1)).as("neardup_pairs")),
      // The >> & mask band extraction is shift-semantics-proof: DuckDB's
      // arithmetic shift sign-extends where Spark's shiftrightunsigned
      // zero-fills, but the & 65535 mask keeps only bits both agree on.
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
             |h AS (SELECT doc_id, ${PortableHash.int32Sql("t", 0)} AS h1,
             |             ${PortableHash.int32Sql("t", 1)} AS h2 FROM tok),
             |v AS (SELECT doc_id,
             |      ${PortableHash.simhashSumsSql("h1", "h2")}
             |      FROM h GROUP BY doc_id),
             |sh AS (SELECT doc_id, ${PortableHash.simhashPackSql} AS simhash FROM v),
             |k AS (
             |  SELECT doc_id, simhash, band, ((simhash >> (band * 16)) & 65535) AS block
             |  FROM sh, (SELECT unnest(generate_series(0, 3)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             |         a.simhash AS sh_a, c.simhash AS sh_b
             |  FROM k a JOIN k c ON a.band = c.band AND a.block = c.block AND a.doc_id < c.doc_id)
             |SELECT CAST(count(*) AS BIGINT) AS neardup_pairs FROM p
             |WHERE bit_count(xor(sh_a, sh_b)) <= 3""".stripMargin)),

    Q("q37_ngram_jaccard",
      (s, dir) => {
        // Exact 3-gram Jaccard over LSH candidate pairs (verify stage).
        // Single-pass shape: the signature frame is persisted and texts
        // ride through the band explode — no re-derivation, no join-back
        // (the r01 double-derivation shape cost 13.7 s = 30% of the
        // whole bench; this one computes MinHash once).
        val docs = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        DedupOps.minhashVerifiedPairs(docs, col("doc_id"), col("text"),
            shingleSize = 3, numHashes = 32, bands = 8, estThreshold = 0.5)
          .filter(r4(col("jaccard")) >= 0.8)
          .agg(count(lit(1)).as("dup_pairs"))
      },
      // Oracled end to end (candidates AND verify) via the portable
      // hash family — was rows-only while signatures were xxhash64.
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |d AS (SELECT doc_id, list_distinct(sh) AS sd,
             |        list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, sd, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM d),
             |bk AS (
             |  SELECT doc_id, sig, sd, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             |         a.sig AS sig_a, c.sig AS sig_b, a.sd AS sd_a, c.sd AS sd_b
             |  FROM bk a JOIN bk c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |e AS (
             |  SELECT id_a, id_b,
             |    len(list_filter(generate_series(1, 32), i -> sig_a[i] = sig_b[i])) / 32.0 AS est,
             |    floor((CAST(len(list_intersect(sd_a, sd_b)) AS DOUBLE)
             |      / (len(sd_a) + len(sd_b) - len(list_intersect(sd_a, sd_b)))) * 10000.0 + 0.5) / 10000.0 AS j
             |  FROM p)
             |SELECT CAST(count(*) AS BIGINT) AS dup_pairs FROM e
             |WHERE est >= 0.5 AND j >= 0.8""".stripMargin)),

    Q("q44_neardup_resolution",
      (s, dir) => {
        // Pairs → connected components → cluster sizes. Candidates come
        // from fingerprint collisions (min-md5 5-gram — a deterministic,
        // SQL-expressible candidate generator), so components == finger-
        // print classes and the result is oracle-checkable; the LSH
        // candidate path reuses the same resolveClusters (spec-covered).
        // persisted: ONE fingerprint pass feeds both join branches (and
        // the join-key null filter reads the cached column instead of
        // re-deriving the min-md5-5-gram pipeline per row)
        val fps = tp(s, dir, "documents")
          .select(col("doc_id"), TextOps.fingerprint(col("text"), 5).as("fp"))
          .pin()
        val a = fps.select(col("fp"), col("doc_id").as("id_a"))
        val b = fps.select(col("fp"), col("doc_id").as("id_b"))
        val pairs = a.join(b, Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
        DedupOps.resolveClusters(pairs)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("csize"))
          .orderBy("cluster_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 5
             |      THEN list_transform(generate_series(0, len(toks) - 5),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh
             |  FROM t),
             |f AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM s)
             |SELECT min(doc_id) AS cluster_id, CAST(count(*) AS BIGINT) AS csize
             |FROM f GROUP BY fp HAVING count(*) >= 2
             |ORDER BY cluster_id""".stripMargin)),

    Q("q46_jaccard_verify",
      (s, dir) => {
        // The q37 VERIFY stage on a fixed, SQL-expressible candidate
        // list (fingerprint-collision pairs): exact 3-gram Jaccard per
        // pair, fully oracled — candidate GENERATION via xxhash64 LSH
        // stays engine-specific (q35/q37 rows-only).
        // distinct 3-gram shingle sets are materialized per DOCUMENT
        // (persisted, one pass) — the per-pair jaccard then works on
        // cached arrays instead of re-deriving the shingle pipeline
        // per reference (Catalyst inlines ~8 copies otherwise)
        val fps = tp(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.fingerprint(col("text"), 5).as("fp"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
          .pin()
        val a = fps.select(col("fp"), col("doc_id").as("id_a"), col("sd").as("sd_a"))
        val b = fps.select(col("fp"), col("doc_id").as("id_b"), col("sd").as("sd_b"))
        a.join(b, Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            r4(DedupOps.jaccardFromShingleSets(col("sd_a"), col("sd_b"))).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 3
             |      THEN list_transform(generate_series(0, len(toks) - 3),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh3,
             |    CASE WHEN len(toks) >= 5
             |      THEN list_transform(generate_series(0, len(toks) - 5),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh5
             |  FROM t),
             |f AS (
             |  SELECT doc_id, list_distinct(sh3) AS sd,
             |    list_min(list_transform(sh5, x -> md5(x))) AS fp
             |  FROM s)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  floor((CAST(len(list_intersect(a.sd, b.sd)) AS DOUBLE)
             |    / (len(a.sd) + len(b.sd) - len(list_intersect(a.sd, b.sd)))) * 10000.0 + 0.5) / 10000.0 AS jaccard
             |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── Similarity search (training-pipeline ext) ─────────────────────

    Q("q38_knn_bruteforce",
      (s, dir) => {
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .select(col("qid"), col("cid"), r4(col("cosine")).as("cosine"), col("rank"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 16),
             |scored AS (
             |  SELECT q.qid, c.vec_id AS cid,
             |    list_cosine_similarity(CAST(q.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
             |  FROM embeddings c, q WHERE c.vec_id <> q.qid),
             |ranked AS (
             |  SELECT qid, cid, cos_raw,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
             |  FROM scored)
             |SELECT qid, cid, floor((cos_raw) * 10000.0 + 0.5) / 10000.0 AS cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q39_knn_lsh",
      (s, dir) => {
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.lshTopK(queries, corpus, 10, dim = embDim, bits = 6)
          .select(col("qid"), col("cid"), r4(col("cosine")).as("cosine"), col("rank"))
      },
      Some(s"""WITH b AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
             |  FROM embeddings),
             |q AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM b WHERE vec_id < 16),
             |scored AS (
             |  SELECT q.qid, c.vec_id AS cid,
             |    list_cosine_similarity(CAST(q.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
             |  FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.qid),
             |ranked AS (
             |  SELECT qid, cid, cos_raw,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
             |  FROM scored)
             |SELECT qid, cid, floor((cos_raw) * 10000.0 + 0.5) / 10000.0 AS cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q49_knn_lsh_multi",
      (s, dir) => {
        // Multi-table LSH: two independent hyperplane families (seeds
        // 7, 8) unioned for recall — the standard way sign-LSH recall
        // scales without inflating any single table's bucket size.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.lshTopK(queries, corpus, 10, dim = embDim, bits = 6, tables = 2)
          .select(col("qid"), col("cid"), r4(col("cosine")).as("cosine"), col("rank"))
      },
      Some(s"""WITH b1 AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 7)} AS bucket
             |  FROM embeddings),
             |b2 AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 8)} AS bucket
             |  FROM embeddings),
             |q1 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM b1 WHERE vec_id < 16),
             |q2 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM b2 WHERE vec_id < 16),
             |cand AS (
             |  SELECT q1.qid, c.vec_id AS cid, q1.qvec, c.embedding AS cvec
             |  FROM b1 c JOIN q1 USING (bucket) WHERE c.vec_id <> q1.qid
             |  UNION
             |  SELECT q2.qid, c.vec_id AS cid, q2.qvec, c.embedding AS cvec
             |  FROM b2 c JOIN q2 USING (bucket) WHERE c.vec_id <> q2.qid),
             |ranked AS (
             |  SELECT qid, cid,
             |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) AS cos_raw,
             |    row_number() OVER (PARTITION BY qid ORDER BY
             |      list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
             |  FROM cand)
             |SELECT qid, cid, floor((cos_raw) * 10000.0 + 0.5) / 10000.0 AS cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q41_knn_ivf",
      (s, dir) => {
        // IVF with the index fitted ONCE per (dir, params) and persisted
        // (ivfFitCached) — assignment is a broadcast-literal argmax
        // projection (zero shuffle, zero row amplification); searches
        // probe nprobe/nlist of the corpus.
        // queries side skips the repartition (16 rows need no fan-out —
        // the exchange was pure per-run overhead); the corpus-side scan
        // parallelism only matters on the one cache-miss fit
        val queries = t(s, dir, "embeddings").filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.ivfTopK(queries, corpus, 10, nlist = 16, nprobe = 4,
            cacheKey = Some(s"embeddings:$dir"))
          .select(col("qid"), col("cid"), r4(col("cosine")).as("cosine"), col("rank"))
      },
      // The oracle RE-DERIVES the whole IVF fit in SQL: portable-hash
      // sample init, two Lloyd rounds with exact fixed-point mean sums
      // (order-independent in both engines), 6-decimal normalized
      // centroids, probe selection and inverted-file search. Possible
      // because every ivfFit arithmetic step is engine-portable.
      // (CTE chain shared with q70 — see ivfOracleCtes.)
      Some(s"""$ivfOracleCtes,
           |scored AS (
           |  SELECT q.qid, a.cid, list_cosine_similarity(q.qv, a.v) AS cos_raw
           |  FROM probe p JOIN q ON q.qid = p.qid JOIN asgF a ON a.kid = p.kid
           |  WHERE a.cid <> q.qid),
           |ranked AS (
           |  SELECT qid, cid, cos_raw,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
           |  FROM scored)
           |SELECT qid, cid, floor(cos_raw * 10000.0 + 0.5) / 10000.0 AS cosine, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q70_knn_ivf_quantized",
      (s, dir) => {
        // IVF × int8: probe selection fp32, inverted-file payload and
        // scoring quantized — the index bounds who is compared, the
        // codes bound the bytes per comparison. Shares the cached fit
        // with q41 (same cacheKey), as a deployment shares one index.
        val queries = t(s, dir, "embeddings").filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.ivfQuantizedTopK(queries, corpus, 10, nlist = 16, nprobe = 4,
            cacheKey = Some(s"embeddings:$dir"))
          .select(col("qid"), col("cid"), r4(col("qcos")).as("qcos"), col("rank"))
      },
      // q41's fit re-derivation + q62's code re-derivation and
      // integer-cosine scoring over the probed inverted lists
      Some(s"""$ivfOracleCtes,
           |codes AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> greatest(-127.0, least(127.0, floor(x::DOUBLE /
           |      (greatest(list_max(list_transform(embedding, y -> abs(y::DOUBLE))), 1e-30) / 127.0) + 0.5)))) AS code
           |  FROM embeddings),
           |cn AS (SELECT vec_id, code,
           |         sqrt(list_sum(list_transform(code, x -> x * x))) AS nrm FROM codes),
           |scored AS (
           |  SELECT q.qid, a.cid,
           |    CASE WHEN qc.nrm * cc.nrm > 0 THEN
           |      list_sum(list_transform(range(len(qc.code)), i -> qc.code[i+1] * cc.code[i+1])) / (qc.nrm * cc.nrm)
           |    ELSE 0.0 END AS qcos
           |  FROM probe p JOIN q ON q.qid = p.qid JOIN asgF a ON a.kid = p.kid
           |  JOIN cn qc ON qc.vec_id = q.qid JOIN cn cc ON cc.vec_id = a.cid
           |  WHERE a.cid <> q.qid),
           |ranked AS (
           |  SELECT qid, cid, qcos,
           |    row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS rank
           |  FROM scored)
           |SELECT qid, cid, floor(qcos * 10000.0 + 0.5) / 10000.0 AS qcos, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q40_embedding_neardup",
      (s, dir) => DedupOps.embeddingNearDupPairs(
          tp(s, dir, "embeddings"), col("vec_id"), col("embedding"),
          threshold = 0.4, dim = embDim, signBits = 6)
        .agg(count(lit(1)).as("neardup_pairs")),
      Some(s"""WITH b AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
             |  FROM embeddings)
             |SELECT count(*) AS neardup_pairs
             |FROM b a JOIN b c USING (bucket)
             |WHERE a.vec_id < c.vec_id
             |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |        CAST(c.embedding AS DOUBLE[])) >= 0.4""".stripMargin)),

    Q("q48_corpus_clean",
      (s, dir) => {
        // The composed training-data prep pipeline, oracled end to end:
        // language gate → quality gate → exact dedup (keep min id) →
        // fingerprint near-dup resolution. Output is the one-row
        // attrition funnel a pipeline owner monitors.
        val docs = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        CorpusPipeline.cleanSummary(docs, col("doc_id"), col("text"),
          lang = "en", minQuality = 0.5)
      },
      Some("""WITH h AS (
             |  SELECT doc_id, text,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS h_en,
             |    len(regexp_extract_all(text, '\b(el|la|de|que|y|en|un|es)\b')) AS h_es,
             |    len(regexp_extract_all(text, '\b(der|die|das|und|ist|von|ein|zu)\b')) AS h_de,
             |    len(regexp_extract_all(text, '\b(le|la|de|et|un|est|que|en)\b')) AS h_fr
             |  FROM documents),
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
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents),
             |qual AS (
             |  SELECT doc_id,
             |    floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS quality
             |  FROM toks),
             |g AS (
             |  SELECT d.doc_id, d.text FROM documents d
             |  JOIN lang ON lang.doc_id = d.doc_id
             |  JOIN qual ON qual.doc_id = d.doc_id
             |  WHERE lang.pred = 'en' AND qual.quality >= 0.5),
             |e AS (SELECT DISTINCT text FROM g),
             |sh AS (
             |  SELECT CASE WHEN len(tk) >= 5
             |    THEN list_transform(generate_series(0, len(tk) - 5),
             |           i -> array_to_string(list_slice(tk, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(tk, ' ')] END AS sh
             |  FROM (SELECT string_split_regex(trim(text), '\s+') AS tk FROM e)),
             |f AS (SELECT list_min(list_transform(sh, x -> md5(x))) AS fp FROM sh)
             |SELECT (SELECT count(*) FROM documents) AS n_input,
             |       (SELECT count(*) FROM g) AS n_gated,
             |       (SELECT count(*) FROM e) AS n_exact,
             |       (SELECT count(DISTINCT fp) FROM f) AS n_final""".stripMargin)),

    Q("q47_embedding_cluster_resolution",
      (s, dir) => {
        // General-graph component resolution, ORACLED: hyperplane-LSH
        // cosine pairs form non-clique graphs (a~b, b~c above the
        // threshold, a~c below it), so the DuckDB oracle needs a
        // RECURSIVE transitive closure — this is the query that proves
        // resolveClusters does real transitive merging, not GROUP BY.
        val emb = tp(s, dir, "embeddings")
        val pairs = DedupOps.embeddingNearDupPairs(
            emb, col("vec_id"), col("embedding"),
            threshold = 0.4, dim = embDim, signBits = 6)
          .select("id_a", "id_b")
        DedupOps.resolveClusters(pairs)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("csize"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE b AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
             |  FROM embeddings),
             |pairs AS (
             |  SELECT a.vec_id AS id_a, c.vec_id AS id_b
             |  FROM b a JOIN b c USING (bucket)
             |  WHERE a.vec_id < c.vec_id
             |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |          CAST(c.embedding AS DOUBLE[])) >= 0.4),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
             |lab AS (
             |  SELECT src AS id, least(src, min(dst)) AS label
             |  FROM reach GROUP BY src)
             |SELECT label AS cluster_id, CAST(count(*) AS BIGINT) AS csize
             |FROM lab GROUP BY label ORDER BY cluster_id""".stripMargin)),

    // ── Training-pipeline staples: deterministic split + repetition ──

    Q("q51_split_assignment",
      (s, dir) => DedupOps.assignSplit(tp(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split"),
      Some(s"""SELECT ${DedupOps.assignSplitSql("doc_id::VARCHAR",
                 Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q52_repetition_ratio",
      (s, dir) => tp(s, dir, "documents")
        .select(col("doc_id"),
          r4(TextOps.repetitionRatio(col("text"), 3)).as("rep_ratio"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t)
             |SELECT doc_id,
             |  floor((1.0 - (CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh))) * 10000.0 + 0.5) / 10000.0 AS rep_ratio
             |FROM s ORDER BY doc_id""".stripMargin)),

    Q("q53_decontamination",
      (s, dir) => {
        // benchmark = every 50th document (standing in for an eval set
        // drawn from the corpus distribution); flag any corpus doc
        // sharing a 5-gram with it
        val d = tp(s, dir, "documents")
        val bench = d.filter(pmod(col("doc_id"), lit(50)) === 0)
          .select(col("text").as("btext"))
        TrainingSetOps.contaminationFlags(d, col("doc_id"), col("text"),
            bench, col("btext"), k = 5)
          .groupBy("contaminated").agg(count(lit(1)).as("n_docs"))
          .orderBy("contaminated")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |sh AS (
             |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
             |    THEN list_transform(generate_series(0, len(toks) - 5),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS s FROM t),
             |bs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
             |hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bs USING (s))
             |SELECT (d.doc_id IN (SELECT doc_id FROM hits)) AS contaminated,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM documents d GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q54_sequence_packing",
      (s, dir) => TrainingSetOps.packSequences(tp(s, dir, "documents"),
          col("doc_id"), col("text"), budget = 512, shards = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, shard, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
             |  FROM t)
             |SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_first,
             |  CAST(floor((cum - 1) / 512) AS BIGINT) AS seq_last
             |FROM c ORDER BY doc_id""".stripMargin)),

    Q("q55_pii_redaction",
      (s, dir) => {
        // the synthetic corpus carries no PII, so the query plants one
        // deterministic item per document (class cycles with doc_id) and
        // the audit proves every class is found and scrubbed
        val planted = tp(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(4)) === 0,
              concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
              .when(pmod(col("doc_id"), lit(4)) === 1, lit(" call 555-123-4567 today"))
              .when(pmod(col("doc_id"), lit(4)) === 2,
                concat(lit(" from host 10.0."), pmod(col("doc_id"), lit(200)), lit(".7 port")))
              .otherwise(lit(" ssn 987-65-4321 on file"))).as("t2"))
        planted
          .select(TextOps.piiCounts(col("t2")).as("c"),
            length(TextOps.redactPii(col("t2"))).as("red_len"))
          .agg(sum("c.n_email").as("n_email"), sum("c.n_ssn").as("n_ssn"),
            sum("c.n_ip").as("n_ip"), sum("c.n_phone").as("n_phone"),
            sum("red_len").as("chars_after"),
            sum(when(col("c.n_email") + col("c.n_ssn") + col("c.n_ip")
              + col("c.n_phone") === 0, 1L).otherwise(0L)).as("clean_docs"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id, text ||
             |    (CASE WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id || '@example.com now'
             |          WHEN doc_id % 4 = 1 THEN ' call 555-123-4567 today'
             |          WHEN doc_id % 4 = 2 THEN ' from host 10.0.' || (doc_id % 200) || '.7 port'
             |          ELSE ' ssn 987-65-4321 on file' END) AS t2
             |  FROM documents),
             |s1 AS (SELECT doc_id,
             |    len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             |    regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS r1
             |  FROM p),
             |s2 AS (SELECT doc_id, n_email,
             |    len(regexp_extract_all(r1, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
             |    regexp_replace(r1, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS r2
             |  FROM s1),
             |s3 AS (SELECT doc_id, n_email, n_ssn,
             |    len(regexp_extract_all(r2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
             |    regexp_replace(r2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS r3
             |  FROM s2),
             |s4 AS (SELECT doc_id, n_email, n_ssn, n_ip,
             |    len(regexp_extract_all(r3, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
             |    regexp_replace(r3, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS red
             |  FROM s3)
             |SELECT CAST(sum(n_email) AS BIGINT) AS n_email,
             |  CAST(sum(n_ssn) AS BIGINT) AS n_ssn,
             |  CAST(sum(n_ip) AS BIGINT) AS n_ip,
             |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
             |  CAST(sum(length(red)) AS BIGINT) AS chars_after,
             |  CAST(sum(CASE WHEN n_email + n_ssn + n_ip + n_phone = 0 THEN 1 ELSE 0 END) AS BIGINT) AS clean_docs
             |FROM s4""".stripMargin)),

    Q("q56_boilerplate_removal",
      (s, dir) => {
        // plant C4-style boilerplate: a shared banner on even docs and a
        // shared footer on all docs, next to a per-document unique line;
        // the filter must drop exactly the shared lines everywhere
        val d2 = tp(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n", col("text"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("SUBSCRIBE TO OUR NEWSLETTER"))
              .otherwise(concat(lit("rights reserved "), col("doc_id"))),
            lit("COPYRIGHT 2024 FOOTER")).as("text"))
        TrainingSetOps.removeBoilerplate(d2, col("doc_id"), col("text"), minDocs = 3)
          .withColumn("n_lines", size(split(col("text"), "\n")).cast(LongType))
          .orderBy("doc_id")
      },
      Some("""WITH d2 AS (
             |  SELECT doc_id, text || chr(10) ||
             |    (CASE WHEN doc_id % 2 = 0 THEN 'SUBSCRIBE TO OUR NEWSLETTER'
             |          ELSE 'rights reserved ' || doc_id END)
             |    || chr(10) || 'COPYRIGHT 2024 FOOTER' AS text
             |  FROM documents),
             |t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d2),
             |e AS (SELECT doc_id, unnest(ls) AS line FROM t),
             |b AS (SELECT trim(line) AS nline FROM e GROUP BY 1
             |      HAVING count(DISTINCT doc_id) >= 3),
             |bl AS (SELECT coalesce(list(nline), []) AS blist FROM b),
             |r AS (SELECT doc_id,
             |        list_filter(ls, x -> NOT list_contains(blist, trim(x))) AS keep
             |      FROM t, bl)
             |SELECT doc_id, array_to_string(keep, chr(10)) AS text,
             |  CAST(len(keep) AS BIGINT) AS n_lines
             |FROM r WHERE len(keep) > 0 ORDER BY doc_id""".stripMargin)),

    Q("q57_token_budget_curation",
      (s, dir) => {
        val base = tp(s, dir, "documents").select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.tokenCount(col("text")).as("nt"))
        TrainingSetOps.curateByBudget(base, col("doc_id"), col("q"), col("nt"),
            budget = 12000L)
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
            rnd(min(col("q")), 6).as("min_quality"))
      },
      // the oracle computes the NAIVE single global window cumsum; the
      // gate proves the engine's two-phase bucketed plan is equivalent
      Some("""WITH toks AS (
             |  SELECT doc_id, text,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, n_tokens,
             |    floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS q
             |  FROM toks),
             |c AS (SELECT doc_id, q, n_tokens,
             |        sum(n_tokens) OVER (ORDER BY q DESC, doc_id) AS cum FROM q)
             |SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  floor(min(q) * 1000000.0 + 0.5) / 1000000.0 AS min_quality
             |FROM c WHERE cum <= 12000""".stripMargin)),

    Q("q58_domain_mixture",
      (s, dir) => TrainingSetOps.resampleMixture(tp(s, dir, "documents"),
          col("source"), col("doc_id"),
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |w(source, wt) AS (VALUES ('src0', 0.5::DOUBLE), ('src1', 0.25::DOUBLE), ('src2', 0.25::DOUBLE)),
             |j AS (SELECT c.source, c.n, w.wt FROM c JOIN w USING (source)),
             |t AS (SELECT min(n / wt) AS tt FROM j),
             |a AS (SELECT j.source, least(1.0, j.wt * t.tt / j.n) AS p FROM j, t),
             |k AS (SELECT d.doc_id, d.source FROM documents d JOIN a USING (source)
             |      WHERE ((('0x' || substr(md5(d.doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 2147483647) % 1000000) / 1e6 < a.p)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q59_token_zipf",
      (s, dir) => {
        val counts = tp(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        counts.orderBy(col("n").desc, col("token")).limit(20)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("n").desc, col("token")))
              .cast(LongType))
      },
      Some("""WITH e AS (
             |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
             |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1)
             |SELECT token, n,
             |  CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
             |FROM c ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    Q("q60_paragraph_dedup",
      (s, dir) => {
        // plant paragraph structure: a corpus-wide disclaimer, a
        // paragraph shared by every 7th doc, and a unique signature —
        // only the FIRST global occurrence of each repeat may survive
        val d2 = tp(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n", col("text"),
            lit("COMMON DISCLAIMER APPLIES TO ALL DOCUMENTS"),
            concat(lit("note "), pmod(col("doc_id"), lit(7))),
            concat(lit("sig "), col("doc_id"))).as("text"))
        TrainingSetOps.dedupParagraphs(d2, col("doc_id"), col("text"))
          .withColumn("n_pars", size(split(col("text"), "\n")).cast(LongType))
          .orderBy("doc_id")
      },
      Some("""WITH d2 AS (
             |  SELECT doc_id, text || chr(10) || 'COMMON DISCLAIMER APPLIES TO ALL DOCUMENTS'
             |    || chr(10) || ('note ' || (doc_id % 7)) || chr(10) || ('sig ' || doc_id) AS text
             |  FROM documents),
             |t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d2),
             |e AS (SELECT doc_id, unnest(ls) AS par, unnest(range(len(ls))) AS pos FROM t),
             |f AS (SELECT doc_id, par, pos FROM e WHERE trim(par) <> ''),
             |k AS (SELECT doc_id, pos, par,
             |        row_number() OVER (PARTITION BY trim(par) ORDER BY doc_id, pos) AS rn
             |      FROM f)
             |SELECT doc_id, array_to_string(list(par ORDER BY pos), chr(10)) AS text,
             |  CAST(count(*) AS BIGINT) AS n_pars
             |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q61_int8_quantization",
      (s, dir) => {
        // scale materialized via persist so downstream lambdas read the
        // cached column instead of Catalyst inlining the abs-max scan
        // into every element (HOFs get no subexpression elimination)
        val base = tp(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("sc",
            greatest(graft.functions.VecExpressions.vecAbsMax(col("v")),
              lit(1e-30)) / 127.0)
          .pin()
        base.select(col("vec_id"), col("sc"), col("v"),
            graft.functions.VecExpressions.int8Quantize(col("v")).as("q"))
          .select(col("vec_id"),
            rnd(col("sc"), 6).as("scale"),
            aggregate(col("q"), lit(0L),
              (acc, x) => acc + x.cast(LongType) * x.cast(LongType)).as("sum_q2"),
            rnd(array_max(transform(col("v"), x =>
              abs(greatest(lit(-127.0), least(lit(127.0),
                floor(x.cast(DoubleType) / col("sc") + 0.5))) * col("sc")
                - x.cast(DoubleType)))), 6).as("max_err"))
          .orderBy("vec_id")
      },
      // the oracle re-derives the quantization codes from the floats;
      // the gate proves the codegen'd one-pass expression produces the
      // exact same codes (sum of squares) and error bound
      Some("""WITH b AS (
             |  SELECT vec_id, embedding AS v,
             |    greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) / 127.0 AS sc
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, sc,
             |    list_transform(v, x -> greatest(-127.0, least(127.0, floor(x::DOUBLE / sc + 0.5)))) AS qs,
             |    list_max(list_transform(v, x ->
             |      abs(greatest(-127.0, least(127.0, floor(x::DOUBLE / sc + 0.5))) * sc - x::DOUBLE))) AS me
             |  FROM b)
             |SELECT vec_id, floor(sc * 1000000.0 + 0.5) / 1000000.0 AS scale,
             |  CAST(list_sum(list_transform(qs, x -> x * x)) AS BIGINT) AS sum_q2,
             |  floor(me * 1000000.0 + 0.5) / 1000000.0 AS max_err
             |FROM q ORDER BY vec_id""".stripMargin)),

    Q("q62_knn_quantized",
      (s, dir) => {
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.quantizedTopK(queries, corpus, 10)
          .select(col("qid"), col("cid"), r4(col("qcos")).as("qcos"), col("rank"))
      },
      // the oracle re-derives the int8 codes from the floats and ranks
      // by the cosine of the CODE vectors (scales cancel); integer dots
      // are exact, so the ranking hash-matches bit-for-bit
      Some("""WITH b AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> greatest(-127.0, least(127.0, floor(x::DOUBLE /
             |      (greatest(list_max(list_transform(embedding, y -> abs(y::DOUBLE))), 1e-30) / 127.0) + 0.5)))) AS code
             |  FROM embeddings),
             |n AS (SELECT vec_id, code,
             |        sqrt(list_sum(list_transform(code, x -> x * x))) AS nrm FROM b),
             |q AS (SELECT vec_id AS qid, code AS qc, nrm AS qn FROM n WHERE vec_id < 16),
             |s AS (SELECT q.qid, c.vec_id AS cid,
             |    CASE WHEN q.qn * c.nrm > 0 THEN
             |      list_sum(list_transform(range(len(q.qc)), i -> q.qc[i+1] * c.code[i+1])) / (q.qn * c.nrm)
             |    ELSE 0.0 END AS qcos
             |  FROM n c, q WHERE c.vec_id <> q.qid),
             |r AS (SELECT qid, cid, qcos,
             |        row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS rank FROM s)
             |SELECT qid, cid, floor(qcos * 10000.0 + 0.5) / 10000.0 AS qcos, CAST(rank AS INT) AS rank
             |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q69_knn_lsh_quantized",
      (s, dir) => {
        // Quantization composed INSIDE the bucketed candidate stage:
        // hyperplane buckets from the fp32 vectors (index-build time),
        // int8 codes as the only payload crossing the bucket join —
        // the 100 TB shape where the candidate structure bounds who is
        // compared and the codes bound the bytes per comparison.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.lshQuantizedTopK(queries, corpus, 10, dim = embDim, bits = 6)
          .select(col("qid"), col("cid"), r4(col("qcos")).as("qcos"), col("rank"))
      },
      // oracle = q39's bucket join over the same hyperplane literals ×
      // q62's code re-derivation and integer-cosine ranking
      Some(s"""WITH b AS (
             |  SELECT vec_id,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket,
             |    list_transform(embedding, x -> greatest(-127.0, least(127.0, floor(x::DOUBLE /
             |      (greatest(list_max(list_transform(embedding, y -> abs(y::DOUBLE))), 1e-30) / 127.0) + 0.5)))) AS code
             |  FROM embeddings),
             |n AS (SELECT vec_id, bucket, code,
             |        sqrt(list_sum(list_transform(code, x -> x * x))) AS nrm FROM b),
             |q AS (SELECT vec_id AS qid, bucket, code AS qc, nrm AS qn FROM n WHERE vec_id < 16),
             |s AS (SELECT q.qid, c.vec_id AS cid,
             |    CASE WHEN q.qn * c.nrm > 0 THEN
             |      list_sum(list_transform(range(len(q.qc)), i -> q.qc[i+1] * c.code[i+1])) / (q.qn * c.nrm)
             |    ELSE 0.0 END AS qcos
             |  FROM n c JOIN q USING (bucket) WHERE c.vec_id <> q.qid),
             |r AS (SELECT qid, cid, qcos,
             |        row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS rank FROM s)
             |SELECT qid, cid, floor(qcos * 10000.0 + 0.5) / 10000.0 AS qcos, CAST(rank AS INT) AS rank
             |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q63_label_prototypes",
      (s, dir) => EmbeddingOps.meanPoolByLabel(tp(s, dir, "embeddings"),
          col("label"), col("embedding"))
        .select(col("label"), col("i"), rnd(col("mu"), 6).as("mu"), col("n"))
        .orderBy("label", "i"),
      // float means summed as doubles are partition-order-dependent; the
      // operator sums fixed-point longs instead (exact, order-free) and
      // the oracle re-derives the identical arithmetic
      Some("""WITH e AS (
             |  SELECT label, unnest(embedding) AS v, unnest(range(len(embedding))) AS i
             |  FROM embeddings),
             |g AS (
             |  SELECT label, i, sum(CAST(floor(v::DOUBLE * 1048576 + 0.5) AS BIGINT)) AS sfp,
             |    count(*) AS n
             |  FROM e GROUP BY 1, 2)
             |SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
             |  floor((sfp / n / 1048576) * 1000000.0 + 0.5) / 1000000.0 AS mu,
             |  CAST(n AS BIGINT) AS n
             |FROM g ORDER BY label, i""".stripMargin)),

    Q("q64_prototype_confusion",
      (s, dir) => EmbeddingOps.prototypeConfusion(tp(s, dir, "embeddings"),
        col("label"), col("embedding"), embDim),
      Some("""WITH e AS (
             |  SELECT label, unnest(embedding) AS v, unnest(range(len(embedding))) AS i
             |  FROM embeddings),
             |g AS (
             |  SELECT label, i, sum(CAST(floor(v::DOUBLE * 1048576 + 0.5) AS BIGINT)) AS sfp,
             |    count(*) AS n
             |  FROM e GROUP BY 1, 2),
             |p AS (
             |  SELECT label AS plabel, list(sfp / n / 1048576 ORDER BY i) AS pvec
             |  FROM g GROUP BY 1),
             |d AS (
             |  SELECT emb.vec_id, emb.label, p.plabel,
             |    list_sum(list_transform(range(len(emb.embedding)),
             |      i -> emb.embedding[i+1]::DOUBLE * p.pvec[i+1])) AS dot
             |  FROM embeddings emb, p),
             |r AS (
             |  SELECT vec_id, label, plabel,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, plabel DESC) AS rn
             |  FROM d)
             |SELECT CAST(label AS BIGINT) AS label, CAST(plabel AS BIGINT) AS assigned,
             |  CAST(count(*) AS BIGINT) AS n_vecs
             |FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q65_domain_histogram",
      (s, dir) => {
        // plant two deterministic URLs per doc — one rotating content
        // domain, one rotating subdomain of a blocklisted domain
        val d2 = tp(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" see https://site"), pmod(col("doc_id"), lit(5)),
            lit(".example.com/p"), col("doc_id"),
            lit(" and http://cdn"), pmod(col("doc_id"), lit(3)),
            lit(".bad.org/x")).as("text"))
        d2.select(col("doc_id"),
            explode(TextOps.urlDomains(col("text"))).as("domain"))
          .groupBy("domain")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .withColumn("blocked",
            col("domain") === "bad.org" || col("domain").endsWith(".bad.org"))
          .orderBy("domain")
      },
      Some("""WITH d2 AS (
             |  SELECT doc_id, text || ' see https://site' || (doc_id % 5) || '.example.com/p' || doc_id
             |    || ' and http://cdn' || (doc_id % 3) || '.bad.org/x' AS text
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
             |  FROM d2)
             |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  (domain = 'bad.org' OR domain LIKE '%.bad.org') AS blocked
             |FROM e GROUP BY domain ORDER BY domain""".stripMargin)),

    Q("q66_incremental_dedup",
      (s, dir) => {
        // snapshot refresh: every 3rd doc is the incoming batch; planted
        // digests collide with the reference (dropped) or repeat within
        // the batch (first id wins)
        val d = tp(s, dir, "documents")
        val incoming = d.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(9)) === 0,
              concat(lit("SHARED SNAPSHOT DOC "), pmod(col("doc_id"), lit(4))))
              .when(pmod(col("doc_id"), lit(9)) === 3,
                concat(lit("BATCH LOCAL DUP "), pmod(col("doc_id"), lit(2))))
              .otherwise(concat(col("text"), lit(" v2"))).as("text"))
        val reference = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select(when(pmod(col("doc_id"), lit(5)) === 1,
            concat(lit("SHARED SNAPSHOT DOC "), pmod(col("doc_id"), lit(4))))
            .otherwise(col("text")).as("rtext"))
        val kept = TrainingSetOps.incrementalDedup(incoming, reference,
          col("doc_id"), col("text"), col("rtext"))
        val nInc = incoming.agg(count(lit(1)).as("n_incoming"))
        kept.agg(count(lit(1)).as("n_kept"),
            sum(when(col("text").startsWith("BATCH LOCAL DUP"), 1L)
              .otherwise(0L)).as("n_batch_dup_kept"))
          .crossJoin(broadcast(nInc))
          .select("n_incoming", "n_kept", "n_batch_dup_kept")
      },
      Some("""WITH inc AS (
             |  SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN 'SHARED SNAPSHOT DOC ' || (doc_id % 4)
             |                      WHEN doc_id % 9 = 3 THEN 'BATCH LOCAL DUP ' || (doc_id % 2)
             |                      ELSE text || ' v2' END AS text
             |  FROM documents WHERE doc_id % 3 = 0),
             |ref AS (
             |  SELECT CASE WHEN doc_id % 5 = 1 THEN 'SHARED SNAPSHOT DOC ' || (doc_id % 4)
             |              ELSE text END AS rtext
             |  FROM documents WHERE doc_id % 3 <> 0),
             |kept AS (
             |  SELECT doc_id, text FROM (
             |    SELECT doc_id, text,
             |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |    FROM inc WHERE md5(text) NOT IN (SELECT md5(rtext) FROM ref)) s
             |  WHERE rn = 1)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM inc) AS n_incoming,
             |  CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN text LIKE 'BATCH LOCAL DUP%' THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dup_kept
             |FROM kept""".stripMargin)),

    Q("q67_stratified_sample",
      (s, dir) => TrainingSetOps.sampleExactPerGroup(tp(s, dir, "documents"),
          col("source"), col("doc_id"), k = 10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id"),
      Some("""WITH r AS (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY (('0x' || substr(md5(doc_id::VARCHAR || ':sample'), 1, 15))::BIGINT % 2147483647) ASC,
             |               doc_id ASC) AS rn
             |  FROM documents)
             |SELECT source, doc_id FROM r WHERE rn <= 10
             |ORDER BY source, doc_id""".stripMargin)),

    Q("q68_training_set_assembly",
      (s, dir) => {
        // the capstone composition: normalize → decontaminate → exact
        // dedup → token-budget curation → split → sequence packing,
        // reported as a one-row attrition funnel (the q48 pattern:
        // stages persisted once, counts attach via broadcast cross
        // joins — never a driver collect of data rows)
        val d = tp(s, dir, "documents")
        val norm = d.select(col("doc_id"),
          TextOps.normalize(col("text")).as("text")).pin()
        // bench set derives from the RAW frame, not the norm cache: the
        // broadcast subquery that builds its shingles runs before
        // anything else, and reading through `norm` would serialize the
        // full-corpus normalize + cache population onto the broadcast's
        // critical path (measured 25 s of q68's sf10 cold run) — here
        // it normalizes only the 2% benchmark slice
        val bench = d.filter(pmod(col("doc_id"), lit(50)) === 0)
          .select(TextOps.normalize(col("text")).as("btext"))
        val clean = norm.join(
          TrainingSetOps.contaminationFlags(norm, col("doc_id"), col("text"),
              bench, col("btext"), k = 5)
            .filter(!col("contaminated")).select("doc_id"),
          Seq("doc_id")).pin()
        val deduped = CorpusPipeline.exactDedupKeepMin(clean,
          col("doc_id"), col("text")).pin()
        val scored = deduped.select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.tokenCount(col("text")).as("nt"))
        val curated = TrainingSetOps.curateByBudget(scored, col("doc_id"),
          col("q"), col("nt"), budget = 8000L)
        val split = DedupOps.assignSplit(curated, col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).pin()
        val packed = TrainingSetOps.packSequencesByCount(
          split.filter(col("split") === "train"),
          col("doc_id"), col("n_tokens"), budget = 256, shards = 4)
        val nSeq = packed.groupBy("shard").agg(max("seq_last").as("ml"))
          .agg(coalesce(sum(col("ml") + 1), lit(0L)).as("n_train_seqs"))
        Seq(
          d.agg(count(lit(1)).as("n_raw")),
          clean.agg(count(lit(1)).as("n_decontaminated")),
          deduped.agg(count(lit(1)).as("n_deduped")),
          split.agg(count(lit(1)).as("n_curated"),
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
            sum(when(col("split") === "train", col("n_tokens"))
              .otherwise(lit(0L))).as("train_tokens")),
          nSeq
        ).reduce((a, b) => a.crossJoin(broadcast(b)))
          .select("n_raw", "n_decontaminated", "n_deduped", "n_curated",
            "n_train", "n_val", "n_test", "train_tokens", "n_train_seqs")
      },
      Some(s"""WITH norm AS (
             |  SELECT doc_id, lower(trim(regexp_replace(regexp_replace(text,
             |    '[\\x00-\\x08\\x0e-\\x1f\\x7f' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']', '', 'g'),
             |    '\\s+', ' ', 'g'))) AS text
             |  FROM documents),
             |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM norm),
             |sh AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
             |    THEN list_transform(generate_series(0, len(toks) - 5),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(toks, ' ')] END) AS s FROM t),
             |bs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
             |hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bs USING (s)),
             |clean AS (SELECT * FROM norm WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
             |dd AS (SELECT doc_id, text FROM (
             |    SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |    FROM clean) z
             |  WHERE rn = 1),
             |toks2 AS (
             |  SELECT doc_id, text,
             |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|that)\\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM dd),
             |qual AS (
             |  SELECT doc_id, n_tokens,
             |    floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS q
             |  FROM toks2),
             |cur AS (SELECT doc_id, q, n_tokens,
             |          sum(n_tokens) OVER (ORDER BY q DESC, doc_id) AS cum FROM qual),
             |sp AS (SELECT doc_id, n_tokens,
             |         ${DedupOps.assignSplitSql("doc_id::VARCHAR",
                          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))} AS split
             |       FROM cur WHERE cum <= 8000),
             |tr AS (SELECT doc_id, doc_id % 4 AS shard, n_tokens FROM sp WHERE split = 'train'),
             |pk AS (SELECT shard, n_tokens,
             |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum FROM tr),
             |sq AS (SELECT coalesce(CAST(sum(ms + 1) AS BIGINT), 0) AS n_train_seqs FROM
             |   (SELECT shard, max(CAST(floor((cum - 1) / 256) AS BIGINT)) AS ms FROM pk GROUP BY 1) z)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_raw,
             |  (SELECT CAST(count(*) AS BIGINT) FROM clean) AS n_decontaminated,
             |  (SELECT CAST(count(*) AS BIGINT) FROM dd) AS n_deduped,
             |  (SELECT CAST(count(*) AS BIGINT) FROM sp) AS n_curated,
             |  (SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_train,
             |  (SELECT CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_val,
             |  (SELECT CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) FROM sp) AS n_test,
             |  (SELECT CAST(sum(CASE WHEN split = 'train' THEN n_tokens ELSE 0 END) AS BIGINT) FROM sp) AS train_tokens,
             |  (SELECT n_train_seqs FROM sq) AS n_train_seqs""".stripMargin)),

    // ── Session-TZ knob (SURVEY §1.3: per-query timezone, not session
    //    state; daily buckets in America/New_York shift with DST) ──────

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
    //    overlap (EventOps; the classic telemetry/clickstream trio) ─────

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

    Q("q75_collocations",
      (s, dir) => {
        // Top bigram collocations by lift (log-free PMI — the ranking
        // key is exact IEEE multiply/divide, see TextOps.collocations).
        TextOps.collocations(tp(s, dir, "documents"), col("text"), minCount = 5L)
          .orderBy(col("lift_raw").desc, col("t1"), col("t2")).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("lift_raw").desc, col("t1"), col("t2")))
            .cast(LongType))
          .select(col("t1"), col("t2"), col("n_ab"), col("n_a"), col("n_b"),
            r4(col("lift_raw")).as("lift"), col("rank"))
      },
      Some("""WITH tok AS (
             |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
             |uni AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM uni),
             |d AS (SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
             |bp AS (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM d),
             |big AS (
             |  SELECT p[1] AS t1, p[2] AS t2, CAST(count(*) AS BIGINT) AS n_ab
             |  FROM bp GROUP BY 1, 2 HAVING count(*) >= 5),
             |sc AS (
             |  SELECT t1, t2, n_ab, a.n AS n_a, b.n AS n_b,
             |    (CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |      (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS lift_raw
             |  FROM big JOIN uni a ON a.token = t1 JOIN uni b ON b.token = t2, tot)
             |SELECT t1, t2, n_ab, n_a, n_b,
             |  floor(lift_raw * 10000.0 + 0.5) / 10000.0 AS lift,
             |  CAST(row_number() OVER (ORDER BY lift_raw DESC, t1, t2) AS BIGINT) AS rank
             |FROM sc ORDER BY lift_raw DESC, t1, t2 LIMIT 20""".stripMargin)),

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

    Q("q76_bpe_merges",
      (s, dir) => BpeOps.bpeMerges(tp(s, dir, "documents"), col("text"),
        rounds = 4, cacheKey = Some(s"documents:$dir")),
      // the oracle unrolls the SAME four merge rounds as CTE stages;
      // literal replace is greedy left-to-right in both engines, so the
      // learned merge tables must agree exactly
      Some(BpeOps.oracleSql(4))),

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

    Q("q82_bpe_encode",
      (s, dir) => BpeOps.bpeEncodedSymbols(tp(s, dir, "documents"),
        col("text"), rounds = 4, topK = 15,
        cacheKey = Some(s"documents:$dir")),
      // learn + APPLY: the corpus re-segmented with the four learned
      // merges; the resulting sub-word inventory's top-15 hash-matches
      Some(BpeOps.encodeOracleSql(4, 15))),

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

    Q("q88_fuzzy_match",
      (s, dir) => {
        // Dirty-catalog entity resolution: part names with one
        // deterministically dropped character matched back to the
        // clean catalog within edit distance 2. Spark side is the
        // q-gram-blocked join (candidates bounded by shared-gram
        // occupancy, pruned by the distinct-gram count bound BEFORE
        // any levenshtein); the oracle verifies every pair naively —
        // the hash-match proves the blocking complete.
        val names = t(s, dir, "part").select(col("p_name")).distinct()
        val clean = names.select(col("p_name").as("id"), col("p_name").as("s"))
        val dirty = names.select(
          col("p_name").as("id"),
          concat(substring(col("p_name"), 1, 1),
            expr("substring(p_name, 3)")).as("s"))
        FuzzyJoinOps.editDistanceJoin(dirty, clean, maxDist = 2, q = 3)
          .select(col("l_id").as("dirty_name"), col("r_id").as("clean_name"),
            col("dist"))
          .orderBy("dirty_name", "clean_name")
      },
      Some("""WITH names AS (SELECT DISTINCT p_name FROM part),
             |dirty AS (
             |  SELECT p_name AS id,
             |    substring(p_name, 1, 1) || substring(p_name, 3) AS s
             |  FROM names)
             |SELECT d.id AS dirty_name, n.p_name AS clean_name,
             |  CAST(levenshtein(d.s, n.p_name) AS BIGINT) AS dist
             |FROM dirty d JOIN names n
             |  ON levenshtein(d.s, n.p_name) <= 2
             |ORDER BY dirty_name, clean_name""".stripMargin)),

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

    Q("q89_pagerank",
      (s, dir) => {
        // Purchase-influence PageRank over the bipartite customer↔
        // supplier graph: 3 fixed rounds of fixed-point integer PageRank
        // (two key-partitioned shuffles per round, map-side-combined
        // contribution sums). The FULL rank vector hash-gates because
        // every step is exact long arithmetic — no float summation
        // order anywhere.
        GraphOps.pageRank(purchaseGraph(s, dir), iters = 3)
          .select(col("id").as("node_id"), col("pr").as("rank_fp"))
          .orderBy("node_id")
      },
      Some(pageRankOracleSql(3))),

    Q("q90_bfs_levels",
      (s, dir) => {
        // Minimum-hop BFS from the smallest node id, frontier-expanded
        // to depth 4: each round joins only the NEW frontier against the
        // edge list and anti-joins the visited set, so a node's level is
        // its first-discovery round. The oracle walks the same graph
        // with a depth-guarded recursive CTE and collapses to
        // min(level) — a wholly different evaluation strategy arriving
        // at the identical labeling.
        val g = purchaseGraph(s, dir)
        GraphOps.bfsLevels(g, g.agg(min(col("src")).as("id")), maxDepth = 4)
          .select(col("id").as("node_id"), col("level"))
          .orderBy("node_id")
      },
      Some(s"""WITH RECURSIVE $purchaseGraphCtes,
             |s0 AS (SELECT min(src) AS id FROM edges),
             |b AS (
             |  SELECT id, 0 AS lvl FROM s0
             |  UNION
             |  SELECT e.dst, b.lvl + 1 FROM b JOIN edges e ON e.src = b.id
             |  WHERE b.lvl < 4)
             |SELECT id AS node_id, CAST(min(lvl) AS BIGINT) AS level
             |FROM b GROUP BY id ORDER BY node_id""".stripMargin)),

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

    Q("q94_tfidf_search",
      (s, dir) => {
        // Ranked keyword retrieval over inverted-index statistics:
        // integer-scaled idf (N·1e6 div df) times tf, summed per doc —
        // exact long arithmetic end to end, so the top-50 ranking
        // hash-gates. df is computed over the WHOLE corpus, but only
        // postings matching the query terms reach the scoring shuffle;
        // the tiny df/N frames broadcast. Top-50 via orderBy+limit →
        // TakeOrdered, never a single-partition global sort.
        val qTerms = Seq("join", "hash", "vector", "stream")
        val docs = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        val tf = docs
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n"))
        tf.filter(col("term").isin(qTerms: _*))
          .join(broadcast(dfreq.filter(col("term").isin(qTerms: _*))), "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("w", col("tf") * expr("(n * 1000000) div df"))
          .groupBy("doc_id")
          .agg(sum("w").as("score_fp"), count(lit(1)).as("n_terms"))
          .orderBy(col("score_fp").desc, col("doc_id"))
          .limit(50)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf
             |  FROM toks WHERE term <> '' GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT tf.doc_id,
             |  CAST(sum(tf.tf * ((n.n * 1000000) // dfreq.df)) AS BIGINT) AS score_fp,
             |  CAST(count(*) AS BIGINT) AS n_terms
             |FROM tf JOIN dfreq USING (term) CROSS JOIN n
             |WHERE term IN ('join', 'hash', 'vector', 'stream')
             |GROUP BY 1
             |ORDER BY score_fp DESC, doc_id LIMIT 50""".stripMargin)),

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

    Q("q99_rag_chunks",
      (s, dir) => {
        // RAG-prep chunking: overlapping 64-token windows, stride 48
        // (25% overlap). Tokenize once per doc, posexplode the stride
        // grid — the chunk id IS the grid position, no second pass.
        // Chunks travel as md5 fingerprints so the dump stays narrow;
        // a real pipeline would carry chunk_text into the embedder.
        // Narrow projection end to end: the only exchange is the
        // repartition that spreads CPU-bound tokenization.
        val winSize = 64
        val stride = 48
        val base = tp(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
              .as("toks"))
          .filter(size(col("toks")) > 0)
        base.select(col("doc_id"),
            posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
              .as(Seq("chunk_id", "st")),
            col("toks"))
          .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
            size(slice(col("toks"), col("st") + 1, lit(winSize)))
              .cast(LongType).as("n_tokens"),
            md5(array_join(slice(col("toks"), col("st") + 1, lit(winSize)), " "))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                x -> x <> '') AS toks
             |  FROM documents),
             |nz AS (SELECT doc_id, toks, len(toks) AS n FROM base WHERE len(toks) > 0),
             |st AS (
             |  SELECT doc_id, toks,
             |    unnest(generate_series(0, n - 1, 48)) AS start
             |  FROM nz)
             |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
             |  CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_tokens,
             |  md5(array_to_string(toks[start + 1 : start + 64], ' ')) AS chunk_md5
             |FROM st ORDER BY doc_id, chunk_id""".stripMargin)),

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

    Q("q104_weighted_sample",
      (s, dir) => {
        // Deterministic weight-proportional corpus sample (longer docs
        // more likely kept): portable-hash uniform vs weight/max as an
        // integer cross-multiplication — no float ratio, no RNG state,
        // identical rows on every run/engine/partitioning. The max is a
        // 1-row broadcast; the filter is a narrow scan projection.
        TrainingSetOps.weightedSample(
            t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
            col("doc_id"), col("n_chars"))
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH mx AS (SELECT max(n_chars) AS maxw FROM documents)
             |SELECT doc_id, n_chars
             |FROM documents, mx
             |WHERE ((('0x' || substr(md5(doc_id::VARCHAR || ':wsample'), 1, 15))::BIGINT
             |        % ${PortableHash.P}) % 1000000) * maxw < n_chars * 1000000
             |ORDER BY doc_id""".stripMargin)),

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

    Q("q120_linear_scorer",
      (s, dir) => {
        // Batch inference of a linear quality model: integer features ×
        // integer weights → an exact logit per document, thresholded —
        // the shape of every "apply a trained linear/logistic scorer at
        // corpus scale" job. A narrow codegen'd projection (no shuffle
        // until the final sort); ranking by the raw logit is
        // monotone-equivalent to the sigmoid, which is what keeps the
        // whole output oracle-able.
        val nTokens = TextOps.tokenCount(col("text")).cast(LongType)
        val stopHits = TextOps
          .wordSetHits(col("text"),
            Seq("the", "a", "of", "and", "to", "in", "is", "that"))
          .cast(LongType)
        val nDigits = regexp_count(col("text"), lit("[0-9]")).cast(LongType)
        tp(s, dir, "documents")
          .select(col("doc_id"),
            (lit(3L) * col("n_chars") + lit(5L) * nTokens -
              lit(2L) * nDigits + lit(11L) * stopHits).as("logit_fp"))
          .withColumn("keep",
            when(col("logit_fp") >= 3000L, lit(1L)).otherwise(lit(0L)))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    len(regexp_extract_all(text, '[0-9]')) AS n_digits
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(3 * n_chars + 5 * n_tokens - 2 * n_digits + 11 * stop_hits AS BIGINT) AS logit_fp,
             |  CAST(CASE WHEN 3 * n_chars + 5 * n_tokens - 2 * n_digits + 11 * stop_hits >= 3000
             |       THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM f ORDER BY doc_id""".stripMargin)),

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

    Q("q123_model_auc",
      (s, dir) => {
        // Exact ROC AUC of the q120 linear quality scorer against the
        // lang='en' label — the eval step of every "score a corpus"
        // job. Integer rank-sum over score-grain aggregates (ties
        // counted as half-pairs, kept exact by doubling); the one
        // division happens once, at the end, on exact longs.
        EvalOps.aucExact(scoredDocs(s, dir), col("score"), col("label"))
          .select(col("auc_num2"), col("auc_den2"), r6(col("auc")).as("auc"))
      },
      Some(s"""$scoredDocsCte,
             |g AS (SELECT score AS sc, CAST(sum(label) AS BIGINT) AS np,
             |        CAST(sum(1 - label) AS BIGINT) AS nn
             |      FROM sc GROUP BY 1),
             |c AS (SELECT sc, np, nn,
             |        CAST(sum(nn) OVER (ORDER BY sc) AS BIGINT) AS cum_nn
             |      FROM g)
             |SELECT
             |  CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS auc_num2,
             |  CAST(2 * sum(np) * sum(nn) AS BIGINT) AS auc_den2,
             |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
             |    floor(CAST(sum(np * (2 * (cum_nn - nn) + nn)) AS DOUBLE) /
             |          CAST(2 * sum(np) * sum(nn) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             |  END AS auc
             |FROM c""".stripMargin)),

    Q("q124_scorer_confusion",
      (s, dir) => {
        // Threshold confusion metrics for the same scorer/label: four
        // exact counts in ONE narrow aggregation pass, ratios derived
        // from the longs by one fixed division each.
        EvalOps.confusionAt(scoredDocs(s, dir), col("score"), col("label"),
            threshold = 3000L)
          .select(col("tp"), col("fp"), col("fn"), col("tn"),
            r6(col("precision")).as("precision"), r6(col("recall")).as("recall"),
            r6(col("f1")).as("f1"))
      },
      Some(s"""$scoredDocsCte,
             |m AS (SELECT
             |  CAST(sum(CASE WHEN label = 1 AND score >= 3000 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |  CAST(sum(CASE WHEN label = 0 AND score >= 3000 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |  CAST(sum(CASE WHEN label = 1 AND score < 3000 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |  CAST(sum(CASE WHEN label = 0 AND score < 3000 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM sc)
             |SELECT tp, fp, fn, tn,
             |  CASE WHEN tp + fp > 0 THEN floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS precision,
             |  CASE WHEN tp + fn > 0 THEN floor(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS recall,
             |  CASE WHEN 2 * tp + fp + fn > 0 THEN floor(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 END AS f1
             |FROM m""".stripMargin)),

    Q("q125_grouped_ols",
      (s, dir) => {
        // Per-nation least-squares fit (discount vs quantity) from the
        // five sufficient statistics — regression as ONE map-side-
        // combined aggregation; slope/intercept exact-integer fractions
        // plus one final division.
        val base = t(s, dir, "lineitem")
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            floor(col("l_quantity")).cast(LongType).as("x"),
            floor(col("l_discount") * 100).cast(LongType).as("y"))
        RegressionOps.groupedOls(base, Seq("n_name"), col("x"), col("y"))
          .select(col("n_name"), col("n"), col("slope_num"), col("slope_den"),
            col("icept_num"), r6(col("slope")).as("slope"),
            r6(col("intercept")).as("intercept"))
          .orderBy("n_name")
      },
      Some("""WITH b AS (
             |  SELECT n_name, CAST(floor(l_quantity) AS BIGINT) AS x,
             |         CAST(floor(l_discount * 100) AS BIGINT) AS y
             |  FROM lineitem
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON n_nationkey = s_nationkey),
             |g AS (
             |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM b GROUP BY 1)
             |SELECT n_name, n,
             |  n * sxy - sx * sy AS slope_num,
             |  n * sxx - sx * sx AS slope_den,
             |  sy * sxx - sx * sxy AS icept_num,
             |  CASE WHEN n * sxx - sx * sx <> 0 THEN
             |    floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             |  END AS slope,
             |  CASE WHEN n * sxx - sx * sx <> 0 THEN
             |    floor(CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             |  END AS intercept
             |FROM g ORDER BY n_name""".stripMargin)),

    Q("q126_setsim_join",
      (s, dir) => {
        // Exact-recall near-dup pairs via prefix-filtered set-similarity
        // join over distinct 3-gram shingle sets (Jaccard >= 0.6 as the
        // rational 6/10 — integer verify, no float boundary rows). The
        // oracle runs the naive all-pairs join, so the hash-match IS the
        // completeness proof for the prefix blocking.
        val docs = tp(s, dir, "documents")
          .select(col("doc_id").as("id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("toks"))
        SetSimJoinOps.jaccardJoin(docs, tNum = 6, tDen = 10)
          .withColumn("jaccard",
            r4(col("inter").cast(DoubleType) / col("uni").cast(DoubleType)))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |d AS (
             |  SELECT id, list_distinct(CASE WHEN len(w) >= 3
             |    THEN list_transform(generate_series(0, len(w) - 3),
             |           i -> array_to_string(list_slice(w, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(w, ' ')] END) AS toks
             |  FROM t),
             |p AS (
             |  SELECT a.id AS id_a, b.id AS id_b,
             |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
             |    CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
             |  FROM d a JOIN d b ON a.id < b.id)
             |SELECT id_a, id_b, inter, uni,
             |  floor(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS jaccard
             |FROM p WHERE inter * 10 >= uni * 6 ORDER BY id_a, id_b""".stripMargin)),

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

    Q("q129_semantic_dedup",
      (s, dir) => {
        // SemDeDup: k-means-cluster the embeddings (the SAME cached IVF
        // fit q41/q70 search with), then greedily drop any vector whose
        // cosine to a lower-id cluster mate is >= tau. The pair join
        // never leaves a cluster — nlist bounds the quadratic term.
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.semanticDedup(corpus, tau = 0.4, nlist = 16,
            cacheKey = Some(s"embeddings:$dir"))
          .select(col("cid").as("vec_id"),
            col("centroid_id").cast(IntegerType).as("cluster"))
          .orderBy("vec_id")
      },
      // q41's full IVF-fit re-derivation, then the same greedy
      // within-cluster prune relationally in SQL
      Some(s"""$ivfOracleCtes,
           |dropped AS (
           |  SELECT DISTINCT b.cid FROM asgF a JOIN asgF b
           |    ON a.kid = b.kid AND a.cid < b.cid
           |  WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
           |SELECT a.cid AS vec_id, CAST(a.kid AS INT) AS cluster
           |FROM asgF a LEFT JOIN dropped d ON d.cid = a.cid
           |WHERE d.cid IS NULL
           |ORDER BY vec_id""".stripMargin)),

    Q("q130_bm25_search",
      (s, dir) => {
        // BM25 ranked retrieval (k1=1.2, b=0.75) — q94's tf-idf upgraded
        // with document-length normalization. House-style exact: the idf
        // is the raw Robertson ratio (N-df+0.5)/(df+0.5) WITHOUT the log
        // (the same log-free discipline as q75's lift), every double op
        // is a correctly-rounded IEEE step written in the SAME order as
        // the oracle SQL, and each (doc,term) contribution is floored to
        // fixed-point BEFORE the per-doc sum — long addition is exactly
        // associative, so the score is partitioning-independent.
        // Plan shape: df/N/avgdl are term- and 1-row-sized (broadcast);
        // only postings matching the query terms reach the doc_id
        // scoring join — the standard document-at-a-time scoring
        // shuffle. Top-50 via orderBy+limit → TakeOrdered.
        val qTerms = Seq("join", "hash", "vector", "stream")
        val docs = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        // ONE tokenize pass: doc length is the sum of the per-term
        // counts, so dl/df/stats all derive from the persisted tf frame
        val tf = docs
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .pin()
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))
        val nD = col("n").cast(DoubleType)
        val dfD = col("df").cast(DoubleType)
        val tfD = col("tf").cast(DoubleType)
        val avgdl = col("sum_dl").cast(DoubleType) / nD
        val idfR = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
        val tfn = (tfD * lit(2.2)) /
          (tfD + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast(DoubleType) / avgdl)))
        tf.filter(col("term").isin(qTerms: _*))
          .join(broadcast(dfreq.filter(col("term").isin(qTerms: _*))), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("c_fp", floor(idfR * tfn * lit(1000000.0)).cast(LongType))
          .groupBy("doc_id")
          .agg(sum("c_fp").as("score_fp"), count(lit(1)).as("n_terms"))
          .orderBy(col("score_fp").desc, col("doc_id"))
          .limit(50)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
             |  FROM documents),
             |tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
             |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl),
             |sc AS (
             |  SELECT tf.doc_id,
             |    CAST(floor(
             |      ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             |      * ((CAST(tf AS DOUBLE) * 2.2) /
             |         (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
             |           (CAST(dl.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))))
             |      * 1000000.0) AS BIGINT) AS c_fp
             |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
             |  WHERE term IN ('join', 'hash', 'vector', 'stream'))
             |SELECT doc_id, CAST(sum(c_fp) AS BIGINT) AS score_fp,
             |  CAST(count(*) AS BIGINT) AS n_terms
             |FROM sc GROUP BY 1
             |ORDER BY score_fp DESC, doc_id LIMIT 50""".stripMargin)),

    Q("q131_sample_quantiles",
      (s, dir) => {
        // Grouped quantile SKETCH: a deterministic bottom-k-by-portable-
        // hash sample per group (KMV-style — the same discipline as
        // q104/q106), held in the native bounded-heap aggregate, then
        // type-1 quantiles read off the sample. The scale contract the
        // exact q121 percentile_disc cannot give: O(k) state per group
        // through a map-side-combined ObjectHashAggregate, NO per-group
        // sort of the input anywhere; rank error is O(1/sqrt(k)), and
        // groups with <= k rows are EXACT (sf0.01 oracle runs partly in
        // that regime; the spec covers the sampled regime). The sample
        // ships ids only; values join back in one k*G-row hash join.
        val k = 256
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val h = PortableHash.base(
          concat(col("event_id").cast("string"), lit(":kq")))
        val sampled = ev
          .groupBy("event_type")
          .agg(graft.functions.TopKAgg.topKByScore(
            col("event_id"), -h.cast(DoubleType), k).as("tk"))
          .select(col("event_type"), explode(col("tk.id")).as("event_id"))
        val sv = sampled.join(ev.select("event_id", "value"), "event_id")
        val wv = Window.partitionBy("event_type")
          .orderBy(col("value"), col("event_id"))
        val ranked = sv
          .withColumn("rn", row_number().over(wv).cast(LongType))
          .withColumn("ns", count(lit(1))
            .over(Window.partitionBy("event_type")).cast(LongType))
        def atQ(p: Double, name: String) = max(when(
          col("rn") === ceil(lit(p) * col("ns").cast(DoubleType)),
          col("value"))).as(name)
        ranked.groupBy("event_type")
          .agg(max(col("ns")).as("n_sample"),
            atQ(0.5, "p50"), atQ(0.9, "p90"), atQ(0.99, "p99"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (
             |  SELECT event_type, event_id, value,
             |    (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':kq'), 1, 15))::BIGINT
             |      % 2147483647) AS hv
             |  FROM events),
             |samp AS (
             |  SELECT event_type, event_id, value FROM h
             |  QUALIFY row_number() OVER (PARTITION BY event_type
             |    ORDER BY hv, event_id) <= 256),
             |rk AS (
             |  SELECT event_type, value,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY value, event_id) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS ns
             |  FROM samp)
             |SELECT event_type, max(ns) AS n_sample,
             |  max(CASE WHEN rn = CAST(ceil(0.5 * CAST(ns AS DOUBLE)) AS BIGINT)
             |    THEN value END) AS p50,
             |  max(CASE WHEN rn = CAST(ceil(0.9 * CAST(ns AS DOUBLE)) AS BIGINT)
             |    THEN value END) AS p90,
             |  max(CASE WHEN rn = CAST(ceil(0.99 * CAST(ns AS DOUBLE)) AS BIGINT)
             |    THEN value END) AS p99
             |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q132_triangle_count",
      (s, dir) => {
        // Triangle counting over the part co-purchase graph (parts
        // co-bought in >= 2 orders — the market-basket support floor
        // that keeps the graph REAL structure: one-off co-occurrences
        // are noise that made every part a near-clique neighbor, 1.2M
        // edges -> 36M wedges at sf0.1), by DEGREE-ORDERED edge
        // orientation: every edge points from its (degree, id)-smaller
        // endpoint to the larger, so each triangle is counted at
        // exactly one node and — the scale property — out-degree is
        // bounded by O(sqrt(m)) even for hub nodes, which caps the
        // wedge join that a naive adjacency self-join would blow up
        // on. Wedges probe the oriented edge set in one equi-join on
        // the (b,c) pair.
        val pairs = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = pairs.as("x").join(pairs.as("y"), Seq("ok"))
          .filter(col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("u"), col("y.pk").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v")
        val deg = edges.select(col("u").as("node"))
          .union(edges.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val oriented = edges
          .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")),
              struct(col("u").as("a"), col("v").as("b")))
            .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .pin()
        val wedges = oriented.as("e1").join(oriented.as("e2"), Seq("a"))
          .filter(col("e1.b") < col("e2.b"))
          .select(col("e1.b").as("w1"), col("e2.b").as("w2"))
        val tri = wedges.join(oriented,
          col("w1") === col("a") && col("w2") === col("b"))
        tri.agg(count(lit(1)).as("n_triangles"))
          .crossJoin(broadcast(oriented.agg(count(lit(1)).as("n_edges"))))
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |edges AS (
             |  SELECT x.pk AS u, y.pk AS v
             |  FROM pairs x JOIN pairs y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT u AS node FROM edges
             |    UNION ALL SELECT v AS node FROM edges) GROUP BY 1),
             |oriented AS (
             |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
             |      THEN u ELSE v END AS a,
             |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
             |      THEN v ELSE u END AS b
             |  FROM edges
             |  JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
             |wedges AS (
             |  SELECT e1.b AS w1, e2.b AS w2
             |  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a
             |  WHERE e1.b < e2.b)
             |SELECT CAST((SELECT count(*) FROM wedges w
             |    JOIN oriented o ON o.a = w.w1 AND o.b = w.w2) AS BIGINT)
             |  AS n_triangles,
             |  CAST((SELECT count(*) FROM oriented) AS BIGINT) AS n_edges""".stripMargin)),

    Q("q133_dsir_importance",
      (s, dir) => {
        // DSIR-shaped data selection (hashed-feature importance
        // resampling, arXiv:2302.03169): estimate a TARGET unigram
        // distribution (lang='en' docs) and the RAW corpus distribution
        // over 1024 portable-hash buckets, weight every token occurrence
        // by the add-one-smoothed probability ratio, and take the
        // top-100 docs by summed weight. House-style exact: the ratio
        // ((t_b+1)/(T+B)) / ((r_b+1)/(R+B)) is computed as ONE integer
        // fixed-point division — no doubles anywhere, so the score is
        // exact and partitioning-independent. Bucket tables are
        // B-sized (broadcast); the only corpus-sized shuffles are the
        // two bucket-count aggregations and the per-doc score sum.
        val B = 1024
        // ONE tokenize pass: per-(doc, bucket) counts are persisted and
        // every downstream frame (raw/target distributions, per-doc
        // scores) is a rollup of that (|docs|*distinct-buckets)-sized
        // frame — far smaller than the token stream it summarizes
        val c = tp(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy(col("doc_id"), col("lang"),
            (PortableHash.long60(col("term")) % B).as("bkt"))
          .agg(count(lit(1)).as("cnt"))
          .pin()
        val raw = c.groupBy("bkt").agg(sum("cnt").as("r_b"))
        val tgt = c.filter(col("lang") === "en")
          .groupBy("bkt").agg(sum("cnt").as("t_b"))
        val totals = raw.agg(sum("r_b").as("rt"))
          .crossJoin(tgt.agg(sum("t_b").as("tt")))
        val w = raw.join(tgt, Seq("bkt"), "left")
          .na.fill(0L, Seq("t_b"))
          .crossJoin(broadcast(totals))
          .select(col("bkt"), expr(
            s"(1000000 * (t_b + 1) * (rt + $B)) div ((r_b + 1) * (tt + $B))")
            .as("w_fp"))
        c.join(broadcast(w), "bkt")
          .groupBy("doc_id")
          .agg(sum(col("w_fp") * col("cnt")).as("score_fp"),
            sum("cnt").as("n_tokens"))
          .orderBy(col("score_fp").desc, col("doc_id"))
          .limit(100)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    (('0x' || substr(md5(term), 1, 15))::BIGINT % 1024) AS bkt
             |  FROM (
             |    SELECT doc_id, lang,
             |      unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
             |    FROM documents)
             |  WHERE term <> ''),
             |raw AS (SELECT bkt, count(*) AS r_b FROM toks GROUP BY 1),
             |tgt AS (SELECT bkt, count(*) AS t_b FROM toks WHERE lang = 'en' GROUP BY 1),
             |tot AS (
             |  SELECT (SELECT sum(r_b) FROM raw) AS rt,
             |         (SELECT sum(t_b) FROM tgt) AS tt),
             |w AS (
             |  SELECT raw.bkt,
             |    (1000000 * (COALESCE(t_b, 0) + 1) * (rt + 1024))
             |      // ((r_b + 1) * (tt + 1024)) AS w_fp
             |  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt CROSS JOIN tot)
             |SELECT doc_id, CAST(sum(w_fp) AS BIGINT) AS score_fp,
             |  CAST(count(*) AS BIGINT) AS n_tokens
             |FROM toks JOIN w USING (bkt)
             |GROUP BY 1 ORDER BY score_fp DESC, doc_id LIMIT 100""".stripMargin)),

    Q("q134_cluster_topics",
      (s, dir) => {
        // Cluster topic labeling (BERTopic-style c-TF-IDF, log-free):
        // assign every embedding to its IVF cluster — the SAME cached
        // spherical-k-means fit q41/q70/q129 share, built once per
        // session — join cluster ids onto the documents, and rank each
        // cluster's terms by within-cluster relative frequency ×
        // inverse cluster-frequency. House-style exact: the score
        // (10000·cnt·nc) div (tot_c·cdf) is ONE integer division over
        // exact counts — no log, no doubles — so the ranking is
        // engine-portable. Plan shape: one tokenize pass; the
        // per-(cluster, term) count frame is map-side combined and
        // persisted, and every later frame (cluster totals, cluster-
        // frequency, nc) is a rollup of it; the top-3 window partitions
        // on cluster over vocabulary-sized frames — never corpus rows.
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, nlist = 16)
        val asg = model.assigned
          .select(col("cid").as("doc_id"),
            col("centroid_id").cast(IntegerType).as("cluster"))
        val ct = tp(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(length(col("term")) >= 4)
          .join(asg, "doc_id")
          .groupBy("cluster", "term").agg(count(lit(1)).as("cnt"))
          .pin()
        val tot = ct.groupBy("cluster").agg(sum("cnt").as("tot_c"))
        val cdf = ct.groupBy("term").agg(count(lit(1)).as("cdf"))
        val ncf = tot.agg(count(lit(1)).as("nc"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("score_fp").desc, col("term"))
        ct.join(tot, "cluster").join(cdf, "term")
          .crossJoin(broadcast(ncf))
          .withColumn("score_fp",
            expr("(10000 * cnt * nc) div (tot_c * cdf)"))
          .withColumn("rank", row_number().over(w).cast(IntegerType))
          .filter(col("rank") <= 3)
          .select(col("cluster"), col("rank"), col("term"), col("score_fp"))
          .orderBy("cluster", "rank")
      },
      // q41's full IVF-fit re-derivation, then the same c-TF-IDF rollups
      Some(s"""$ivfOracleCtes,
           |toksq AS (
           |  SELECT a.kid AS cluster, t.term FROM (
           |    SELECT doc_id,
           |      unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
           |    FROM documents) t
           |  JOIN asgF a ON a.cid = t.doc_id
           |  WHERE len(t.term) >= 4),
           |ct AS (SELECT cluster, term, count(*) AS cnt FROM toksq GROUP BY 1, 2),
           |tot AS (SELECT cluster, sum(cnt) AS tot_c FROM ct GROUP BY 1),
           |cdfq AS (SELECT term, count(*) AS cdf FROM ct GROUP BY 1),
           |ncf AS (SELECT count(*) AS nc FROM tot),
           |scored AS (
           |  SELECT ct.cluster, ct.term,
           |    (10000 * cnt * nc) // (tot_c * cdf) AS score_fp
           |  FROM ct JOIN tot USING (cluster) JOIN cdfq USING (term) CROSS JOIN ncf),
           |ranked AS (
           |  SELECT cluster, term, score_fp,
           |    row_number() OVER (PARTITION BY cluster
           |      ORDER BY score_fp DESC, term) AS rank
           |  FROM scored)
           |SELECT CAST(cluster AS INT) AS cluster, CAST(rank AS INT) AS rank,
           |  term, CAST(score_fp AS BIGINT) AS score_fp
           |FROM ranked WHERE rank <= 3 ORDER BY cluster, rank""".stripMargin)),

    Q("q135_source_overlap",
      (s, dir) => {
        // Pairwise source-level corpus overlap — the cross-source
        // leakage diagnostic run before mixing corpora (is 'web'
        // contaminated with 'wiki'?): exact Jaccard of each source's
        // DISTINCT 3-gram shingle set, computed via one self-join on
        // the shingle key. Scale shape: the (source, shingle) distinct
        // frame is one shuffle; the self-join fans out at most
        // S²/2 rows per shingle (S = #sources, a handful), then
        // map-side combines into an S²-sized pair frame — never an
        // all-pairs document join. Zero-overlap pairs are kept (the
        // S²-row dim-only cross join is broadcast).
        val sh = tp(s, dir, "documents")
          .select(col("source"),
            explode(array_distinct(TextOps.shingles(col("text"), 3))).as("sh"))
          .distinct()
          .pin()
        val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val co = sh.as("a").join(sh.as("b"), "sh")
          .filter(col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_common"))
        sizes.as("x").crossJoin(sizes.as("y"))
          .filter(col("x.source") < col("y.source"))
          .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
            col("x.n").as("n_a"), col("y.n").as("n_b"))
          .join(co, Seq("src_a", "src_b"), "left")
          .na.fill(0L, Seq("n_common"))
          .select(col("src_a"), col("src_b"), col("n_common"),
            col("n_a"), col("n_b"),
            expr("(1000000 * n_common) div (n_a + n_b - n_common)")
              .as("jaccard_fp"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH t AS (
             |  SELECT source, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |s3 AS (
             |  SELECT source,
             |    CASE WHEN len(toks) >= 3
             |      THEN list_transform(generate_series(0, len(toks) - 3),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh3
             |  FROM t),
             |sh AS (SELECT DISTINCT source, unnest(sh3) AS sh FROM s3),
             |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
             |co AS (
             |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
             |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT x.source AS src_a, y.source AS src_b,
             |  CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
             |  CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
             |  CAST((1000000 * COALESCE(n_common, 0))
             |    // (x.n + y.n - COALESCE(n_common, 0)) AS BIGINT) AS jaccard_fp
             |FROM sz x JOIN sz y ON x.source < y.source
             |LEFT JOIN co ON co.src_a = x.source AND co.src_b = y.source
             |ORDER BY src_a, src_b""".stripMargin)),

    Q("q136_hard_negatives",
      (s, dir) => {
        // Hard-negative mining for contrastive fine-tuning: per anchor
        // (vec_id < 16), the 10 most-similar vectors with a DIFFERENT
        // label — q38's exact broadcast scan with the label-mismatch
        // gate evaluated before the cosine.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("qlabel"))
        val corpus = emb.select(col("vec_id").as("cid"),
          col("embedding").as("cvec"), col("label").as("clabel"))
        SimilarityOps.hardNegativesTopK(queries, corpus, 10)
          .select(col("qid"), col("cid"), r4(col("cosine")).as("cosine"),
            col("rank"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qvec, label AS ql
             |  FROM embeddings WHERE vec_id < 16),
             |scored AS (
             |  SELECT q.qid, c.vec_id AS cid,
             |    list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
             |      CAST(c.embedding AS DOUBLE[])) AS cos_raw
             |  FROM embeddings c, q WHERE c.label <> q.ql),
             |ranked AS (
             |  SELECT qid, cid, cos_raw,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY cos_raw DESC, cid) AS rank
             |  FROM scored)
             |SELECT qid, cid, floor((cos_raw) * 10000.0 + 0.5) / 10000.0 AS cosine,
             |  CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin)),

    Q("q137_passage_neardup",
      (s, dir) => {
        // Passage-level cross-document near-dup detection: q99's
        // overlapping 64-token chunk grid, MinHash+LSH over the CHUNKS
        // (the same portable signature pipeline as q35 — band-bucket
        // join, never all-pairs), candidates restricted to chunks of
        // DIFFERENT documents, rolled up to (doc_a, doc_b) with the
        // matching-chunk count — catches documents that share an
        // edited passage but are globally dissimilar, which
        // whole-document MinHash (q35) misses by design. Chunk ids
        // pack (doc_id, grid position) into one long (position <
        // 1e6 — 48M tokens/doc — ENFORCED: PackedIds.packGridId
        // raise_errors on out-of-envelope ids rather than silently
        // colliding across documents); cid ordering therefore implies
        // doc_a <= doc_b, and the cross-doc filter makes it strict.
        val winSize = 64
        val stride = 48
        val chunks = tp(s, dir, "documents")
          .select(col("doc_id"),
            expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
              .as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"),
            posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
              .as(Seq("chunk_id", "st")),
            col("toks"))
          .select(
            graft.functions.PackedIds.packGridId(col("doc_id"), col("chunk_id"))
              .as("cid"),
            array_join(slice(col("toks"), col("st") + 1, lit(winSize)), " ")
              .as("ctext"))
        DedupOps.minhashCandidatePairs(chunks, col("cid"), col("ctext"))
          .filter(col("est_jaccard") >= 0.5)
          .filter(expr("id_a div 1000000") =!= expr("id_b div 1000000"))
          .groupBy(expr("id_a div 1000000").as("doc_a"),
            expr("id_b div 1000000").as("doc_b"))
          .agg(count(lit(1)).as("n_chunk_pairs"),
            r4(max(col("est_jaccard"))).as("max_est"))
          .orderBy("doc_a", "doc_b")
      },
      // q99's chunk grid + q35's full signature/band re-derivation,
      // composed: DuckDB rebuilds every chunk signature from scratch
      Some(s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |                x -> x <> '') AS toks
             |  FROM documents),
             |nz AS (SELECT doc_id, toks, len(toks) AS n FROM base WHERE len(toks) > 0),
             |ch AS (
             |  SELECT doc_id * 1000000 + (start // 48) AS cid,
             |    array_to_string(toks[start + 1 : start + 64], ' ') AS ctext
             |  FROM (SELECT doc_id, toks,
             |          unnest(generate_series(0, n - 1, 48)) AS start FROM nz)),
             |t AS (SELECT cid, string_split_regex(trim(ctext), '\\s+') AS toks FROM ch),
             |s AS (
             |  SELECT cid, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |hl AS (SELECT cid, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT cid, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT cid, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.cid AS id_a, c.cid AS id_b, a.sig AS sig_a, c.sig AS sig_b
             |  FROM bk a JOIN bk c ON a.band = c.band AND a.bucket = c.bucket AND a.cid < c.cid),
             |f AS (
             |  SELECT id_a // 1000000 AS doc_a, id_b // 1000000 AS doc_b,
             |    len(list_filter(generate_series(1, 32), i -> sig_a[i] = sig_b[i])) / 32.0 AS est
             |  FROM p
             |  WHERE len(list_filter(generate_series(1, 32), i -> sig_a[i] = sig_b[i])) / 32.0 >= 0.5
             |    AND id_a // 1000000 <> id_b // 1000000)
             |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_chunk_pairs,
             |  floor(max(est) * 10000.0 + 0.5) / 10000.0 AS max_est
             |FROM f GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin)),

    Q("q138_bigram_surprisal",
      (s, dir) => {
        // CCNet-style statistical quality filter, log-free: score every
        // document by its mean bigram surprisal under the corpus's own
        // bigram model — P(w2|w1) = n_ab / n_head(w1), surprisal kept
        // as the exact integer reciprocal (1e6·n_head) div n_ab instead
        // of -log p (the same no-log discipline as q75's lift), so the
        // per-doc mean is pure long arithmetic and the ranking is
        // engine-exact. High score = improbable transitions =
        // boilerplate/gibberish candidates. Plan shape: ONE bigram
        // pass, pre-aggregated per (doc, bigram) and persisted; the
        // model tables (bigram + head counts) are vocabulary-sized
        // rollups of it; scoring joins the per-doc frame against the
        // model on the bigram key — corpus-sized rows never amplify.
        val t = TextOps.tokens(col("text"))
        val db = tp(s, dir, "documents")
          .select(col("doc_id"),
            explode(arrays_zip(
              slice(t, lit(1), size(t) - 1),
              slice(t, lit(2), size(t) - 1))).as("p"))
          .select(col("doc_id"),
            col("p").getField("0").as("t1"), col("p").getField("1").as("t2"))
          .groupBy("doc_id", "t1", "t2").agg(count(lit(1)).as("k"))
          .pin()
        val big = db.groupBy("t1", "t2").agg(sum("k").as("n_ab"))
        val hd = big.groupBy("t1").agg(sum("n_ab").as("n_head"))
        db.join(big, Seq("t1", "t2")).join(hd, Seq("t1"))
          .groupBy("doc_id")
          .agg(sum(expr("k * ((1000000 * n_head) div n_ab)")).as("s_fp"),
            sum("k").as("nb"))
          .select(col("doc_id"), col("nb").as("n_bigrams"),
            expr("s_fp div nb").as("avg_surprisal_fp"))
          .orderBy(col("avg_surprisal_fp").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |bp AS (
             |  SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM d),
             |db AS (
             |  SELECT doc_id, p[1] AS t1, p[2] AS t2, count(*) AS k
             |  FROM bp GROUP BY 1, 2, 3),
             |big AS (SELECT t1, t2, CAST(sum(k) AS BIGINT) AS n_ab FROM db GROUP BY 1, 2),
             |hd AS (SELECT t1, CAST(sum(n_ab) AS BIGINT) AS n_head FROM big GROUP BY 1),
             |sc AS (
             |  SELECT doc_id, sum(k * ((1000000 * n_head) // n_ab)) AS s_fp,
             |    sum(k) AS nb
             |  FROM db JOIN big USING (t1, t2) JOIN hd USING (t1) GROUP BY 1)
             |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
             |  CAST(s_fp // nb AS BIGINT) AS avg_surprisal_fp
             |FROM sc ORDER BY avg_surprisal_fp DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q139_exact_substring_spans",
      (s, dir) =>
        // ExactSubstr dedup profiling (Lee et al., arXiv:2107.06499) via
        // rolling 8-token grams + gaps-and-islands span reassembly — the
        // boilerplate/license-header detector that whole-doc MinHash
        // (q35) and the chunk grid (q137) both miss. Plan shape is in
        // ExactSubstrOps: one gram count shuffle (map-side combined), a
        // LEFT SEMI feedback join, per-document windows; never
        // all-pairs. Top-50 most-covered documents.
        ExactSubstrOps.dupSpanProfile(tp(s, dir, "documents"),
            col("doc_id"), col("text"), l = 8, minOccurrences = 2L)
          .orderBy(col("coverage_fp").desc, col("doc_id"))
          .limit(50),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |nz AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM d
             |  WHERE len(t) >= 8),
             |gpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 8)) AS pos FROM nz),
             |g AS (SELECT doc_id, n, pos,
             |  substr(md5(array_to_string(t[pos + 1 : pos + 8], ' ')), 1, 15) AS gkey
             |  FROM gpos),
             |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
             |dp AS (SELECT doc_id, n, pos FROM g
             |  WHERE gkey IN (SELECT gkey FROM dup)),
             |m AS (SELECT doc_id, n, pos,
             |  max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             |  FROM dp),
             |mk AS (SELECT doc_id, n, pos,
             |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS ns
             |  FROM m),
             |sp AS (SELECT doc_id, n, pos,
             |  sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
             |  FROM mk),
             |spans AS (SELECT doc_id, n, span_id, min(pos) AS st, max(pos) + 7 AS en
             |  FROM sp GROUP BY 1, 2, 3),
             |outp AS (SELECT doc_id, count(*) AS n_spans,
             |  sum(en - st + 1) AS dup_tokens, n AS n_tokens
             |  FROM spans GROUP BY doc_id, n)
             |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
             |  CAST(dup_tokens AS BIGINT) AS dup_tokens, n_tokens,
             |  CAST((10000 * dup_tokens) // n_tokens AS BIGINT) AS coverage_fp
             |FROM outp ORDER BY coverage_fp DESC, doc_id LIMIT 50""".stripMargin)),

    Q("q140_quality_classifier",
      (s, dir) => {
        // In-engine training of the CCNet/fastText-style quality
        // classifier (ClassifierOps): logistic regression with a HARD
        // sigmoid (rational arithmetic — no exp(), bit-portable) fit by
        // 6 full-batch GD steps over standardized surface features, then
        // evaluated on the corpus it filtered. Labels come from the q31
        // quality rule (the stand-in for human/LLM labels an external
        // frame would supply); features deliberately overlap the rule's
        // components, so a converging fit recovers the decision boundary
        // — accuracy ~97% — proving the optimizer, not feature magic.
        // Scale shape: each GD step is ONE map-side-combined aggregation
        // (d+1 doubles out); driver state is the weight vector only.
        // Output: fixed-point-rounded weights + the confusion counts.
        val zCols = Seq("z1", "z2", "z3", "z4")
        val f = qualityLrFrame(s, dir)
        val w = ClassifierOps.fitHardSigmoidLR(f, zCols, "y", iters = 6, lr = 2.0)
        val p = ClassifierOps.score(w.toSeq, zCols)
        val wNames = Seq("w_bias", "w_ntok", "w_punct", "w_stop", "w_ttr")
        f.select(col("y"), p.as("p"))
          .agg(
            sum(when(col("p") >= 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
            sum(when(col("p") >= 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
            sum(when(col("p") < 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
            sum(when(col("p") < 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("tn"))
          .select(
            wNames.zipWithIndex.map { case (n, i) => r4(lit(w(i))).as(n) } ++
              Seq(col("tp"), col("fp"), col("fn"), col("tn")): _*)
      },
      // the full 6-step GD unrolled relationally: w0 = 0, each step is
      // one aggregate over the standardized frame; DuckDB re-derives the
      // identical weights because the hard sigmoid keeps every operation
      // in IEEE-exact rational arithmetic (final rounding absorbs
      // summation-order noise)
      Some {
        qualityLrOracleCtes +
          """
            |SELECT
            |  floor(wb * 10000 + 0.5) / 10000 AS w_bias,
            |  floor(w1 * 10000 + 0.5) / 10000 AS w_ntok,
            |  floor(w2 * 10000 + 0.5) / 10000 AS w_punct,
            |  floor(w3 * 10000 + 0.5) / 10000 AS w_stop,
            |  floor(w4 * 10000 + 0.5) / 10000 AS w_ttr,
            |  (SELECT CAST(count(*) FILTER (p >= 0.5 AND y = 1.0) AS BIGINT) FROM sc) AS tp,
            |  (SELECT CAST(count(*) FILTER (p >= 0.5 AND y = 0.0) AS BIGINT) FROM sc) AS fp,
            |  (SELECT CAST(count(*) FILTER (p < 0.5 AND y = 1.0) AS BIGINT) FROM sc) AS fn,
            |  (SELECT CAST(count(*) FILTER (p < 0.5 AND y = 0.0) AS BIGINT) FROM sc) AS tn
            |FROM w6""".stripMargin
      }),

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

    Q("q142_grouped_classifier",
      (s, dir) => {
        // Model-parallel classifier training: ONE independent hard-
        // sigmoid LR per source (the "per-domain quality model" pattern),
        // all 20 fitted simultaneously by fitGroupedHardSigmoidLR — each
        // GD step is one broadcast join of the model-sized weights frame
        // plus one grouped aggregation, so 10k domains would train in
        // the same four passes. Features/labels as q140; standardization
        // is global so weights are comparable across sources. Output:
        // per-source weights + confusion (the cross-source spread of
        // w_ntok/w_stop is itself a domain-shift diagnostic).
        val txt = col("text")
        val nt = TextOps.tokenCount(txt).cast(DoubleType)
        val f0 = tp(s, dir, "documents")
          .filter(TextOps.tokenCount(txt) > 0)
          .select(
            col("source"),
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
        val zCols = Seq("z1", "z2", "z3", "z4")
        val f = f0.crossJoin(broadcast(stRow))
          .select(col("source") +: col("y") +:
            zCols.zipWithIndex.map { case (z, i) =>
              ((col(s"x${i + 1}") - col(s"m${i + 1}")) / col(s"s${i + 1}")).as(z)
            }: _*)
          .pin()
        val wDf = ClassifierOps.fitGroupedHardSigmoidLR(
          f, "source", zCols, "y", iters = 4, lr = 2.0)
        val z = zCols.zipWithIndex.foldLeft(col("_w0")) { case (acc, (c, i)) =>
          acc + col(c) * col(s"_w${i + 1}")
        }
        val cf = f.join(broadcast(wDf), "source")
          .select(col("source"), col("y"), ClassifierOps.hardSigmoid(z).as("p"))
          .groupBy("source")
          .agg(
            sum(when(col("p") >= 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
            sum(when(col("p") >= 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
            sum(when(col("p") < 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
            sum(when(col("p") < 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("tn"))
        wDf.join(cf, "source")
          .select(col("source"),
            r4(col("_w0")).as("w_bias"), r4(col("_w1")).as("w_ntok"),
            r4(col("_w2")).as("w_punct"), r4(col("_w3")).as("w_stop"),
            r4(col("_w4")).as("w_ttr"),
            col("tp"), col("fp"), col("fn"), col("tn"))
          .orderBy("source")
      },
      // q140's unrolled GD with every stage grouped by source: the
      // weights CTEs carry one row per source instead of one row total
      Some {
        val head =
          """WITH toksq AS (
            |  SELECT doc_id, source, text,
            |    string_split_regex(trim(text), '\s+') AS t,
            |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
            |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS DOUBLE) AS stop_hits,
            |    CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS DOUBLE) AS n_punct
            |  FROM documents),
            |f0 AS (
            |  SELECT source,
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
            |  SELECT source, y, (x1-m1)/s1 AS z1, (x2-m2)/s2 AS z2,
            |         (x3-m3)/s3 AS z3, (x4-m4)/s4 AS z4
            |  FROM f0 CROSS JOIN st),
            |w0 AS (SELECT DISTINCT source, 0.0 wb, 0.0 w1, 0.0 w2, 0.0 w3, 0.0 w4 FROM f)""".stripMargin
        val steps = (1 to 4).map { i =>
          s""",
             |p$i AS (SELECT f.source AS source, y, z1, z2, z3, z4,
             |  least(greatest((wb + w1*z1 + w2*z2 + w3*z3 + w4*z4) * 0.25 + 0.5, 0), 1) AS p
             |  FROM f JOIN w${i - 1} USING (source)),
             |g$i AS (SELECT source, avg(p - y) gb, avg((p-y)*z1) g1, avg((p-y)*z2) g2,
             |  avg((p-y)*z3) g3, avg((p-y)*z4) g4 FROM p$i GROUP BY source),
             |w$i AS (SELECT source, wb - 2.0*gb AS wb, w1 - 2.0*g1 AS w1, w2 - 2.0*g2 AS w2,
             |  w3 - 2.0*g3 AS w3, w4 - 2.0*g4 AS w4 FROM w${i - 1} JOIN g$i USING (source))""".stripMargin
        }.mkString
        val tail =
          """,
            |sc AS (SELECT source, y,
            |  least(greatest((wb + w1*z1 + w2*z2 + w3*z3 + w4*z4) * 0.25 + 0.5, 0), 1) AS p
            |  FROM f JOIN w4 USING (source)),
            |cf AS (SELECT source,
            |  CAST(count(*) FILTER (p >= 0.5 AND y = 1.0) AS BIGINT) tp,
            |  CAST(count(*) FILTER (p >= 0.5 AND y = 0.0) AS BIGINT) fp,
            |  CAST(count(*) FILTER (p < 0.5 AND y = 1.0) AS BIGINT) fn,
            |  CAST(count(*) FILTER (p < 0.5 AND y = 0.0) AS BIGINT) tn
            |  FROM sc GROUP BY source)
            |SELECT source,
            |  floor(wb*10000+0.5)/10000 AS w_bias, floor(w1*10000+0.5)/10000 AS w_ntok,
            |  floor(w2*10000+0.5)/10000 AS w_punct, floor(w3*10000+0.5)/10000 AS w_stop,
            |  floor(w4*10000+0.5)/10000 AS w_ttr, tp, fp, fn, tn
            |FROM w4 JOIN cf USING (source) ORDER BY source""".stripMargin
        head + steps + tail
      }),

    Q("q143_strip_dup_spans",
      (s, dir) =>
        // The APPLY side of q139: rebuild each affected document with
        // its duplicated spans removed (strip-everywhere policy — see
        // ExactSubstrOps.stripDupSpans scaladoc) and return the 50 most-
        // reduced documents WITH the reconstructed text, so the oracle
        // proves the actual byte-level rewrite, not just the counts.
        ExactSubstrOps.stripDupSpans(tp(s, dir, "documents"),
            col("doc_id"), col("text"), l = 8, minOccurrences = 2L)
          .orderBy(col("removed_tokens").desc, col("doc_id"))
          .limit(50),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |nz AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM d
             |  WHERE len(t) >= 8),
             |gpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 8)) AS pos FROM nz),
             |g AS (SELECT doc_id, n, pos,
             |  substr(md5(array_to_string(t[pos + 1 : pos + 8], ' ')), 1, 15) AS gkey
             |  FROM gpos),
             |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
             |dp AS (SELECT doc_id, n, pos FROM g
             |  WHERE gkey IN (SELECT gkey FROM dup)),
             |m AS (SELECT doc_id, n, pos,
             |  max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             |  FROM dp),
             |mk AS (SELECT doc_id, n, pos,
             |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS ns
             |  FROM m),
             |sp AS (SELECT doc_id, n, pos,
             |  sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
             |  FROM mk),
             |spans AS (SELECT doc_id, n, span_id, min(pos) AS st, max(pos) + 7 AS en
             |  FROM sp GROUP BY 1, 2, 3),
             |cov AS (SELECT doc_id, unnest(generate_series(CAST(st AS INT),
             |    CAST(en AS INT))) AS pos FROM spans),
             |allpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 1)) AS pos FROM nz),
             |tokpos AS (SELECT doc_id, n, pos, t[pos + 1] AS tok FROM allpos),
             |kept AS (SELECT k.doc_id, k.n, k.pos, k.tok FROM tokpos k
             |  ANTI JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos),
             |reb AS (SELECT doc_id, n,
             |    CAST(count(*) AS BIGINT) AS kept_tokens,
             |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
             |  FROM kept GROUP BY doc_id, n),
             |aff AS (SELECT DISTINCT doc_id, n FROM spans)
             |SELECT aff.doc_id, aff.n AS n_tokens,
             |  COALESCE(kept_tokens, 0) AS kept_tokens,
             |  CAST(aff.n - COALESCE(kept_tokens, 0) AS BIGINT) AS removed_tokens,
             |  COALESCE(cleaned_text, '') AS cleaned_text
             |FROM aff LEFT JOIN reb ON aff.doc_id = reb.doc_id AND aff.n = reb.n
             |ORDER BY removed_tokens DESC, aff.doc_id LIMIT 50""".stripMargin)),

    Q("q144_ann_recall",
      (s, dir) => {
        // The eval every ANN deployment needs: measured recall@10 of
        // each approximate index against the exact brute-force ground
        // truth, as ONE relational query — the approx top-k sets
        // semi-join the exact set on (qid, cid), hits are counted, and
        // recall is an exact fixed-point division. Reuses the very
        // operators q38/q39/q49/q41 serve (and the same cached IVF
        // fit), so the number measures the production indexes, not
        // re-implementations. Scale: ground truth over a query SAMPLE
        // (16 anchors) — the standard recall-eval protocol at corpus
        // sizes where exact search on all queries is impossible.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val exact = SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .select("qid", "cid").pin()
        def recallOf(name: String, approx: DataFrame): DataFrame =
          exact.join(approx.select("qid", "cid"), Seq("qid", "cid"), "left_semi")
            .agg(count(lit(1)).as("hits"))
            .crossJoin(broadcast(exact.agg(count(lit(1)).as("possible"))))
            .select(lit(name).as("method"), col("hits"), col("possible"),
              expr("(10000 * hits) div possible").as("recall_fp"))
        recallOf("ivf_nprobe4",
            SimilarityOps.ivfTopK(queries, corpus, 10, nlist = 16, nprobe = 4,
              cacheKey = Some(s"embeddings:$dir")))
          .unionAll(recallOf("lsh_6bit",
            SimilarityOps.lshTopK(queries, corpus, 10, dim = embDim, bits = 6)))
          .unionAll(recallOf("lsh_multi2",
            SimilarityOps.lshTopK(queries, corpus, 10, dim = embDim, bits = 6,
              tables = 2)))
          .orderBy("method")
      },
      // every index's oracle derivation composed (q38 exact, q39 LSH,
      // q49 multi-table, q41 IVF incl. the full fit), reduced to
      // (qid, cid) sets and intersected with the exact set
      Some(s"""$ivfOracleCtes,
           |ivs AS (
           |  SELECT q.qid, a.cid, list_cosine_similarity(q.qv, a.v) AS cos_raw
           |  FROM probe p JOIN q ON q.qid = p.qid JOIN asgF a ON a.kid = p.kid
           |  WHERE a.cid <> q.qid),
           |ivr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM ivs),
           |ivk AS (SELECT qid, cid FROM ivr WHERE rank <= 10),
           |exs AS (
           |  SELECT q.qid, c.cid, list_cosine_similarity(q.qv, c.v) AS cos_raw
           |  FROM corpus c, q WHERE c.cid <> q.qid),
           |exr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM exs),
           |exk AS (SELECT qid, cid FROM exr WHERE rank <= 10),
           |lb AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
           |  FROM embeddings),
           |lq AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM lb WHERE vec_id < 16),
           |lsc AS (
           |  SELECT lq.qid, c.vec_id AS cid,
           |    list_cosine_similarity(CAST(lq.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
           |  FROM lb c JOIN lq USING (bucket) WHERE c.vec_id <> lq.qid),
           |lr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM lsc),
           |lk AS (SELECT qid, cid FROM lr WHERE rank <= 10),
           |mb1 AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 7)} AS bucket
           |  FROM embeddings),
           |mb2 AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 8)} AS bucket
           |  FROM embeddings),
           |mq1 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM mb1 WHERE vec_id < 16),
           |mq2 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM mb2 WHERE vec_id < 16),
           |mc AS (
           |  SELECT mq1.qid, c.vec_id AS cid, mq1.qvec, c.embedding AS cvec
           |  FROM mb1 c JOIN mq1 USING (bucket) WHERE c.vec_id <> mq1.qid
           |  UNION
           |  SELECT mq2.qid, c.vec_id AS cid, mq2.qvec, c.embedding AS cvec
           |  FROM mb2 c JOIN mq2 USING (bucket) WHERE c.vec_id <> mq2.qid),
           |mr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
           |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
           |  FROM mc),
           |mk AS (SELECT qid, cid FROM mr WHERE rank <= 10),
           |poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM exk)
           |SELECT method, hits, possible,
           |  CAST((10000 * hits) // possible AS BIGINT) AS recall_fp
           |FROM (
           |  SELECT 'ivf_nprobe4' AS method,
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk JOIN ivk USING (qid, cid)) AS hits
           |  UNION ALL SELECT 'lsh_6bit',
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk JOIN lk USING (qid, cid))
           |  UNION ALL SELECT 'lsh_multi2',
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk JOIN mk USING (qid, cid))
           |) CROSS JOIN poss ORDER BY method""".stripMargin)),

    Q("q145_keep_one_dedup",
      (s, dir) =>
        // Lee-faithful keep-one ExactSubstr apply: each duplicated gram
        // elects the corpus-min (doc_id, pos) occurrence as canonical;
        // a position is stripped only when no covering gram occurrence
        // is canonical — so the FIRST copy of every duplicated passage
        // survives verbatim (q143 strips all copies). Election is one
        // grouped min per gram key; no cross-doc pairing anywhere.
        ExactSubstrOps.stripDupSpansKeepOne(tp(s, dir, "documents"),
            col("doc_id"), col("text"), l = 8, minOccurrences = 2L)
          .orderBy(col("removed_tokens").desc, col("doc_id"))
          .limit(50),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |nz AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM d
             |  WHERE len(t) >= 8),
             |gpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 8)) AS pos FROM nz),
             |g AS (SELECT doc_id, n, pos,
             |  substr(md5(array_to_string(t[pos + 1 : pos + 8], ' ')), 1, 15) AS gkey
             |  FROM gpos),
             |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
             |dp2 AS (SELECT doc_id, n, pos, gkey FROM g
             |  WHERE gkey IN (SELECT gkey FROM dup)),
             |canon AS (SELECT gkey, doc_id AS cdoc, pos AS cpos FROM (
             |  SELECT gkey, doc_id, pos,
             |    row_number() OVER (PARTITION BY gkey ORDER BY doc_id, pos) AS rn
             |  FROM dp2) WHERE rn = 1),
             |occf AS (SELECT d2.doc_id, d2.n, d2.pos,
             |  CASE WHEN d2.doc_id = c.cdoc AND d2.pos = c.cpos THEN 1 ELSE 0 END AS ic
             |  FROM dp2 d2 JOIN canon c USING (gkey)),
             |pc AS (SELECT doc_id, n, pos + unnest(generate_series(0, 7)) AS p, ic
             |  FROM occf),
             |pcov AS (SELECT doc_id, n, p, max(ic) AS keep FROM pc GROUP BY 1, 2, 3),
             |strip AS (SELECT doc_id, n, p AS pos FROM pcov WHERE keep = 0),
             |allpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 1)) AS pos FROM nz),
             |tokpos AS (SELECT doc_id, n, pos, t[pos + 1] AS tok FROM allpos),
             |kept AS (SELECT k.doc_id, k.n, k.pos, k.tok FROM tokpos k
             |  ANTI JOIN strip s ON k.doc_id = s.doc_id AND k.pos = s.pos),
             |reb AS (SELECT doc_id, n,
             |    CAST(count(*) AS BIGINT) AS kept_tokens,
             |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
             |  FROM kept GROUP BY doc_id, n),
             |aff AS (SELECT DISTINCT doc_id, n FROM strip)
             |SELECT aff.doc_id, aff.n AS n_tokens,
             |  COALESCE(kept_tokens, 0) AS kept_tokens,
             |  CAST(aff.n - COALESCE(kept_tokens, 0) AS BIGINT) AS removed_tokens,
             |  COALESCE(cleaned_text, '') AS cleaned_text
             |FROM aff LEFT JOIN reb ON aff.doc_id = reb.doc_id AND aff.n = reb.n
             |ORDER BY removed_tokens DESC, aff.doc_id LIMIT 50""".stripMargin)),

    Q("q146_preference_pairs",
      (s, dir) => {
        // Preference-pair mining for contrastive/DPO-style training:
        // within each topic cluster (the SAME cached IVF fit the ANN and
        // topic queries share — clusters proxy for "same prompt/topic"),
        // pair the highest-quality document against the lowest-quality
        // one. Deterministic tiebreaks (doc_id) make the extraction
        // reproducible. Plan: assignment is the cached broadcast-argmax
        // projection; the two rankings are per-cluster windows over
        // corpus rows; everything downstream is cluster-count-sized.
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, nlist = 16)
        val asg = model.assigned
          .select(col("cid").as("doc_id"),
            col("centroid_id").cast(IntegerType).as("cluster"))
        val scored = tp(s, dir, "documents")
          .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
          .join(asg, "doc_id")
        val top = Window.partitionBy("cluster")
          .orderBy(col("q").desc, col("doc_id"))
        val bot = Window.partitionBy("cluster")
          .orderBy(col("q").asc, col("doc_id"))
        val ranked = scored
          .withColumn("rt", row_number().over(top))
          .withColumn("rb", row_number().over(bot))
        ranked.filter(col("rt") === 1)
          .select(col("cluster"), col("doc_id").as("chosen_doc"),
            col("q").as("chosen_q"))
          .join(ranked.filter(col("rb") === 1)
            .select(col("cluster"), col("doc_id").as("rejected_doc"),
              col("q").as("rejected_q")), "cluster")
          .filter(col("chosen_doc") =!= col("rejected_doc"))
          .select(col("cluster"), col("chosen_doc"), col("chosen_q"),
            col("rejected_doc"), col("rejected_q"),
            rnd(col("chosen_q") - col("rejected_q"), 6).as("gap"))
          .orderBy("cluster")
      },
      // q41's IVF-fit re-derivation + q31's quality rule + two
      // per-cluster rankings
      Some(raw"""$ivfOracleCtes,
           |tq AS (
           |  SELECT doc_id,
           |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
           |    length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct,
           |    length(text) AS n_len
           |  FROM documents),
           |qual AS (
           |  SELECT doc_id,
           |    floor((least(n_tokens / 64.0, 1.0) * 0.4
           |      + greatest(1.0 - (n_punct / greatest(n_len, 1.0)) * 4.0, 0.0) * 0.3
           |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) / 1000000.0 AS qv
           |  FROM tq),
           |sc2 AS (
           |  SELECT a.kid AS cluster, q2.doc_id, q2.qv
           |  FROM qual q2 JOIN asgF a ON a.cid = q2.doc_id),
           |rk AS (
           |  SELECT cluster, doc_id, qv,
           |    row_number() OVER (PARTITION BY cluster ORDER BY qv DESC, doc_id) AS rt,
           |    row_number() OVER (PARTITION BY cluster ORDER BY qv ASC, doc_id) AS rb
           |  FROM sc2)
           |SELECT c.cluster, c.doc_id AS chosen_doc, c.qv AS chosen_q,
           |  r.doc_id AS rejected_doc, r.qv AS rejected_q,
           |  floor((c.qv - r.qv) * 1000000.0 + 0.5) / 1000000.0 AS gap
           |FROM (SELECT CAST(cluster AS INT) AS cluster, doc_id, qv FROM rk WHERE rt = 1) c
           |JOIN (SELECT CAST(cluster AS INT) AS cluster, doc_id, qv FROM rk WHERE rb = 1) r
           |USING (cluster)
           |WHERE c.doc_id <> r.doc_id
           |ORDER BY cluster""".stripMargin)),

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
        val regs = SketchOps.hllRegistersBy(sh, col("source"), col("sh"), b)
          .withColumnRenamed("g", "source").pin()
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

    Q("q149_cdc_chunking",
      (s, dir) => {
        // Content-defined chunking (FastCDC/rsync idea applied to token
        // streams): a chunk boundary opens wherever the rolling 4-gram's
        // portable hash ≡ 0 (mod 64), so an insertion early in a
        // document only reshapes the chunks it touches — unlike q99's
        // fixed grid, where one inserted token shifts EVERY downstream
        // chunk and defeats chunk-level dedup. Output: per-document
        // chunk profile + corpus chunk-dedup stats (distinct chunk
        // digests vs total — the dedup win CDC exists to enable),
        // top-20 most-chunked docs. Plan: one gram pass (boundary flags
        // are a codegen'd hash+mod), per-document cumsum window for
        // chunk ids, per-chunk ordered fold (doc-sized state), then
        // chunk-count-sized rollups; the corpus stats attach by
        // broadcast cross join.
        val chunks = TextOps.cdcChunks(tp(s, dir, "documents"),
          col("doc_id"), col("text"), w = 4, modulus = 64L).pin()
        val corpus = chunks.agg(
          count(lit(1)).as("total_chunks"),
          countDistinct(col("digest")).as("distinct_chunks"))
          .select(col("total_chunks"), col("distinct_chunks"),
            expr("(10000 * (total_chunks - distinct_chunks)) div total_chunks")
              .as("dup_chunk_fp"))
        chunks.groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            max("chunk_tokens").as("max_chunk_tokens"))
          .crossJoin(broadcast(corpus))
          .orderBy(col("n_chunks").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |nz AS (SELECT doc_id, t, len(t) AS n FROM d WHERE len(t) >= 4),
             |tok AS (SELECT doc_id, n,
             |    unnest(generate_series(0, CAST(n AS INT) - 1)) AS pos, t
             |  FROM nz),
             |tokpos AS (SELECT doc_id, n, pos, t[pos + 1] AS tok FROM tok),
             |gp AS (SELECT doc_id,
             |    unnest(generate_series(1, CAST(n AS INT) - 4)) AS pos, t
             |  FROM nz WHERE n >= 5),
             |bounds AS (
             |  SELECT doc_id, pos, 1 AS bflag FROM (
             |    SELECT doc_id, pos,
             |      (('0x' || substr(md5(array_to_string(t[pos + 1 : pos + 4], ' ')), 1, 15))::BIGINT) AS h
             |    FROM gp) WHERE h % 64 = 0),
             |ch AS (
             |  SELECT k.doc_id, k.pos, k.tok,
             |    sum(COALESCE(b.bflag, 0)) OVER (PARTITION BY k.doc_id
             |      ORDER BY k.pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS chunk_id
             |  FROM tokpos k LEFT JOIN bounds b
             |    ON b.doc_id = k.doc_id AND b.pos = k.pos),
             |chunks AS (
             |  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS chunk_tokens,
             |    md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
             |  FROM ch GROUP BY 1, 2),
             |corpus AS (
             |  SELECT CAST(count(*) AS BIGINT) AS total_chunks,
             |    CAST(count(DISTINCT digest) AS BIGINT) AS distinct_chunks
             |  FROM chunks)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(max(chunk_tokens) AS BIGINT) AS max_chunk_tokens,
             |  total_chunks, distinct_chunks,
             |  CAST((10000 * (total_chunks - distinct_chunks)) // total_chunks AS BIGINT)
             |    AS dup_chunk_fp
             |FROM chunks CROSS JOIN corpus
             |GROUP BY doc_id, total_chunks, distinct_chunks
             |ORDER BY n_chunks DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q150_trigram_backoff_lm",
      (s, dir) => {
        // Held-out n-gram LM perplexity filter (the CCNet recipe:
        // train a language model on a trusted slice, score the rest;
        // high surprisal = gibberish/boilerplate candidates). Model:
        // trigram stupid backoff (Brants et al., Google N-gram) with
        // α = 0.4 kept as the exact rational 2/5 — surprisal is the
        // integer reciprocal of the backoff probability, extending
        // q138's log-free discipline to three orders:
        //   tri hit:  (1e6·n_ab)  div n_abc
        //   bigram:   (5e6·n_b)   div (2·n_bc)       (1/0.4 = 5/2)
        //   unigram:  (25e6·n_tot) div (4·n_c)       (1/0.16 = 25/4)
        //   OOV:      1e12 cap
        // Train = even doc_ids, score = odd doc_ids, so every backoff
        // class is genuinely exercised (a same-corpus model never
        // backs off). Plan shape: ONE trigram pass pre-aggregated per
        // (doc, trigram) and persisted; every model table (tri/head/
        // continuation-bigram/unigram) is a gram-type-sized rollup of
        // the train slice; scoring left-joins the held-out frame on
        // gram keys — the standard LM-scoring shuffle. At 100 TB the
        // model itself is the big side; production variants add a
        // min-count prune on `tri` (drop n_abc = 1) before the join —
        // omitted here so the oracle equivalence stays exact.
        val toks = TextOps.tokens(col("text"))
        val db = tp(s, dir, "documents")
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
          .pin()
        val tri = db.filter(col("doc_id") % 2 === 0)
          .groupBy("t1", "t2", "t3").agg(sum("k").as("n_abc"))
        val h2 = tri.groupBy("t1", "t2").agg(sum("n_abc").as("n_ab"))
        val big = tri.groupBy("t2", "t3").agg(sum("n_abc").as("n_bc"))
        val bh = big.groupBy("t2").agg(sum("n_bc").as("n_b"))
        val uni = tri.groupBy("t3").agg(sum("n_abc").as("n_c"))
        val tot = tri.agg(sum("n_abc").as("n_tot"))
        val sc = db.filter(col("doc_id") % 2 === 1)
          .join(tri, Seq("t1", "t2", "t3"), "left")
          .join(h2, Seq("t1", "t2"), "left")
          .join(big, Seq("t2", "t3"), "left")
          .join(bh, Seq("t2"), "left")
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
          .orderBy(col("avg_surprisal_fp").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |nz AS (SELECT doc_id, t FROM d WHERE len(t) >= 3),
             |tp AS (
             |  SELECT doc_id,
             |    unnest(list_zip(t[1:len(t)-2], t[2:len(t)-1], t[3:len(t)])) AS p
             |  FROM nz),
             |db AS (
             |  SELECT doc_id, p[1] AS t1, p[2] AS t2, p[3] AS t3, count(*) AS k
             |  FROM tp GROUP BY 1, 2, 3, 4),
             |tri AS (
             |  SELECT t1, t2, t3, CAST(sum(k) AS BIGINT) AS n_abc
             |  FROM db WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
             |h2 AS (SELECT t1, t2, CAST(sum(n_abc) AS BIGINT) AS n_ab FROM tri GROUP BY 1, 2),
             |big AS (SELECT t2, t3, CAST(sum(n_abc) AS BIGINT) AS n_bc FROM tri GROUP BY 1, 2),
             |bh AS (SELECT t2, CAST(sum(n_bc) AS BIGINT) AS n_b FROM big GROUP BY 1),
             |uni AS (SELECT t3, CAST(sum(n_abc) AS BIGINT) AS n_c FROM tri GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_abc) AS BIGINT) AS n_tot FROM tri),
             |sc AS (
             |  SELECT db.doc_id, db.k,
             |    CASE
             |      WHEN tri.n_abc IS NOT NULL THEN (1000000 * h2.n_ab) // tri.n_abc
             |      WHEN big.n_bc IS NOT NULL THEN (5000000 * bh.n_b) // (2 * big.n_bc)
             |      WHEN uni.n_c IS NOT NULL THEN (25000000 * n_tot) // (4 * uni.n_c)
             |      ELSE 1000000000000 END AS s,
             |    CASE WHEN tri.n_abc IS NOT NULL THEN 'tri'
             |         WHEN big.n_bc IS NOT NULL THEN 'bi'
             |         WHEN uni.n_c IS NOT NULL THEN 'uni' ELSE 'oov' END AS cls
             |  FROM db
             |  LEFT JOIN tri USING (t1, t2, t3)
             |  LEFT JOIN h2 USING (t1, t2)
             |  LEFT JOIN big USING (t2, t3)
             |  LEFT JOIN bh USING (t2)
             |  LEFT JOIN uni USING (t3)
             |  CROSS JOIN tot
             |  WHERE db.doc_id % 2 = 1)
             |SELECT doc_id,
             |  CAST(sum(k) AS BIGINT) AS n_trigrams,
             |  CAST(sum(CASE WHEN cls = 'tri' THEN k ELSE 0 END) AS BIGINT) AS n_tri_hit,
             |  CAST(sum(CASE WHEN cls = 'bi' THEN k ELSE 0 END) AS BIGINT) AS n_backoff_bi,
             |  CAST(sum(CASE WHEN cls = 'uni' THEN k ELSE 0 END) AS BIGINT) AS n_backoff_uni,
             |  CAST(sum(CASE WHEN cls = 'oov' THEN k ELSE 0 END) AS BIGINT) AS n_oov,
             |  CAST(sum(k * s) // sum(k) AS BIGINT) AS avg_surprisal_fp
             |FROM sc GROUP BY 1
             |ORDER BY avg_surprisal_fp DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q151_hybrid_rrf",
      (s, dir) => {
        // Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.,
        // SIGIR'09): fuse two rankers through ranks alone —
        // rrf = Σ 1/(60 + rank) — so systems with incomparable score
        // scales (lexical BM25 vs tf-idf here; BM25 vs dense cosine in
        // a production stack) combine without calibration. Kept exact:
        // each contribution is the integer 1e9 div (60 + rank), so the
        // fused ranking hash-gates. Plan shape: ONE tokenize pass — the
        // persisted per-(doc,term) tf frame feeds BOTH systems (df/dl/
        // corpus stats are term- or 1-row-sized broadcasts); each
        // system's candidate set is posting-list-bounded, its top-100
        // is TakeOrdered (never a global sort), and the rank window
        // runs over the ≤100-row cut. The fusion itself is a
        // full-outer join of two 100-row frames.
        val qTerms = Seq("join", "hash", "vector", "stream")
        val docs = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        val tf = docs
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z]+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .pin()
        // System A: BM25 (the q130 derivation, unchanged)
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))
        val nD = col("n").cast(DoubleType)
        val dfD = col("df").cast(DoubleType)
        val tfD = col("tf").cast(DoubleType)
        val avgdl = col("sum_dl").cast(DoubleType) / nD
        val idfR = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
        val tfn = (tfD * lit(2.2)) /
          (tfD + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast(DoubleType) / avgdl)))
        val bm25 = tf.filter(col("term").isin(qTerms: _*))
          .join(broadcast(dfreq.filter(col("term").isin(qTerms: _*))), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("c_fp", floor(idfR * tfn * lit(1000000.0)).cast(LongType))
          .groupBy("doc_id").agg(sum("c_fp").as("score_a"))
          .orderBy(col("score_a").desc, col("doc_id")).limit(100)
        // System B: integer tf-idf (the q94 derivation, unchanged)
        val nDocs = docs.agg(count(lit(1)).as("n"))
        val tfidf = tf.filter(col("term").isin(qTerms: _*))
          .join(broadcast(dfreq.filter(col("term").isin(qTerms: _*))), "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("w", col("tf") * expr("(n * 1000000) div df"))
          .groupBy("doc_id").agg(sum("w").as("score_b"))
          .orderBy(col("score_b").desc, col("doc_id")).limit(100)
        val ra = bm25.withColumn("rank_bm25",
          row_number().over(Window.orderBy(col("score_a").desc, col("doc_id")))
            .cast(LongType))
        val rb = tfidf.withColumn("rank_tfidf",
          row_number().over(Window.orderBy(col("score_b").desc, col("doc_id")))
            .cast(LongType))
        ra.join(rb, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("rank_bm25"), col("rank_tfidf"),
            (coalesce(expr("1000000000 div (60 + rank_bm25)"), lit(0L)) +
              coalesce(expr("1000000000 div (60 + rank_tfidf)"), lit(0L)))
              .as("rrf_fp"))
          .orderBy(col("rrf_fp").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
             |  FROM documents),
             |tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl),
             |nd AS (SELECT count(*) AS n FROM documents),
             |bm AS (
             |  SELECT tf.doc_id, CAST(sum(
             |    CAST(floor(
             |      ((CAST(st.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             |      * ((CAST(tf AS DOUBLE) * 2.2) /
             |         (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
             |           (CAST(dl.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(st.n AS DOUBLE))))))
             |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_a
             |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
             |  WHERE term IN ('join', 'hash', 'vector', 'stream')
             |  GROUP BY 1
             |  ORDER BY score_a DESC, doc_id LIMIT 100),
             |ti AS (
             |  SELECT tf.doc_id,
             |    CAST(sum(tf.tf * ((nd.n * 1000000) // dfreq.df)) AS BIGINT) AS score_b
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
             |  WHERE term IN ('join', 'hash', 'vector', 'stream')
             |  GROUP BY 1
             |  ORDER BY score_b DESC, doc_id LIMIT 100),
             |ra AS (
             |  SELECT doc_id, CAST(row_number()
             |    OVER (ORDER BY score_a DESC, doc_id) AS BIGINT) AS rank_bm25
             |  FROM bm),
             |rb AS (
             |  SELECT doc_id, CAST(row_number()
             |    OVER (ORDER BY score_b DESC, doc_id) AS BIGINT) AS rank_tfidf
             |  FROM ti)
             |SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             |  rank_bm25, rank_tfidf,
             |  CAST(COALESCE(1000000000 // (60 + rank_bm25), 0)
             |    + COALESCE(1000000000 // (60 + rank_tfidf), 0) AS BIGINT) AS rrf_fp
             |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
             |ORDER BY rrf_fp DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q152_gopher_rules",
      (s, dir) => {
        // Gopher-style quality rule suite (Rae et al. 2112.11446 Table
        // A1), restated for a token-stream corpus with no line
        // structure: word-count window, mean-word-length window,
        // alpha-word fraction, stop-word floor, and the three
        // REPETITION rules — top-2-gram / top-3-gram character
        // fraction and duplicate-5-gram character cover — that catch
        // templated/looped text. All thresholds are fixed-point
        // integers (×100 for word length, ×10000 for fractions), every
        // fraction one integer division, so the per-source rule
        // scoreboard hash-gates. Definitions: tc = Σ token chars;
        // top-n cover = count·gram_chars of the most frequent n-gram
        // (ties → lexicographically smallest gram); dup-5 cover =
        // Σ count·gram_chars over 5-grams occurring ≥ 2 (overlaps
        // counted, as in the common implementations). Plan shape: one
        // base scan with codegen'd higher-order funcs + three gram
        // explode passes, each pre-aggregated per (doc, gram) map-side;
        // the top-gram windows are per-doc partitions; the final
        // scoreboard is a source-sized rollup.
        val toks = TextOps.tokens(col("text"))
        val stops = Seq("the", "a", "of", "and", "to", "in", "is", "that")
        val base = tp(s, dir, "documents")
          .filter(size(toks) >= 1)
          .select(col("doc_id"), col("source"), toks.as("t"),
            TextOps.wordSetHits(col("text"), stops).cast(LongType)
              .as("stop_hits"))
          .withColumn("nw", size(col("t")).cast(LongType))
          .withColumn("tc",
            expr("aggregate(transform(t, x -> length(x)), 0L, (a, x) -> a + x)"))
          .withColumn("n_alpha",
            size(expr("filter(t, x -> x rlike '[A-Za-z]')")).cast(LongType))
          .pin()
        def grams(n: Int): DataFrame = {
          val parts = (1 to n).map(i =>
            slice(col("t"), lit(i), size(col("t")) - (n - 1)))
          val fields = (0 until n).map(i => col("p").getField(i.toString))
          base.filter(size(col("t")) >= n)
            .select(col("doc_id"), explode(arrays_zip(parts: _*)).as("p"))
            .select(col("doc_id"),
              concat_ws(" ", fields: _*).as("g"),
              fields.map(length(_).cast(LongType)).reduce(_ + _).as("gchars"))
            .groupBy("doc_id", "g", "gchars").agg(count(lit(1)).as("c"))
        }
        def topCover(n: Int, out: String): DataFrame = {
          val w = Window.partitionBy("doc_id")
            .orderBy(col("c").desc, col("g"))
          grams(n).withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("doc_id"), (col("c") * col("gchars")).as(out))
        }
        val t2 = topCover(2, "cover2")
        val t3 = topCover(3, "cover3")
        val d5 = grams(5).filter(col("c") >= 2)
          .groupBy("doc_id").agg(sum(col("c") * col("gchars")).as("cover5"))
        val m = base
          .join(t2, Seq("doc_id"), "left")
          .join(t3, Seq("doc_id"), "left")
          .join(d5, Seq("doc_id"), "left")
          .select(col("source"),
            when(col("nw").between(50, 100000), 0L).otherwise(1L).as("x_words"),
            when(expr("(100 * tc) div nw").between(300, 1000), 0L)
              .otherwise(1L).as("x_wordlen"),
            when(expr("(10000 * n_alpha) div nw") > 8000, 0L)
              .otherwise(1L).as("x_alpha"),
            when(col("stop_hits") >= 2, 0L).otherwise(1L).as("x_stop"),
            when(coalesce(expr("(10000 * cover2) div tc"), lit(0L)) <= 2000, 0L)
              .otherwise(1L).as("x_top2"),
            when(coalesce(expr("(10000 * cover3) div tc"), lit(0L)) <= 1800, 0L)
              .otherwise(1L).as("x_top3"),
            when(coalesce(expr("(10000 * cover5) div tc"), lit(0L)) <= 1500, 0L)
              .otherwise(1L).as("x_dup5"))
        m.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("x_words") + col("x_wordlen") + col("x_alpha") +
              col("x_stop") + col("x_top2") + col("x_top3") + col("x_dup5")
              === 0, 1L).otherwise(0L)).as("n_pass"),
            sum("x_words").as("f_words"),
            sum("x_wordlen").as("f_wordlen"),
            sum("x_alpha").as("f_alpha"),
            sum("x_stop").as("f_stop"),
            sum("x_top2").as("f_top2"),
            sum("x_top3").as("f_top3"),
            sum("x_dup5").as("f_dup5"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, text,
             |    string_split_regex(trim(text), '\s+') AS t FROM documents),
             |b AS (
             |  SELECT doc_id, source, len(t) AS nw,
             |    list_sum(list_transform(t, x -> length(x))) AS tc,
             |    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b'))
             |      AS stop_hits,
             |    t
             |  FROM d WHERE len(t) >= 1),
             |g2 AS (
             |  SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM b),
             |c2 AS (
             |  SELECT doc_id, p[1] || ' ' || p[2] AS g,
             |    length(p[1]) + length(p[2]) AS gchars, count(*) AS c
             |  FROM g2 GROUP BY 1, 2, 3),
             |t2 AS (
             |  SELECT doc_id, c * gchars AS cover2 FROM c2
             |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
             |g3 AS (
             |  SELECT doc_id,
             |    unnest(list_zip(t[1:len(t)-2], t[2:len(t)-1], t[3:len(t)])) AS p
             |  FROM b WHERE len(t) >= 3),
             |c3 AS (
             |  SELECT doc_id, p[1] || ' ' || p[2] || ' ' || p[3] AS g,
             |    length(p[1]) + length(p[2]) + length(p[3]) AS gchars, count(*) AS c
             |  FROM g3 GROUP BY 1, 2, 3),
             |t3 AS (
             |  SELECT doc_id, c * gchars AS cover3 FROM c3
             |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
             |g5 AS (
             |  SELECT doc_id, unnest(list_zip(t[1:len(t)-4], t[2:len(t)-3],
             |    t[3:len(t)-2], t[4:len(t)-1], t[5:len(t)])) AS p
             |  FROM b WHERE len(t) >= 5),
             |c5 AS (
             |  SELECT doc_id,
             |    p[1] || ' ' || p[2] || ' ' || p[3] || ' ' || p[4] || ' ' || p[5] AS g,
             |    length(p[1]) + length(p[2]) + length(p[3]) + length(p[4])
             |      + length(p[5]) AS gchars,
             |    count(*) AS c
             |  FROM g5 GROUP BY 1, 2, 3),
             |d5 AS (
             |  SELECT doc_id, CAST(sum(c * gchars) AS BIGINT) AS cover5
             |  FROM c5 WHERE c >= 2 GROUP BY 1),
             |m AS (
             |  SELECT b.source,
             |    CASE WHEN b.nw BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS x_words,
             |    CASE WHEN (100 * b.tc) // b.nw BETWEEN 300 AND 1000 THEN 0 ELSE 1 END
             |      AS x_wordlen,
             |    CASE WHEN (10000 * b.n_alpha) // b.nw > 8000 THEN 0 ELSE 1 END
             |      AS x_alpha,
             |    CASE WHEN b.stop_hits >= 2 THEN 0 ELSE 1 END AS x_stop,
             |    CASE WHEN COALESCE((10000 * t2.cover2) // b.tc, 0) <= 2000
             |      THEN 0 ELSE 1 END AS x_top2,
             |    CASE WHEN COALESCE((10000 * t3.cover3) // b.tc, 0) <= 1800
             |      THEN 0 ELSE 1 END AS x_top3,
             |    CASE WHEN COALESCE((10000 * d5.cover5) // b.tc, 0) <= 1500
             |      THEN 0 ELSE 1 END AS x_dup5
             |  FROM b
             |  LEFT JOIN t2 ON t2.doc_id = b.doc_id
             |  LEFT JOIN t3 ON t3.doc_id = b.doc_id
             |  LEFT JOIN d5 ON d5.doc_id = b.doc_id)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN x_words + x_wordlen + x_alpha + x_stop
             |    + x_top2 + x_top3 + x_dup5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_pass,
             |  CAST(sum(x_words) AS BIGINT) AS f_words,
             |  CAST(sum(x_wordlen) AS BIGINT) AS f_wordlen,
             |  CAST(sum(x_alpha) AS BIGINT) AS f_alpha,
             |  CAST(sum(x_stop) AS BIGINT) AS f_stop,
             |  CAST(sum(x_top2) AS BIGINT) AS f_top2,
             |  CAST(sum(x_top3) AS BIGINT) AS f_top3,
             |  CAST(sum(x_dup5) AS BIGINT) AS f_dup5
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q153_label_propagation",
      (s, dir) => {
        // Community detection on the bipartite customer↔supplier
        // purchase graph (the q89/q90 graph) via deterministic
        // synchronous label propagation — the third member of the graph
        // family (PageRank = centrality, BFS = reachability, LPA =
        // community structure). 4 fixed rounds; the self-vote damps
        // bipartite oscillation; ties go to the smallest label, so the
        // full per-node community vector hash-gates against the
        // unrolled oracle. Output attaches each node's final community
        // size (community-count-sized rollup joined back).
        // pinned: the community frame feeds BOTH the size rollup and the
        // join-back — unpinned, the whole 4-round propagation chain
        // executed twice (measured at sf0.1: cold single-shot ~20 s →
        // ~11.6 s with the pin; warm repeats 9.2 s → 1.4 s)
        val lp = GraphOps.labelPropagation(purchaseGraph(s, dir), iters = 4).pin()
        val sizes = lp.groupBy("community").agg(count(lit(1)).as("n_members"))
        lp.join(sizes, "community")
          .select(col("id").as("node_id"), col("community"), col("n_members"))
          .orderBy("node_id")
      },
      Some(lpaOracleSql(4))),

    Q("q154_pca_power_iteration",
      (s, dir) => {
        // Top principal direction of the embedding corpus, computed
        // IN-ENGINE with exact integer arithmetic end to end — the
        // whitening/drift diagnostic an embedding-dedup pipeline wants
        // before trusting cosine thresholds. Recipe: (1) globally
        // int8-quantize (one corpus abs-max, broadcast — geometry
        // preserved up to one uniform scale, unlike q61's per-vector
        // scales); (2) ONE corpus pass accumulates the exact Gram
        // matrix Σ qqᵀ and column sums Σ q as longs via a nested
        // transform (d² products per row, map-side combined — no join;
        // the 100 TB shape for d beyond ~128 is a per-partition
        // d×d accumulator, same math); (3) integer-centered covariance
        // C = G − (s·sᵀ) div n (truncation ≤ 1 per entry, symmetric,
        // exactly mirrored by the oracle); (4) six power-iteration
        // rounds, each a d²-row matvec against the broadcast d-row
        // vector, renormalized to ~1e6 by integer division — model-
        // sized work, corpus never touched again; (5) deterministic
        // sign fix (max-|component| positive). Overflow envelope:
        // |C| ≤ n·127², matvec ≤ d·|C|·2e6 → safe to n ≈ 4e6 vectors
        // at d = 64; beyond that, pre-scale C by (n div K) once.
        // λ_est is the dominant-eigenvalue estimate in C-units
        // (max|Cv| div max|v|).
        val (_, v, lambdaEst) = pcaFit(s, dir)
        import s.implicits._
        v.zipWithIndex
          .map { case (x, i) => (i.toLong, x, lambdaEst) }.toSeq
          .toDF("dim", "v_fp", "lambda_est")
          .orderBy("dim")
      },
      Some(pcaOracleSql(6))),

    Q("q155_span_decontamination",
      (s, dir) => {
        // Span-level decontamination audit: which train documents
        // contain verbatim ≥8-token passages from the benchmark slice
        // (sources src0–src3 stand in for the eval suite)? Doc-level
        // decontamination (q53) drops whole documents on any 13-gram
        // hit; this measures WHERE and HOW MUCH — per-doc maximal
        // contaminated spans and token fraction, the evidence you want
        // before choosing drop-vs-excise. Plan shape in ExactSubstrOps:
        // benchmark keys are one distinct on 8-byte gram keys, the scan
        // is a LEFT SEMI join, islands merge per-doc — never all-pairs.
        ExactSubstrOps.crossContamination(tp(s, dir, "documents"),
            col("doc_id"), col("text"),
            col("source").isin("src0", "src1", "src2", "src3"), l = 8)
          .orderBy(col("contamination_fp").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source IN ('src0','src1','src2','src3') AS is_bench,
             |    string_split_regex(trim(text), '\s+') AS t FROM documents),
             |nz AS (SELECT doc_id, is_bench, t, CAST(len(t) AS BIGINT) AS n
             |  FROM d WHERE len(t) >= 8),
             |gpos AS (SELECT doc_id, is_bench, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 8)) AS pos FROM nz),
             |g AS (SELECT doc_id, is_bench, n, pos,
             |  substr(md5(array_to_string(t[pos + 1 : pos + 8], ' ')), 1, 15) AS gkey
             |  FROM gpos),
             |bk AS (SELECT DISTINCT gkey FROM g WHERE is_bench),
             |dp AS (SELECT doc_id, n, pos FROM g
             |  WHERE NOT is_bench AND gkey IN (SELECT gkey FROM bk)),
             |m AS (SELECT doc_id, n, pos,
             |  max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             |  FROM dp),
             |mk AS (SELECT doc_id, n, pos,
             |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS ns
             |  FROM m),
             |sp AS (SELECT doc_id, n, pos,
             |  sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
             |  FROM mk),
             |spans AS (SELECT doc_id, n, span_id, min(pos) AS st, max(pos) + 7 AS en
             |  FROM sp GROUP BY 1, 2, 3),
             |outp AS (SELECT doc_id, count(*) AS n_spans,
             |  sum(en - st + 1) AS contam_tokens, n AS n_tokens
             |  FROM spans GROUP BY doc_id, n)
             |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
             |  CAST(contam_tokens AS BIGINT) AS contam_tokens, n_tokens,
             |  CAST((10000 * contam_tokens) // n_tokens AS BIGINT)
             |    AS contamination_fp
             |FROM outp ORDER BY contamination_fp DESC, doc_id LIMIT 20""".stripMargin)),

    Q("q156_blocking_quality",
      (s, dir) => {
        // Blocking-quality evaluation for the q88 fuzzy-join: reduction
        // ratio (pairs pruned before the levenshtein verify) and pair
        // completeness (true matches surviving the blocking) — the two
        // standard record-linkage blocking metrics (Christen, TKDE'12).
        // Ground truth is the NAIVE quadratic join over a deterministic
        // 5% name sample — exactly how you'd calibrate blocking on
        // 100 TB: brute-force a bounded sample, then trust the measured
        // completeness for the full run (here it is provably 10000 —
        // the gram-count bound is lossless — and the eval DEMONSTRATES
        // it rather than assuming it). All counts are 1-row broadcast
        // frames; only the sampled quadratic join is ever materialized.
        val names = t(s, dir, "part")
          .filter(col("p_partkey") % 20 === 0)
          .select(col("p_name")).distinct()
        val clean = names.select(col("p_name").as("id"), col("p_name").as("s"))
        val dirty = names.select(col("p_name").as("id"),
          concat(substring(col("p_name"), 1, 1),
            expr("substring(p_name, 3)")).as("s"))
        val cand = FuzzyJoinOps.candidatePairs(dirty, clean, maxDist = 2, q = 3)
          .pin()
        val found = cand
          .filter(levenshtein(col("l_s"), col("r_s")) <= 2)
        val truth = dirty.select(col("s").as("ds"))
          .crossJoin(clean.select(col("s").as("cs")))
          .filter(levenshtein(col("ds"), col("cs")) <= 2)
        dirty.agg(count(lit(1)).as("n_left"))
          .crossJoin(broadcast(clean.agg(count(lit(1)).as("n_right"))))
          .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
          .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
          .select(col("n_left"), col("n_right"), col("n_candidates"),
            col("n_true"), col("n_found"),
            expr("(10000 * (n_left * n_right - n_candidates)) div (n_left * n_right)")
              .as("reduction_fp"),
            expr("(10000 * n_found) div n_true").as("completeness_fp"))
      },
      Some("""WITH names AS (
             |  SELECT DISTINCT p_name FROM part WHERE p_partkey % 20 = 0),
             |cl AS (SELECT p_name AS id, p_name AS s FROM names),
             |dt AS (SELECT p_name AS id,
             |  substring(p_name, 1, 1) || substring(p_name, 3) AS s FROM names),
             |lg0 AS (SELECT id, s,
             |  list_distinct(list_transform(generate_series(1, greatest(length(s) - 2, 0)),
             |    i -> substring(s, i, 3))) AS g FROM dt),
             |rg0 AS (SELECT id, s,
             |  list_distinct(list_transform(generate_series(1, greatest(length(s) - 2, 0)),
             |    i -> substring(s, i, 3))) AS g FROM cl),
             |lg AS (SELECT id AS l_id, unnest(g) AS gr FROM lg0),
             |rg AS (SELECT id AS r_id, unnest(g) AS gr FROM rg0),
             |sh AS (SELECT l_id, r_id, count(*) AS shared
             |  FROM lg JOIN rg USING (gr) GROUP BY 1, 2),
             |cand AS (
             |  SELECT sh.l_id, sh.r_id, lg0.s AS l_s, rg0.s AS r_s
             |  FROM sh JOIN lg0 ON lg0.id = sh.l_id JOIN rg0 ON rg0.id = sh.r_id
             |  WHERE abs(length(lg0.s) - length(rg0.s)) <= 2
             |    AND sh.shared >= greatest(len(lg0.g), len(rg0.g)) - 6),
             |found AS (SELECT l_id FROM cand WHERE levenshtein(l_s, r_s) <= 2),
             |troo AS (SELECT dt.id FROM dt CROSS JOIN cl
             |  WHERE levenshtein(dt.s, cl.s) <= 2),
             |st AS (
             |  SELECT (SELECT count(*) FROM dt) AS n_left,
             |    (SELECT count(*) FROM cl) AS n_right,
             |    (SELECT count(*) FROM cand) AS n_candidates,
             |    (SELECT count(*) FROM troo) AS n_true,
             |    (SELECT count(*) FROM found) AS n_found)
             |SELECT CAST(n_left AS BIGINT) AS n_left,
             |  CAST(n_right AS BIGINT) AS n_right,
             |  CAST(n_candidates AS BIGINT) AS n_candidates,
             |  CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_found AS BIGINT) AS n_found,
             |  CAST((10000 * (n_left * n_right - n_candidates))
             |    // (n_left * n_right) AS BIGINT) AS reduction_fp,
             |  CAST((10000 * n_found) // n_true AS BIGINT) AS completeness_fp
             |FROM st""".stripMargin)),

    Q("q157_context_length_planning",
      (s, dir) => {
        // Context-length planning: for candidate sequence lengths
        // (128 / 512 / 2048), what does chunking the corpus into
        // fixed-length training sequences cost in padding? Per doc:
        // ceil(n/L) sequences, padding = ceil(n/L)·L − n; the waste
        // fraction per L is the number a pretraining-data owner reads
        // before picking the packing strategy (q54) or the context
        // size. One token-count scan (codegen'd, no explode) fanned
        // ×3 by a literal array — corpus is read once.
        val n = size(TextOps.tokens(col("text"))).cast(LongType)
        tp(s, dir, "documents")
          .select(n.as("n"),
            explode(array(lit(128L), lit(512L), lit(2048L))).as("max_len"))
          .withColumn("chunks", expr("(n + max_len - 1) div max_len"))
          .groupBy("max_len")
          .agg(count(lit(1)).as("n_docs"),
            sum("n").as("total_tokens"),
            sum("chunks").as("n_seqs"),
            sum(col("chunks") * col("max_len")).as("padded_tokens"))
          .select(col("max_len"), col("n_docs"), col("total_tokens"),
            col("n_seqs"), col("padded_tokens"),
            expr("(10000 * (padded_tokens - total_tokens)) div padded_tokens")
              .as("waste_fp"))
          .orderBy("max_len")
      },
      Some("""WITH d AS (
             |  SELECT len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents),
             |f AS (
             |  SELECT n, max_len, (n + max_len - 1) // max_len AS chunks
             |  FROM d CROSS JOIN
             |    (SELECT unnest([128, 512, 2048]) AS max_len) ml)
             |SELECT max_len, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n) AS BIGINT) AS total_tokens,
             |  CAST(sum(chunks) AS BIGINT) AS n_seqs,
             |  CAST(sum(chunks * max_len) AS BIGINT) AS padded_tokens,
             |  CAST((10000 * (sum(chunks * max_len) - sum(n)))
             |    // sum(chunks * max_len) AS BIGINT) AS waste_fp
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q158_minhash_calibration",
      (s, dir) => {
        // MinHash estimator calibration: for every LSH candidate pair,
        // the signature-agreement Jaccard estimate (k matching rows /
        // 32) next to the EXACT 3-gram Jaccard and the absolute error —
        // the measurement that tells you whether 32 hashes and an 0.5
        // threshold are adequate before keying a 100 TB dedup on them
        // (q144 is the same discipline for the ANN indexes). Candidate
        // generation and signatures are the production q35 path
        // (portable hash family); the exact side reuses the persisted
        // per-doc shingle sets — the verify join is candidate-sized,
        // never all-pairs.
        val docs = tp(s, dir, "documents")
        val sd = docs
          .select(col("doc_id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
          .pin()
        DedupOps.minhashCandidatePairs(docs, col("doc_id"), col("text"))
          .join(sd.select(col("doc_id").as("id_a"), col("sd").as("sd_a")), "id_a")
          .join(sd.select(col("doc_id").as("id_b"), col("sd").as("sd_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            r4(col("est_jaccard")).as("est_jaccard"),
            r4(DedupOps.jaccardFromShingleSets(col("sd_a"), col("sd_b")))
              .as("exact_jaccard"),
            r4(abs(col("est_jaccard") -
              DedupOps.jaccardFromShingleSets(col("sd_a"), col("sd_b"))))
              .as("abs_err"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |sd AS (SELECT doc_id, list_distinct(sh) AS sd FROM s),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             |    len(list_filter(generate_series(1, 32), i -> a.sig[i] = c.sig[i])) / 32.0 AS est
             |  FROM bk a JOIN bk c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |j AS (
             |  SELECT p.id_a, p.id_b, p.est,
             |    CASE WHEN (len(sa.sd) + len(sb.sd) - len(list_intersect(sa.sd, sb.sd))) > 0
             |      THEN CAST(len(list_intersect(sa.sd, sb.sd)) AS DOUBLE)
             |        / (len(sa.sd) + len(sb.sd) - len(list_intersect(sa.sd, sb.sd)))
             |      ELSE 0.0 END AS ex
             |  FROM p JOIN sd sa ON sa.doc_id = p.id_a JOIN sd sb ON sb.doc_id = p.id_b)
             |SELECT id_a, id_b,
             |  floor(est * 10000.0 + 0.5) / 10000.0 AS est_jaccard,
             |  floor(ex * 10000.0 + 0.5) / 10000.0 AS exact_jaccard,
             |  floor(abs(est - ex) * 10000.0 + 0.5) / 10000.0 AS abs_err
             |FROM j ORDER BY id_a, id_b""".stripMargin)),

    Q("q159_bpe_fertility",
      (s, dir) => {
        // Tokenizer fertility by domain: pieces-per-word and
        // chars-per-piece per source under the q76-induced BPE merges —
        // the tokenizer-efficiency report a mixed-domain corpus owner
        // reads before committing a vocabulary (a domain with high
        // fertility pays proportionally more sequence length per word).
        // Shares the ONE cached induction with q76/q82 (same cacheKey);
        // the fertility side is a word-TYPE-sized map join onto
        // per-(source, word) counts — corpus-sized work is the single
        // token count pass, the vocabulary map broadcasts.
        val docs = tp(s, dir, "documents")
        val wp = BpeOps.bpeWordPieces(docs, col("text"), rounds = 4,
          cacheKey = Some(s"documents:$dir"))
        docs.select(col("source"),
            explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("k"))
          .join(broadcast(wp.select(col("w"), col("pieces"))), "w")
          .groupBy("source")
          .agg(sum("k").as("n_word_tokens"),
            sum(col("k") * col("pieces")).as("n_pieces"),
            sum(col("k") * length(col("w"))).as("chars"))
          .select(col("source"), col("n_word_tokens"), col("n_pieces"),
            expr("(10000 * n_pieces) div n_word_tokens").as("fertility_fp"),
            expr("(100 * chars) div n_pieces").as("chars_per_piece_fp"))
          .orderBy("source")
      },
      Some(BpeOps.fertilityOracleSql(4))),

    Q("q160_classifier_calibration",
      (s, dir) => {
        // Reliability diagram for the q140 quality classifier: predicted
        // probability binned into deciles, each bin's empirical positive
        // rate next to its mean prediction — the calibration evidence a
        // filter-by-threshold deployment needs (a miscalibrated scorer
        // silently shifts the effective quality cut). Shares q140's
        // standardized frame (one CacheManager entry) and re-runs the
        // same 6-aggregation fit; the diagram itself is a
        // decile-sized rollup. Kept exact: mean_p is the integer mean
        // of per-row floor(p·1e6) — long sums, no float-summation-order
        // sensitivity anywhere in the output.
        val zCols = Seq("z1", "z2", "z3", "z4")
        val f = qualityLrFrame(s, dir)
        val w = ClassifierOps.fitHardSigmoidLR(f, zCols, "y", iters = 6,
          lr = 2.0)
        f.select(col("y"), ClassifierOps.score(w.toSeq, zCols).as("p"))
          .select(col("y"), col("p"),
            least(lit(9L), floor(col("p") * 10).cast(LongType)).as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
            sum(floor(col("p") * 1000000).cast(LongType)).as("p_fp_sum"))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("p_fp_sum div n").as("mean_p_fp"),
            expr("(10000 * n_pos) div n").as("pos_rate_fp"))
          .orderBy("bin")
      },
      Some {
        qualityLrOracleCtes +
          """
            |SELECT least(9, CAST(floor(p * 10) AS BIGINT)) AS bin,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            |  CAST(sum(CAST(floor(p * 1000000) AS BIGINT)) // count(*) AS BIGINT)
            |    AS mean_p_fp,
            |  CAST((10000 * sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)) // count(*)
            |    AS BIGINT) AS pos_rate_fp
            |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    Q("q161_source_drift",
      (s, dir) => {
        // Per-source unigram drift: total-variation distance between
        // each source's token distribution and the corpus-wide one,
        // plus vocabulary coverage — the distribution-shift monitor a
        // mixture owner reads before re-weighting (a source whose TV
        // jumps between snapshots changed character, not just size).
        // Exactness discipline: each term's |p_s − p| is floored at
        // 1e-12 fixed point and summed as LONGS — identical IEEE ops
        // per term in both engines, and long summation is
        // order-independent, so no float-summation-order sensitivity
        // anywhere. The (vocab × sources) grid is the honest cost of
        // the absent-term mass (floor is per-term, so the closed-form
        // absent-mass shortcut doesn't apply); S is small, so the
        // grid is V·S rows — the same class as q135's source pairs.
        // Envelope: Σ contrib ≤ V·1e12 — safe to V ≈ 9e6 terms per
        // source; beyond that drop the contribution scale one decade.
        val k = tp(s, dir, "documents")
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("k"))
          .pin()
        val ns = k.groupBy("source").agg(sum("k").as("n_s"))
        val c = k.groupBy("w").agg(sum("k").as("c"))
        val tot = c.agg(sum("c").as("n_tot"), count(lit(1)).as("v"))
        val contrib = floor(abs(
          coalesce(col("k"), lit(0L)).cast(DoubleType) / col("n_s").cast(DoubleType)
            - col("c").cast(DoubleType) / col("n_tot").cast(DoubleType))
          * 1000000000000.0).cast(LongType)
        c.crossJoin(broadcast(ns))
          .join(k, Seq("source", "w"), "left")
          .crossJoin(broadcast(tot))
          .select(col("source"), col("n_s"), col("v"),
            contrib.as("contrib"),
            when(col("k").isNotNull, 1L).otherwise(0L).as("hit"))
          .groupBy("source")
          .agg(max("n_s").as("n_tokens"),
            sum("hit").as("n_terms"),
            max("v").as("v"),
            sum("contrib").as("tvs"))
          .select(col("source"), col("n_tokens"), col("n_terms"),
            expr("(10000 * n_terms) div v").as("vocab_coverage_fp"),
            expr("tvs div 200000000").as("tv_fp"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
             |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
             |  FROM documents),
             |k AS (SELECT source, w, CAST(count(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2),
             |ns AS (SELECT source, CAST(sum(k) AS BIGINT) AS n_s FROM k GROUP BY 1),
             |c AS (SELECT w, CAST(sum(k) AS BIGINT) AS c FROM k GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot, CAST(count(*) AS BIGINT) AS v FROM c),
             |g AS (
             |  SELECT ns.source, ns.n_s, c.c, k.k
             |  FROM c CROSS JOIN ns
             |  LEFT JOIN k ON k.source = ns.source AND k.w = c.w),
             |con AS (
             |  SELECT source, n_s, v,
             |    CAST(floor(abs(CAST(COALESCE(k, 0) AS DOUBLE) / CAST(n_s AS DOUBLE)
             |      - CAST(c AS DOUBLE) / CAST(n_tot AS DOUBLE)) * 1000000000000.0) AS BIGINT) AS contrib,
             |    CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END AS hit
             |  FROM g CROSS JOIN tot)
             |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
             |  CAST(sum(hit) AS BIGINT) AS n_terms,
             |  CAST((10000 * sum(hit)) // max(v) AS BIGINT) AS vocab_coverage_fp,
             |  CAST(sum(contrib) // 200000000 AS BIGINT) AS tv_fp
             |FROM con GROUP BY source ORDER BY source""".stripMargin)),

    Q("q162_temperature_mixture",
      (s, dir) => {
        // Temperature-scaled sampling weights (Arivazhagan et al.,
        // arXiv:1907.05019 §5): per-source weight ∝ N_s^α with α = 1/2,
        // the standard flattening between proportional (α=1) and
        // uniform (α=0) used to keep small domains from vanishing in a
        // mixed corpus. The risk the report surfaces is epochs_fp: how
        // many times a small source would be repeated under a 30%
        // token budget (over-repetition is the known failure of low
        // temperature). Exactness: sqrt is IEEE correctly-rounded in
        // both engines, immediately floored to 1e6 fixed point; all
        // ratios are integer divisions of long sums, so the whole
        // report is engine-portable. One token-count scan; everything
        // after is source-cardinality sized.
        val ns = tp(s, dir, "documents")
          .groupBy("source")
          .agg(sum(TextOps.tokenCount(col("text")).cast(LongType)).as("n_tokens"))
          .withColumn("sq_fp",
            floor(sqrt(col("n_tokens").cast(DoubleType)) * 1000000.0).cast(LongType))
        val tot = ns.agg(sum("sq_fp").as("denom"), sum("n_tokens").as("n_total"))
        ns.crossJoin(broadcast(tot))
          .withColumn("weight_fp", expr("(1000000 * sq_fp) div denom"))
          .withColumn("quota_tokens",
            expr("(((3 * n_total) div 10) * weight_fp) div 1000000"))
          .select(col("source"), col("n_tokens"), col("weight_fp"),
            col("quota_tokens"),
            expr("(10000 * quota_tokens) div n_tokens").as("epochs_fp"))
          .orderBy("source")
      },
      Some("""WITH ns AS (
             |  SELECT source,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1),
             |sq AS (
             |  SELECT source, n_tokens,
             |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq_fp
             |  FROM ns),
             |tot AS (
             |  SELECT CAST(sum(sq_fp) AS BIGINT) AS denom,
             |    CAST(sum(n_tokens) AS BIGINT) AS n_total FROM sq),
             |w AS (
             |  SELECT source, n_tokens,
             |    CAST((1000000 * sq_fp) // denom AS BIGINT) AS weight_fp,
             |    CAST((((3 * n_total) // 10) * ((1000000 * sq_fp) // denom)) // 1000000 AS BIGINT) AS quota_tokens
             |  FROM sq CROSS JOIN tot)
             |SELECT source, n_tokens, weight_fp, quota_tokens,
             |  CAST((10000 * quota_tokens) // n_tokens AS BIGINT) AS epochs_fp
             |FROM w ORDER BY source""".stripMargin)),

    Q("q163_ipf_raking",
      (s, dir) => {
        // Iterative proportional fitting (Deming–Stephan raking) of the
        // source × lang cell matrix to target marginals: uniform over
        // sources (the rebalancing goal), observed over languages (the
        // constraint to preserve) — the standard way to derive per-cell
        // sampling weights that hit BOTH marginals at once, which
        // independent per-axis reweighting cannot. Three rounds of
        // row-scale/column-scale in 1e9 fixed point, truncating integer
        // division throughout (Scala Long '/', Spark div and DuckDB //
        // agree — truncation toward zero, verified on negatives), so
        // DuckDB re-derives the identical matrix through 6 unrolled
        // scaling CTEs. Structural zeros (absent cells) stay absent —
        // classic IPF. The corpus-sized work is ONE count pass; the
        // iteration runs on the DRIVER over the collected S×L cell
        // matrix (model-sized state, the q154 precedent — an in-plan
        // loop would re-execute the scaling chain per round). Envelope:
        // m ≤ 1e9 and targets ≤ 1e9 keep every product ≤ 1e18 <
        // Long.Max; cell counts ≤ 9.2e9 docs before (n·1e9)
        // overflows — beyond that, pre-aggregate. (Fit shared with the
        // apply query q169 via [[ipfRakedCells]].)
        import s.implicits._
        ipfRakedCells(s, dir)
          .toDF("source", "lang", "n_docs", "obs_fp", "raked_fp", "weight_fp")
          .orderBy("source", "lang")
      },
      Some(s"""$ipfOracleCtes
           |SELECT f.source, f.lang, f.n AS n_docs,
           |  CAST((f.n * 1000000000) // t AS BIGINT) AS obs_fp,
           |  f.m AS raked_fp,
           |  CAST((f.m * 1000000) // ((f.n * 1000000000) // t) AS BIGINT) AS weight_fp
           |FROM r3b f CROSS JOIN tot
           |ORDER BY f.source, f.lang""".stripMargin)),

    Q("q164_cluster_quality",
      (s, dir) => {
        // Cluster-quality report over the SHARED cached IVF fit (the
        // same index q41/q70/q129/q134/q146 serve): per cluster, size,
        // mean and worst member-to-centroid cosine (cohesion), and the
        // similarity to the nearest OTHER centroid (separation) — the
        // diagnostic that says whether nlist is sized right before
        // trusting semantic-dedup thresholds or topic labels. Exactness
        // discipline: members and centroids are floored to fixed point
        // (1e7 / 1e6), so every dot and norm² is an exact long and the
        // per-row cosine is ONE identical IEEE sequence in both engines
        // before its 1e6 floor — long sums make cohesion
        // order-independent. Member work is one ×d explode joined to
        // the broadcast (nlist·d)-row centroid frame; centroid-pair
        // separation runs on the DRIVER over model-sized state.
        val corpus = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, 16)
        val cfp: Array[Array[Long]] = model.centroids
          .map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
        val cn2: Array[Long] = cfp.map(r => r.map(x => x * x).sum)
        def simFp(a: Int, b: Int): Long = {
          val d = cfp(a).indices.map(i => cfp(a)(i) * cfp(b)(i)).sum
          if (cn2(a) > 0 && cn2(b) > 0)
            math.floor(d.toDouble /
              (math.sqrt(cn2(a).toDouble) * math.sqrt(cn2(b).toDouble))
              * 1000000.0).toLong
          else 0L
        }
        import s.implicits._
        val nn = cfp.indices
          .map(k => (k, cfp.indices.filter(_ != k).map(j => simFp(k, j)).max))
          .toDF("cluster_id", "nn_sim_fp")
        val centFrame = cfp.zipWithIndex.flatMap { case (r, k) =>
          r.zipWithIndex.map { case (v, i) => (k, i + 1, v) }
        }.toSeq.toDF("kid", "pos", "cfp")
        val cn2Frame = cn2.zipWithIndex.map { case (v, k) => (k, v) }
          .toSeq.toDF("kid", "cn2")
        val cosFp = when(col("sx2") > 0 && col("cn2") > 0,
          floor(col("dotn").cast(DoubleType) /
            (sqrt(col("sx2").cast(DoubleType)) * sqrt(col("cn2").cast(DoubleType)))
            * 1000000.0).cast(LongType)).otherwise(0L)
        model.assigned
          .select(col("cid"), col("centroid_id").as("kid"),
            posexplode(expr(
              "transform(cvec, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT))"))
              .as(Seq("pos0", "xfp")))
          .withColumn("pos", col("pos0") + 1)
          .join(broadcast(centFrame), Seq("kid", "pos"))
          .groupBy("cid", "kid")
          .agg(sum(col("xfp") * col("xfp")).as("sx2"),
            sum(col("xfp") * col("cfp")).as("dotn"))
          .join(broadcast(cn2Frame), "kid")
          .select(col("kid"), cosFp.as("cos_fp"))
          .groupBy("kid")
          .agg(count(lit(1)).as("n"), sum("cos_fp").as("cs"),
            min("cos_fp").as("min_cos_fp"))
          .select(col("kid").as("cluster_id"), col("n"),
            expr("cs div n").as("cohesion_fp"), col("min_cos_fp"))
          .join(broadcast(nn), "cluster_id")
          .orderBy("cluster_id")
      },
      Some(s"""$ivfOracleCtes,
           |cfq AS (
           |  SELECT kid, pos, CAST(floor(c[pos] * 1000000.0 + 0.5) AS BIGINT) AS cfp
           |  FROM cent2 CROSS JOIN generate_series(1, $embDim) AS g(pos)),
           |cnq AS (SELECT kid, CAST(sum(cfp * cfp) AS BIGINT) AS cn2 FROM cfq GROUP BY 1),
           |xfq AS (
           |  SELECT cid, kid, pos, CAST(floor(v[pos] * 10000000.0) AS BIGINT) AS xfp
           |  FROM asgF CROSS JOIN generate_series(1, $embDim) AS g(pos)),
           |pxq AS (
           |  SELECT x.cid, x.kid,
           |    CAST(sum(x.xfp * x.xfp) AS BIGINT) AS sx2,
           |    CAST(sum(x.xfp * f.cfp) AS BIGINT) AS dotn
           |  FROM xfq x JOIN cfq f ON f.kid = x.kid AND f.pos = x.pos
           |  GROUP BY 1, 2),
           |scq AS (
           |  SELECT p.cid, p.kid,
           |    CASE WHEN p.sx2 > 0 AND c.cn2 > 0 THEN
           |      CAST(floor((CAST(p.dotn AS DOUBLE) /
           |        (sqrt(CAST(p.sx2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))))
           |        * 1000000.0) AS BIGINT)
           |    ELSE 0 END AS cos_fp
           |  FROM pxq p JOIN cnq c ON c.kid = p.kid),
           |cpq AS (
           |  SELECT a.kid AS ka, b.kid AS kb, CAST(sum(a.cfp * b.cfp) AS BIGINT) AS dotc
           |  FROM cfq a JOIN cfq b ON a.pos = b.pos AND a.kid <> b.kid
           |  GROUP BY 1, 2),
           |nnq AS (
           |  SELECT ka AS kid,
           |    max(CASE WHEN x.cn2 > 0 AND y.cn2 > 0 THEN
           |      CAST(floor((CAST(dotc AS DOUBLE) /
           |        (sqrt(CAST(x.cn2 AS DOUBLE)) * sqrt(CAST(y.cn2 AS DOUBLE))))
           |        * 1000000.0) AS BIGINT)
           |    ELSE 0 END) AS nn_sim_fp
           |  FROM cpq JOIN cnq x ON x.kid = cpq.ka JOIN cnq y ON y.kid = cpq.kb
           |  GROUP BY 1)
           |SELECT s.kid AS cluster_id, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(s.cos_fp) // count(*) AS BIGINT) AS cohesion_fp,
           |  CAST(min(s.cos_fp) AS BIGINT) AS min_cos_fp,
           |  n2.nn_sim_fp
           |FROM scq s JOIN nnq n2 ON n2.kid = s.kid
           |GROUP BY s.kid, n2.nn_sim_fp
           |ORDER BY cluster_id""".stripMargin)),

    Q("q165_jl_projection",
      (s, dir) => {
        // Johnson–Lindenstrauss sign projection: reduce the globally
        // int8-quantized corpus (q154's quantization — one abs-max,
        // geometry preserved up to one uniform scale) from d=64 to
        // d'=16 with a deterministic ±1 matrix derived from the
        // portable hash of (i, j), then AUDIT the distortion on the
        // 120 sample pairs — projected-vs-original squared-distance
        // ratio, whose concentration around 1 is the JL guarantee the
        // downstream ANN prefilter relies on. The sign matrix is
        // model-sized, so it is baked into the plan as LITERALS: the
        // corpus projection is d'·d multiply-adds per row inside
        // whole-stage codegen — zero shuffle, zero row amplification
        // (the 100 TB shape; a per-row md5 per (i,j) would re-hash
        // 1024× per row). All distances are exact longs; the only
        // doubles are the final published ratios.
        val dPrime = 16
        val signs: Array[Array[Long]] = Array.tabulate(dPrime, embDim) {
          (j, i) =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(s"jl:$i:$j".getBytes("UTF-8"))
            val prefix64 = md.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
            if (((prefix64 >>> 4) % 2 + 2) % 2 == 1) 1L else -1L
        }
        val gm = tp(s, dir, "embeddings").agg(
          (greatest(max(graft.functions.VecExpressions.vecAbsMax(
            col("embedding"))), lit(1e-30)) / 127.0).as("gsc"))
        val qv = tp(s, dir, "embeddings").crossJoin(broadcast(gm))
          .select(col("vec_id"),
            expr("""transform(embedding, x ->
              CAST(greatest(-127.0D, least(127.0D,
                floor(CAST(x AS DOUBLE) / gsc + 0.5D))) AS BIGINT))""").as("q"))
        val proj = qv.select(col("vec_id"), col("q"),
          array(signs.map(row =>
            expr(s"""aggregate(zip_with(q, array(${row.map(_ + "L").mkString(",")}),
              (x, sgn) -> x * sgn), 0L, (acc, v) -> acc + v)""")): _*).as("y"))
        val sa = proj.filter(col("vec_id") < 16)
        val a = sa.select(col("vec_id").as("id_a"), col("q").as("qa"), col("y").as("ya"))
        val b = sa.select(col("vec_id").as("id_b"), col("q").as("qb"), col("y").as("yb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            expr("aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("dq2"),
            expr("aggregate(zip_with(ya, yb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("dy2"))
          .select(col("id_a"), col("id_b"), col("dq2"), col("dy2"),
            when(col("dq2") > 0,
              expr(s"(10000 * dy2) div ($dPrime * dq2)")).otherwise(0L)
              .as("ratio_fp"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH gm AS (
           |  SELECT greatest(max(list_max(list_transform(embedding,
           |    x -> abs(x::DOUBLE)))), 1e-30) / 127.0 AS gsc
           |  FROM embeddings),
           |qv AS (
           |  SELECT vec_id, list_transform(embedding, x ->
           |    CAST(greatest(-127.0, least(127.0, floor(x::DOUBLE / gsc + 0.5)))
           |      AS BIGINT)) AS q
           |  FROM embeddings CROSS JOIN gm),
           |e2 AS (
           |  SELECT vec_id, unnest(generate_series(0, len(q) - 1)) AS i, q
           |  FROM qv),
           |e3 AS (SELECT vec_id, i, q[i + 1] AS qi FROM e2),
           |yv AS (
           |  SELECT vec_id, j,
           |    CAST(sum(qi * (CASE WHEN (('0x' || substr(md5('jl:' ||
           |      CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 2) = 1
           |      THEN 1 ELSE -1 END)) AS BIGINT) AS y
           |  FROM e3 CROSS JOIN generate_series(0, 15) AS g(j)
           |  GROUP BY 1, 2),
           |sa AS (SELECT vec_id, q FROM qv WHERE vec_id < 16),
           |pq AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |    CAST(list_sum(list_transform(range(len(a.q)),
           |      i -> (a.q[i+1] - b.q[i+1]) * (a.q[i+1] - b.q[i+1]))) AS BIGINT) AS dq2
           |  FROM sa a JOIN sa b ON a.vec_id < b.vec_id),
           |py AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |    CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS dy2
           |  FROM yv a JOIN yv b ON a.j = b.j AND a.vec_id < b.vec_id
           |  WHERE a.vec_id < 16 AND b.vec_id < 16
           |  GROUP BY 1, 2)
           |SELECT pq.id_a, pq.id_b, pq.dq2, py.dy2,
           |  CASE WHEN pq.dq2 > 0 THEN (10000 * py.dy2) // (16 * pq.dq2)
           |       ELSE 0 END AS ratio_fp
           |FROM pq JOIN py ON py.id_a = pq.id_a AND py.id_b = pq.id_b
           |ORDER BY pq.id_a, pq.id_b""".stripMargin)),

    Q("q166_dedup_roi",
      (s, dir) => {
        // Dedup ROI by duplicate-class size: for each class size, how
        // many classes exist, how many documents and tokens a
        // keep-first (min doc_id) dedup would remove — the report that
        // prices a dedup pass BEFORE running it at 100 TB (classes of
        // size 2 dominate the count; one size-1000 class dominates the
        // savings). Classes are fingerprint collisions (q44's
        // deterministic min-md5-5-gram candidate generator, so the
        // oracle re-derives them exactly); the plan is one fingerprint
        // pass + a class-sized rollup + a size-sized rollup — the
        // canonical survivor's tokens ride the SAME aggregation as a
        // struct-min, no second join back to the corpus.
        val fps = tp(s, dir, "documents")
          .select(col("doc_id"), TextOps.fingerprint(col("text"), 5).as("fp"),
            TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        fps.groupBy("fp")
          .agg(count(lit(1)).as("csize"),
            sum("n_tokens").as("toks"),
            min(struct(col("doc_id"), col("n_tokens"))).as("canon"))
          .select(col("csize"), col("toks"),
            col("canon").getField("n_tokens").as("keep_toks"))
          .groupBy("csize")
          .agg(count(lit(1)).as("n_classes"),
            sum(col("csize") - 1).as("docs_removed"),
            sum("toks").as("tokens_total"),
            sum(col("toks") - col("keep_toks")).as("tokens_removed"))
          .orderBy("csize")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             |    CASE WHEN len(toks) >= 5
             |      THEN list_transform(generate_series(0, len(toks) - 5),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh
             |  FROM t),
             |f AS (
             |  SELECT doc_id, n_tokens,
             |    list_min(list_transform(sh, x -> md5(x))) AS fp
             |  FROM s),
             |cls AS (
             |  SELECT fp, CAST(count(*) AS BIGINT) AS csize,
             |    CAST(sum(n_tokens) AS BIGINT) AS toks,
             |    CAST(arg_min(n_tokens, doc_id) AS BIGINT) AS keep_toks
             |  FROM f GROUP BY 1)
             |SELECT csize, CAST(count(*) AS BIGINT) AS n_classes,
             |  CAST(sum(csize - 1) AS BIGINT) AS docs_removed,
             |  CAST(sum(toks) AS BIGINT) AS tokens_total,
             |  CAST(sum(toks - keep_toks) AS BIGINT) AS tokens_removed
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q167_curriculum_schedule",
      (s, dir) => {
        // Curriculum schedule: docs ranked by the q31 quality score,
        // split into deciles, each decile assigned the training epoch
        // where it first enters (top 3 deciles → epoch 1, 4–7 → 2,
        // 8–10 → 3) with per-decile and cumulative token budgets — the
        // plan behind quality-annealed training (clean data first,
        // full corpus late). The global ranking uses the q123
        // two-phase discipline: per-score-bucket counts (≤101 rows)
        // give each bucket its rank offset, and the only windows are
        // the ≤101-row bucket cumsum, the per-bucket row_number
        // (partitioned — parallel), and the 10-row decile cumsum — no
        // corpus-wide single-partition sort anywhere.
        val sb = tp(s, dir, "documents")
          .select(col("doc_id"),
            floor(TextOps.qualityScore(col("text")) * 1e6 + 0.5)
              .cast(LongType).as("score_fp"),
            TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"))
          .withColumn("b", expr("score_fp div 10000"))
          .pin()
        val tot = sb.agg(count(lit(1)).as("n_total"))
        val bcc = sb.groupBy("b").agg(count(lit(1)).as("bn"))
          .withColumn("cum_higher",
            coalesce(sum("bn").over(Window.orderBy(col("b").desc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val ranked = sb.join(broadcast(bcc.select("b", "cum_higher")), "b")
          .withColumn("rn", col("cum_higher") +
            row_number().over(Window.partitionBy("b")
              .orderBy(col("score_fp").desc, col("doc_id"))))
          .crossJoin(broadcast(tot))
          .withColumn("decile", expr("1 + ((rn - 1) * 10) div n_total"))
        ranked.groupBy("decile")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
            min("score_fp").as("min_score_fp"),
            max("score_fp").as("max_score_fp"))
          .withColumn("entry_epoch",
            when(col("decile") <= 3, 1L).when(col("decile") <= 7, 2L)
              .otherwise(3L))
          .withColumn("cum_tokens",
            sum("tokens").over(Window.orderBy("decile")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .orderBy("decile")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, text,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id,
             |    CAST(floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) AS BIGINT) AS score_fp,
             |    CAST(n_tokens AS BIGINT) AS n_tokens
             |  FROM toks),
             |sb AS (SELECT doc_id, score_fp, n_tokens, score_fp // 10000 AS b FROM q),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sb),
             |bcc AS (
             |  SELECT b, COALESCE(sum(bn) OVER (ORDER BY b DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_higher
             |  FROM (SELECT b, CAST(count(*) AS BIGINT) AS bn FROM sb GROUP BY 1)),
             |r AS (
             |  SELECT s.doc_id, s.score_fp, s.n_tokens,
             |    c.cum_higher + row_number() OVER (PARTITION BY s.b
             |      ORDER BY s.score_fp DESC, s.doc_id) AS rn
             |  FROM sb s JOIN bcc c USING (b)),
             |d AS (
             |  SELECT 1 + ((rn - 1) * 10) // n_total AS decile, score_fp, n_tokens
             |  FROM r CROSS JOIN tot),
             |g AS (
             |  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tokens) AS BIGINT) AS tokens,
             |    CAST(min(score_fp) AS BIGINT) AS min_score_fp,
             |    CAST(max(score_fp) AS BIGINT) AS max_score_fp
             |  FROM d GROUP BY 1)
             |SELECT CAST(decile AS BIGINT) AS decile, n_docs, tokens,
             |  min_score_fp, max_score_fp,
             |  CAST(CASE WHEN decile <= 3 THEN 1 WHEN decile <= 7 THEN 2 ELSE 3 END AS BIGINT) AS entry_epoch,
             |  CAST(sum(tokens) OVER (ORDER BY decile
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
             |FROM g ORDER BY decile""".stripMargin)),

    Q("q168_pq_ann",
      (s, dir) => {
        // Product quantization (Jégou et al., "Product Quantization for
        // Nearest Neighbor Search", TPAMI 2011): the d=64 globally
        // int8-quantized corpus (q154's quantization) is split into 4
        // subspaces of 16 dims, each given a 16-centroid codebook by 2
        // integer k-means rounds — a vector compresses to 4 codes
        // (2 bytes vs 64 floats). Search is ADC: each query precomputes
        // a 4×16 distance table against the codebooks and scores every
        // candidate by 4 table lookups instead of 64 multiplies. The
        // query reports recall@10 of ADC vs the exact L2 ranking over
        // the same quantized vectors — the memory-for-recall trade
        // measured, completing the quantization family (scalar int8 →
        // PQ) under q144's calibration discipline. EVERYTHING is exact
        // long arithmetic (distances, truncating integer centroid
        // means), so DuckDB re-derives codebooks, codes, tables, and
        // both rankings bit-for-bit. Codebook training: two corpus
        // passes, each ONE codegen'd literal-codebook argmin (the IVF
        // nearestCentroid discipline — no join, no row fan-out for
        // assignment) + one member-mean rollup, with the k-means update
        // on collected MODEL-sized sums (4·16·16 longs — the q154/q163
        // precedent); encoding is the same argmin projection, ADC is a
        // broadcast join on (s, code), and the rank windows are
        // per-query partitions. (Fit shared with the distortion
        // profile q171 via [[pqFitted]].)
        val (qv2, sub, cent) = pqFitted(s, dir)
        val aF = sub.withColumn("kid", pqKidExpr(cent))
        def distArrFor(sb: Int): Column = array(
          cent(sb).zipWithIndex.map { case (cv, j) =>
            struct(lit(j).as("kid"), pqDistTo(cv).as("td"))
          }: _*)
        val qtab = sub.filter(col("vec_id") < 16)
          .withColumn("da",
            when(col("s") === 0, distArrFor(0)).when(col("s") === 1, distArrFor(1))
              .when(col("s") === 2, distArrFor(2)).otherwise(distArrFor(3)))
          .select(col("vec_id").as("qid"), col("s"),
            explode(col("da")).as("de"))
          .select(col("qid"), col("s"), col("de").getField("kid").as("kid"),
            col("de").getField("td").as("td"))
        val adc = aF.join(broadcast(qtab), Seq("s", "kid"))
          .filter(col("qid") =!= col("vec_id"))
          .groupBy("qid", "vec_id").agg(sum("td").as("adist"))
          .withColumnRenamed("vec_id", "cid")
        val qq = qv2.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("q").as("qarr"))
        val exact = qv2.join(broadcast(qq), col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("cid"),
            expr("""aggregate(zip_with(q, qarr, (a, b) -> (a - b) * (a - b)),
              0L, (acc, v) -> acc + v)""").as("ed"))
        val topA = adc.withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("adist"), col("cid"))))
          .filter(col("rn") <= 10).select("qid", "cid")
        val topE = exact.withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("ed"), col("cid"))))
          .filter(col("rn") <= 10).select("qid", "cid")
        val hits = topE.join(topA, Seq("qid", "cid"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("h"))
        qv2.filter(col("vec_id") < 16).select(col("vec_id").as("qid"))
          .join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("h"), lit(0L)).as("n_hits"))
          .withColumn("recall_fp", col("n_hits") * 1000)
          .orderBy("qid")
      },
      Some(s"""$pqOracleCtes,
           |qtab AS (
           |  SELECT vec_id AS qid, s, kid, dist AS td FROM dF WHERE vec_id < 16),
           |adc AS (
           |  SELECT t.qid, a.vec_id AS cid, CAST(sum(t.td) AS BIGINT) AS adist
           |  FROM aF a JOIN qtab t ON t.s = a.s AND t.kid = a.kid
           |  WHERE t.qid <> a.vec_id GROUP BY 1, 2),
           |eq AS (
           |  SELECT vec_id AS qid, s, pos, x AS xq FROM e WHERE vec_id < 16),
           |exq AS (
           |  SELECT eq.qid, e.vec_id AS cid,
           |    CAST(sum((eq.xq - e.x) * (eq.xq - e.x)) AS BIGINT) AS ed
           |  FROM e JOIN eq ON eq.s = e.s AND eq.pos = e.pos
           |  WHERE eq.qid <> e.vec_id GROUP BY 1, 2),
           |ta AS (
           |  SELECT qid, cid FROM (
           |    SELECT qid, cid,
           |      row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rn
           |    FROM adc) WHERE rn <= 10),
           |te AS (
           |  SELECT qid, cid FROM (
           |    SELECT qid, cid,
           |      row_number() OVER (PARTITION BY qid ORDER BY ed, cid) AS rn
           |    FROM exq) WHERE rn <= 10),
           |h AS (
           |  SELECT te.qid, CAST(count(*) AS BIGINT) AS h
           |  FROM te JOIN ta ON ta.qid = te.qid AND ta.cid = te.cid
           |  GROUP BY 1)
           |SELECT q.vec_id AS qid, COALESCE(h.h, 0) AS n_hits,
           |  COALESCE(h.h, 0) * 1000 AS recall_fp
           |FROM (SELECT vec_id FROM qv WHERE vec_id < 16) q
           |LEFT JOIN h ON h.qid = q.vec_id
           |ORDER BY qid""".stripMargin)),

    Q("q169_rake_apply",
      (s, dir) => {
        // The q163 raking made EXECUTABLE: each (source, lang) cell's
        // IPF weight becomes a deterministic keep probability
        // (portable-hash thresholding, the q58 sampling discipline with
        // its own ':rake' salt), and the report shows target share vs
        // ACHIEVED share after the sample — the closing of the loop
        // from "what weights hit both marginals" to "what the sampled
        // corpus actually looks like". Cells with weight ≥ 1 keep
        // everything (down-sampling only; up-weighting needs
        // repetition, which is the q54/q162 epoch story, not a filter —
        // documented, not hidden). The fit is the SAME collected
        // model-sized IPF as q163 ([[ipfRakedCells]]); the apply is one
        // broadcast join + a codegen'd hash filter over the corpus.
        val cells = ipfRakedCells(s, dir)
        import s.implicits._
        val w = cells.map { case (src, l, n, _, rk, wt) => (src, l, n, rk, wt) }
          .toDF("source", "lang", "n_docs", "raked_fp", "weight_fp")
        val kept = tp(s, dir, "documents")
          .join(broadcast(w.select("source", "lang", "weight_fp")),
            Seq("source", "lang"))
          .filter(PortableHash.base(
            concat(col("doc_id").cast("string"), lit(":rake"))) % 1000000
            < col("weight_fp"))
          .groupBy("source", "lang").agg(count(lit(1)).as("n_kept"))
        val tk = kept.agg(sum("n_kept").as("total_kept"))
        w.join(kept, Seq("source", "lang"), "left")
          .crossJoin(broadcast(tk))
          .select(col("source"), col("lang"), col("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            col("weight_fp"), col("raked_fp"),
            expr("(coalesce(n_kept, 0L) * 1000000000) div total_kept")
              .as("achieved_fp"))
          .orderBy("source", "lang")
      },
      Some(s"""$ipfOracleCtes,
           |w AS (
           |  SELECT f.source, f.lang, f.n, f.m AS raked_fp,
           |    CAST((f.m * 1000000) // ((f.n * 1000000000) // t) AS BIGINT) AS weight_fp
           |  FROM r3b f CROSS JOIN tot),
           |kc AS (
           |  SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_kept
           |  FROM documents d JOIN w ON w.source = d.source AND w.lang = d.lang
           |  WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':rake'), 1, 15))::BIGINT
           |    % ${PortableHash.P}) % 1000000 < w.weight_fp
           |  GROUP BY 1, 2),
           |tk AS (SELECT CAST(sum(n_kept) AS BIGINT) AS total_kept FROM kc)
           |SELECT w.source, w.lang, w.n AS n_docs,
           |  COALESCE(kc.n_kept, 0) AS n_kept, w.weight_fp, w.raked_fp,
           |  CAST((COALESCE(kc.n_kept, 0) * 1000000000) // tk.total_kept AS BIGINT) AS achieved_fp
           |FROM w LEFT JOIN kc ON kc.source = w.source AND kc.lang = w.lang
           |CROSS JOIN tk
           |ORDER BY w.source, w.lang""".stripMargin)),

    Q("q170_source_cleanliness",
      (s, dir) => {
        // Per-source cleanliness scoreboard: one row per source with its
        // duplication burden at all three granularities the dedup family
        // measures — exact copies (md5 digest classes, q34), near-dups
        // (min-md5-5-gram fingerprint classes, q44's deterministic
        // candidate generator), and duplicated-SPAN token coverage
        // (q139's ExactSubstr profile) — the triage view that says
        // WHICH source pays for WHICH dedup pass before any is run at
        // 100 TB. One corpus scan feeds all three derivations (pinned);
        // class memberships come back as map-side-combined count joins;
        // the span profile is the production ExactSubstrOps operator.
        // Every rate is an integer fixed-point division.
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"))
          .pin()
        val ex = d.select(col("doc_id"), md5(col("text")).as("digest"))
        val exFlag = ex
          .join(ex.groupBy("digest").agg(count(lit(1)).as("copies")), "digest")
          .select(col("doc_id"), (col("copies") >= 2).cast(LongType).as("is_exact"))
        val fp = d.select(col("doc_id"), TextOps.fingerprint(col("text"), 5).as("fp"))
        val fpFlag = fp
          .join(fp.groupBy("fp").agg(count(lit(1)).as("fcopies")), "fp")
          .select(col("doc_id"), (col("fcopies") >= 2).cast(LongType).as("is_fpdup"))
        val sp = ExactSubstrOps.dupSpanProfile(d, col("doc_id"), col("text"))
          .select(col("doc_id"), col("dup_tokens"))
        d.select("doc_id", "source", "n_tokens")
          .join(exFlag, "doc_id").join(fpFlag, "doc_id")
          .join(sp, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
            sum("is_exact").as("exact_dup_docs"),
            sum("is_fpdup").as("fpdup_docs"),
            sum(coalesce(col("dup_tokens"), lit(0L))).as("span_dup_tokens"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("exact_dup_docs"),
            expr("(10000 * exact_dup_docs) div n_docs").as("exact_rate_fp"),
            col("fpdup_docs"),
            expr("(10000 * fpdup_docs) div n_docs").as("fpdup_rate_fp"),
            col("span_dup_tokens"),
            expr("(10000 * span_dup_tokens) div n_tokens").as("span_cov_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |ex AS (SELECT doc_id, md5(text) AS digest FROM d),
             |exc AS (SELECT digest, count(*) AS copies FROM ex GROUP BY 1),
             |exf AS (
             |  SELECT ex.doc_id, CASE WHEN exc.copies >= 2 THEN 1 ELSE 0 END AS is_exact
             |  FROM ex JOIN exc USING (digest)),
             |t2 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s2 AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 5
             |      THEN list_transform(generate_series(0, len(toks) - 5),
             |             i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(toks, ' ')] END AS sh
             |  FROM t2),
             |f2 AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM s2),
             |fc AS (SELECT fp, count(*) AS fcopies FROM f2 GROUP BY 1),
             |ff AS (
             |  SELECT f2.doc_id, CASE WHEN fc.fcopies >= 2 THEN 1 ELSE 0 END AS is_fpdup
             |  FROM f2 JOIN fc USING (fp)),
             |nz AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents WHERE len(string_split_regex(trim(text), '\s+')) >= 8),
             |gpos AS (SELECT doc_id, n, t,
             |  unnest(generate_series(0, CAST(n AS INT) - 8)) AS pos FROM nz),
             |g AS (SELECT doc_id, n, pos,
             |  substr(md5(array_to_string(t[pos + 1 : pos + 8], ' ')), 1, 15) AS gkey
             |  FROM gpos),
             |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
             |dp AS (SELECT doc_id, n, pos FROM g
             |  WHERE gkey IN (SELECT gkey FROM dup)),
             |m AS (SELECT doc_id, n, pos,
             |  max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             |  FROM dp),
             |mk AS (SELECT doc_id, n, pos,
             |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS ns
             |  FROM m),
             |sp AS (SELECT doc_id, n, pos,
             |  sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
             |  FROM mk),
             |spans AS (SELECT doc_id, n, span_id, min(pos) AS st, max(pos) + 7 AS en
             |  FROM sp GROUP BY 1, 2, 3),
             |outp AS (SELECT doc_id, CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens
             |  FROM spans GROUP BY doc_id)
             |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
             |  CAST(sum(exf.is_exact) AS BIGINT) AS exact_dup_docs,
             |  CAST((10000 * sum(exf.is_exact)) // count(*) AS BIGINT) AS exact_rate_fp,
             |  CAST(sum(ff.is_fpdup) AS BIGINT) AS fpdup_docs,
             |  CAST((10000 * sum(ff.is_fpdup)) // count(*) AS BIGINT) AS fpdup_rate_fp,
             |  CAST(sum(COALESCE(outp.dup_tokens, 0)) AS BIGINT) AS span_dup_tokens,
             |  CAST((10000 * sum(COALESCE(outp.dup_tokens, 0))) // sum(d.n_tokens) AS BIGINT) AS span_cov_fp
             |FROM d
             |JOIN exf USING (doc_id)
             |JOIN ff USING (doc_id)
             |LEFT JOIN outp USING (doc_id)
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    Q("q171_pq_distortion",
      (s, dir) => {
        // PQ distortion profile over the SAME codebook fit q168
        // searches with ([[pqFitted]]): per subspace, the mean and
        // worst assigned-code squared residual plus codebook
        // utilization (distinct codes used of 16) — the quantization-
        // error report read next to q168's recall before committing a
        // 32× memory compression (a subspace with few codes used or a
        // fat residual tail is where recall dies first). One pass: the
        // residual is the codegen'd literal-codebook MIN distance
        // (same structs as the argmin), the report is a 4-row rollup.
        // All exact longs; mean is a truncating integer division.
        val (_, sub, cent) = pqFitted(s, dir)
        sub.withColumn("kid", pqKidExpr(cent))
          .withColumn("dmin", pqMinDistExpr(cent))
          .groupBy("s")
          .agg(count(lit(1)).as("n"), sum("dmin").as("sd"),
            max("dmin").as("max_sq_err"),
            countDistinct("kid").as("codes_used"))
          .select(col("s").cast(LongType).as("subspace"), col("n"),
            expr("sd div n").as("mean_sq_err"), col("max_sq_err"),
            col("codes_used"))
          .orderBy("subspace")
      },
      Some(s"""$pqOracleCtes,
           |asgd AS (
           |  SELECT d.vec_id, d.s, d.kid, d.dist
           |  FROM dF d JOIN aF a
           |    ON a.vec_id = d.vec_id AND a.s = d.s AND a.kid = d.kid)
           |SELECT s AS subspace, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(dist) // count(*) AS BIGINT) AS mean_sq_err,
           |  CAST(max(dist) AS BIGINT) AS max_sq_err,
           |  CAST(count(DISTINCT kid) AS BIGINT) AS codes_used
           |FROM asgd GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q172_neardup_threshold_sweep",
      (s, dir) => {
        // Threshold sensitivity of MinHash near-dedup: for est-Jaccard
        // cuts 0.5–0.9, how many candidate pairs survive, how many
        // documents are touched, and how many a greedy pairwise
        // keep-smaller-id pass would drop — the sweep a corpus owner
        // reads before fixing the q35 threshold for a 100 TB dedup (the
        // knee of pairs_ge vs t is the operating point). ONE candidate
        // generation (the production banding path, pinned) fanned ×5 by
        // a literal threshold array; everything after is
        // candidate-pair-sized. Thresholds compare as t/10.0 — the
        // identical double in both engines; est values are k/32, which
        // never manufactures a tie against t/10 except the exact 0.5,
        // handled identically by >= on both sides.
        val pairs = DedupOps.minhashCandidatePairs(
            tp(s, dir, "documents"), col("doc_id"), col("text"))
          .pin()
        val f = pairs
          .select(col("id_a"), col("id_b"), col("est_jaccard"),
            explode(array((5 to 9).map(t => lit(t.toLong)): _*)).as("t10"))
          .filter(col("est_jaccard") >= col("t10") / lit(10.0))
          .pin()
        val touched = f
          .select(col("t10"), explode(array(col("id_a"), col("id_b"))).as("d"))
          .groupBy("t10").agg(countDistinct("d").as("docs_touched"))
        f.groupBy("t10")
          .agg(count(lit(1)).as("pairs_ge"),
            countDistinct("id_b").as("docs_removed_greedy"))
          .join(touched, "t10")
          .orderBy("t10")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             |    len(list_filter(generate_series(1, 32), i -> a.sig[i] = c.sig[i])) / 32.0 AS est
             |  FROM bk a JOIN bk c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |th AS (SELECT CAST(unnest(generate_series(5, 9)) AS BIGINT) AS t10),
             |f AS (
             |  SELECT th.t10, p.id_a, p.id_b FROM p CROSS JOIN th
             |  WHERE p.est >= th.t10 / 10.0),
             |tc AS (
             |  SELECT t10, CAST(count(DISTINCT d) AS BIGINT) AS docs_touched
             |  FROM (SELECT t10, unnest([id_a, id_b]) AS d FROM f) GROUP BY 1)
             |SELECT f.t10, CAST(count(*) AS BIGINT) AS pairs_ge,
             |  CAST(count(DISTINCT f.id_b) AS BIGINT) AS docs_removed_greedy,
             |  tc.docs_touched
             |FROM f JOIN tc USING (t10)
             |GROUP BY f.t10, tc.docs_touched
             |ORDER BY f.t10""".stripMargin)),

    Q("q173_knn_label_accuracy",
      (s, dir) => {
        // Leave-one-out kNN classification accuracy over the labeled
        // embedding corpus: 64 anchors, brute-force cosine top-10
        // (self excluded — the production q38 path), majority vote of
        // neighbor labels with a deterministic (count DESC, label ASC)
        // tiebreak, scored against the anchor's own label PER CLASS —
        // the label-quality / embedding-quality diagnostic read before
        // trusting label prototypes (q63) or hard negatives (q136).
        // Anchor-sample protocol is q144's: exact search is affordable
        // because anchors, not the corpus, are the query side. The
        // vote argmax is one max(struct) aggregation — no windows.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val nn = SimilarityOps.bruteForceTopK(queries, corpus, 10)
        val pred = broadcast(nn.select("qid", "cid"))
          .join(emb.select(col("vec_id").as("cid"),
            col("label").cast(LongType).as("nlabel")), "cid")
          .groupBy("qid", "nlabel").agg(count(lit(1)).as("v"))
          .groupBy("qid")
          .agg(max(struct(col("v"), (lit(0L) - col("nlabel")).as("negl"))).as("m"))
          .select(col("qid"), (lit(0L) - col("m").getField("negl")).as("pred"))
        emb.filter(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("label").cast(LongType).as("label"))
          .join(broadcast(pred), "qid")
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("n_correct"))
          .select(col("label"), col("n"), col("n_correct"),
            expr("(10000 * n_correct) div n").as("acc_fp"))
          .orderBy("label")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qvec,
             |    CAST(label AS BIGINT) AS qlabel
             |  FROM embeddings WHERE vec_id < 64),
             |scored AS (
             |  SELECT q.qid, c.vec_id AS cid,
             |    list_cosine_similarity(CAST(q.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
             |  FROM embeddings c, q WHERE c.vec_id <> q.qid),
             |ranked AS (
             |  SELECT qid, cid,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
             |  FROM scored),
             |nl AS (
             |  SELECT r.qid, CAST(e.label AS BIGINT) AS nlabel
             |  FROM ranked r JOIN embeddings e ON e.vec_id = r.cid
             |  WHERE r.rank <= 10),
             |votes AS (SELECT qid, nlabel, count(*) AS v FROM nl GROUP BY 1, 2),
             |pred AS (
             |  SELECT qid, nlabel AS pred FROM (
             |    SELECT qid, nlabel,
             |      row_number() OVER (PARTITION BY qid ORDER BY v DESC, nlabel) AS rn
             |    FROM votes) WHERE rn = 1)
             |SELECT q.qlabel AS label, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN p.pred = q.qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             |  CAST((10000 * sum(CASE WHEN p.pred = q.qlabel THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS acc_fp
             |FROM q JOIN pred p USING (qid)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

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

    Q("q175_normalization_dedup_lift",
      (s, dir) => {
        // What text normalization buys the deduper: per source, docs in
        // exact-dup classes BEFORE (raw md5) vs AFTER normalization
        // (lower + control/zero-width strip + whitespace collapse —
        // TextOps.normalize, built inside the Java-regex/RE2 common
        // subset precisely so this oracle can mirror it), and the lift.
        // Raw-identical texts normalize identically, so lift ≥ 0 by
        // construction (spec-pinned). Two digest passes over one pinned
        // scan; class memberships are map-side-combined count joins.
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5(col("text")).as("dr"),
            md5(TextOps.normalize(col("text"))).as("dn"))
          .pin()
        val rFlag = d
          .join(d.groupBy("dr").agg(count(lit(1)).as("rc")), "dr")
          .select(col("doc_id"), (col("rc") >= 2).cast(LongType).as("is_raw"))
        val nFlag = d
          .join(d.groupBy("dn").agg(count(lit(1)).as("nc")), "dn")
          .select(col("doc_id"), (col("nc") >= 2).cast(LongType).as("is_norm"))
        d.select("doc_id", "source")
          .join(rFlag, "doc_id").join(nFlag, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("is_raw").as("raw_dup_docs"),
            sum("is_norm").as("norm_dup_docs"))
          .select(col("source"), col("n_docs"), col("raw_dup_docs"),
            col("norm_dup_docs"),
            (col("norm_dup_docs") - col("raw_dup_docs")).as("lift_docs"),
            expr("(10000 * norm_dup_docs) div n_docs").as("norm_rate_fp"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, source, md5(text) AS dr,
             |    md5(lower(trim(regexp_replace(regexp_replace(text,
             |      '[\\x00-\\x08\\x0e-\\x1f\\x7f' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']', '', 'g'),
             |      '\\s+', ' ', 'g')))) AS dn
             |  FROM documents),
             |rc AS (SELECT dr, count(*) AS rc FROM d GROUP BY 1),
             |nc AS (SELECT dn, count(*) AS nc FROM d GROUP BY 1),
             |fl AS (
             |  SELECT d.doc_id, d.source,
             |    CASE WHEN rc.rc >= 2 THEN 1 ELSE 0 END AS is_raw,
             |    CASE WHEN nc.nc >= 2 THEN 1 ELSE 0 END AS is_norm
             |  FROM d JOIN rc USING (dr) JOIN nc USING (dn))
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(is_raw) AS BIGINT) AS raw_dup_docs,
             |  CAST(sum(is_norm) AS BIGINT) AS norm_dup_docs,
             |  CAST(sum(is_norm) - sum(is_raw) AS BIGINT) AS lift_docs,
             |  CAST((10000 * sum(is_norm)) // count(*) AS BIGINT) AS norm_rate_fp
             |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q176_lsh_band_sensitivity",
      (s, dir) => {
        // LSH S-curve operating points: the SAME 32-hash signatures
        // banded three ways (4×8, 8×4, 16×2), each config scored by
        // candidate volume and PRECISION (exact 3-gram Jaccard ≥ 0.5
        // verified on candidates only — never all-pairs, so the
        // diagnostic itself has the production scale shape). More
        // bands/shorter rows → more candidates, lower precision; this
        // is the measured curve a 100 TB dedup owner picks a banding
        // from (q158 calibrates the estimator, this calibrates the
        // blocking). ONE signature pass and ONE shingle-set pass are
        // shared by all three configs (pinned).
        val docs = tp(s, dir, "documents")
        val sigs = DedupOps.minhashSignatures(docs, col("doc_id"), col("text"),
          shingleSize = 3, numHashes = 32).pin()
        val sd = docs.select(col("doc_id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
          .pin()
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
          .orderBy("bands")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |sd AS (SELECT doc_id, list_distinct(sh) AS sd FROM s),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |cfg AS (SELECT * FROM (VALUES (4, 8), (8, 4), (16, 2)) AS v(bands, rpb)),
             |bk AS (
             |  SELECT c.bands, g.doc_id, g.sig, bb.band,
             |    array_to_string(list_slice(g.sig, bb.band * c.rpb + 1, bb.band * c.rpb + c.rpb), ',') AS bucket
             |  FROM sig g CROSS JOIN cfg c
             |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS band) bb
             |  WHERE bb.band < c.bands),
             |p AS (
             |  SELECT DISTINCT a.bands, a.doc_id AS id_a, b2.doc_id AS id_b
             |  FROM bk a JOIN bk b2
             |    ON a.bands = b2.bands AND a.band = b2.band
             |    AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
             |j AS (
             |  SELECT p.bands,
             |    CASE WHEN (CASE WHEN (len(sa.sd) + len(sb.sd) - len(list_intersect(sa.sd, sb.sd))) > 0
             |      THEN CAST(len(list_intersect(sa.sd, sb.sd)) AS DOUBLE)
             |        / (len(sa.sd) + len(sb.sd) - len(list_intersect(sa.sd, sb.sd)))
             |      ELSE 0.0 END) >= 0.5 THEN 1 ELSE 0 END AS is_true
             |  FROM p JOIN sd sa ON sa.doc_id = p.id_a JOIN sd sb ON sb.doc_id = p.id_b),
             |res AS (
             |  SELECT bands, CAST(count(*) AS BIGINT) AS n_candidates,
             |    CAST(sum(is_true) AS BIGINT) AS n_true
             |  FROM j GROUP BY 1)
             |SELECT CAST(c.bands AS BIGINT) AS bands,
             |  CAST(c.rpb AS BIGINT) AS rows_per_band,
             |  COALESCE(r.n_candidates, 0) AS n_candidates,
             |  COALESCE(r.n_true, 0) AS n_true,
             |  CASE WHEN COALESCE(r.n_candidates, 0) > 0
             |    THEN CAST((10000 * r.n_true) // r.n_candidates AS BIGINT)
             |    ELSE 0 END AS precision_fp
             |FROM cfg c LEFT JOIN res r USING (bands)
             |ORDER BY bands""".stripMargin)),

    Q("q177_dup_quality_interaction",
      (s, dir) => {
        // Do duplicated documents skew low-quality? Per source: mean
        // q31 quality (exact integer means of per-doc 1e6-floored
        // scores — no float-summation sensitivity) of docs inside
        // fingerprint dup classes vs unique docs, and the delta — the
        // evidence for/against "dedup doubles as a quality filter" on
        // THIS corpus, per source. Shares the q44 fingerprint
        // generator and the q167 score fixed-pointing; one scan,
        // two count-join rollups.
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.fingerprint(col("text"), 5).as("fp"),
            floor(TextOps.qualityScore(col("text")) * 1e6 + 0.5)
              .cast(LongType).as("score_fp"))
          .pin()
        d.join(d.groupBy("fp").agg(count(lit(1)).as("copies")), "fp")
          .select(col("source"), col("score_fp"),
            (col("copies") >= 2).cast(LongType).as("is_dup"))
          .groupBy("source")
          .agg(sum("is_dup").as("n_dup"),
            sum(col("is_dup") * col("score_fp")).as("sq_dup"),
            sum(lit(1L) - col("is_dup")).as("n_uniq"),
            sum((lit(1L) - col("is_dup")) * col("score_fp")).as("sq_uniq"))
          .select(col("source"), col("n_dup"),
            when(col("n_dup") > 0, expr("sq_dup div n_dup")).otherwise(0L)
              .as("mean_q_dup_fp"),
            col("n_uniq"),
            when(col("n_uniq") > 0, expr("sq_uniq div n_uniq")).otherwise(0L)
              .as("mean_q_uniq_fp"))
          .withColumn("delta_fp",
            col("mean_q_uniq_fp") - col("mean_q_dup_fp"))
          .orderBy("source")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source, text,
             |    string_split_regex(trim(text), '\s+') AS t,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, source,
             |    CAST(floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) AS BIGINT) AS score_fp,
             |    CASE WHEN len(t) >= 5
             |      THEN list_transform(generate_series(0, len(t) - 5),
             |             i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))
             |      ELSE [array_to_string(t, ' ')] END AS sh
             |  FROM toks),
             |f AS (SELECT doc_id, source, score_fp,
             |  list_min(list_transform(sh, x -> md5(x))) AS fp FROM q),
             |fc AS (SELECT fp, count(*) AS copies FROM f GROUP BY 1),
             |fl AS (
             |  SELECT f.source, f.score_fp,
             |    CASE WHEN fc.copies >= 2 THEN 1 ELSE 0 END AS is_dup
             |  FROM f JOIN fc USING (fp))
             |SELECT source,
             |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
             |  CASE WHEN sum(is_dup) > 0
             |    THEN CAST(sum(is_dup * score_fp) // sum(is_dup) AS BIGINT)
             |    ELSE 0 END AS mean_q_dup_fp,
             |  CAST(sum(1 - is_dup) AS BIGINT) AS n_uniq,
             |  CASE WHEN sum(1 - is_dup) > 0
             |    THEN CAST(sum((1 - is_dup) * score_fp) // sum(1 - is_dup) AS BIGINT)
             |    ELSE 0 END AS mean_q_uniq_fp,
             |  (CASE WHEN sum(1 - is_dup) > 0
             |    THEN CAST(sum((1 - is_dup) * score_fp) // sum(1 - is_dup) AS BIGINT)
             |    ELSE 0 END)
             |  - (CASE WHEN sum(is_dup) > 0
             |    THEN CAST(sum(is_dup * score_fp) // sum(is_dup) AS BIGINT)
             |    ELSE 0 END) AS delta_fp
             |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q178_unimax_mixture",
      (s, dir) => {
        // UniMax budget allocation (Chung et al., arXiv:2304.09151):
        // distribute a token budget across languages as uniformly as
        // possible subject to a per-language epoch cap — low-resource
        // languages keep their full (1-epoch) corpus, the head language
        // absorbs the surplus at a common water level. UniMax's
        // sequential smallest-first loop IS water-filling, so it has a
        // closed relational form: sort by cap ascending, and a language
        // is capped iff cap·(remaining languages) fits the remaining
        // budget at its turn (a cumsum window); the capped set is a
        // prefix (proved monotone: cap_{i+1}·(S−i) ≥ cap_i·(S−i+1) −
        // cap_i), enforced defensively with a running-min window either
        // way. All arithmetic is long integer division, so DuckDB
        // re-derives the identical allocation. The corpus-sized work is
        // ONE token-count scan; every window runs over the
        // lang-cardinality frame (model-sized — the bounded
        // unpartitioned-window convention of q123/TopNOps). Allocation
        // shared with the q184 ESS comparison via [[unimaxAlloc]].
        unimaxAlloc(s, dir)
          .select(col("lang"), col("n_tokens"), col("cap_tokens"),
            col("capped").cast(LongType).as("capped"),
            col("water_level"), col("alloc_tokens"),
            expr("(10000 * alloc_tokens) div n_tokens").as("epochs_fp"))
          .orderBy("lang")
      },
      Some(s"""WITH $unimaxOracleCtes
             |SELECT lang, n_tokens, cap_tokens, capped, water_level,
             |  alloc_tokens,
             |  CAST((10000 * alloc_tokens) // n_tokens AS BIGINT) AS epochs_fp
             |FROM ua ORDER BY lang""".stripMargin)),

    Q("q179_chao1_coverage",
      (s, dir) => {
        // How many DISTINCT documents has each source NOT shown us yet?
        // Chao1 species-richness estimate (Chao 1984, bias-corrected
        // form) from the fingerprint frequency-of-frequencies: chao1 =
        // D + f1·(f1−1)/(2·(f2+1)), plus Good–Turing sample coverage
        // 1 − f1/n — the capture–recapture math that says whether a
        // source's dedup has converged (coverage → 1, unseen → 0) or
        // more crawling will keep surfacing new content. All integer
        // arithmetic over exact counts, so the oracle is trivially
        // portable. Two aggregations: one shuffle on (source,
        // fingerprint) — map-side combined — then a source-sized
        // rollup; the same scan shape as exact dedup (q34), so the
        // 100 TB cost is the dedup pass it would piggyback on.
        val fc = tp(s, dir, "documents")
          .select(col("source"), TextOps.fingerprint(col("text"), 5).as("fp"))
          .groupBy("source", "fp").agg(count(lit(1)).as("copies"))
        fc.groupBy("source")
          .agg(sum("copies").as("n_docs"),
            count(lit(1)).as("d_distinct"),
            sum((col("copies") === 1).cast(LongType)).as("f1"),
            sum((col("copies") === 2).cast(LongType)).as("f2"))
          .withColumn("unseen_est", expr("(f1 * (f1 - 1)) div (2 * (f2 + 1))"))
          .withColumn("chao1", col("d_distinct") + col("unseen_est"))
          .withColumn("coverage_fp",
            lit(1000000L) - expr("(1000000 * f1) div n_docs"))
          .select("source", "n_docs", "d_distinct", "f1", "f2",
            "chao1", "unseen_est", "coverage_fp")
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, source, CASE WHEN len(toks) >= 5
             |    THEN list_transform(generate_series(0, len(toks) - 5),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |f AS (SELECT doc_id, source,
             |  list_min(list_transform(sh, x -> md5(x))) AS fp FROM s),
             |fc AS (SELECT source, fp, count(*) AS copies FROM f GROUP BY 1, 2),
             |r AS (
             |  SELECT source,
             |    CAST(sum(copies) AS BIGINT) AS n_docs,
             |    CAST(count(*) AS BIGINT) AS d_distinct,
             |    CAST(sum(CASE WHEN copies = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             |    CAST(sum(CASE WHEN copies = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
             |  FROM fc GROUP BY 1)
             |SELECT source, n_docs, d_distinct, f1, f2,
             |  CAST(d_distinct + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS chao1,
             |  CAST((f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS unseen_est,
             |  CAST(1000000 - (1000000 * f1) // n_docs AS BIGINT) AS coverage_fp
             |FROM r ORDER BY source""".stripMargin)),

    Q("q180_quality_rank_calibration",
      (s, dir) => {
        // Are quality scores comparable ACROSS sources? Per-source
        // decile calibration table: ntile(10) within each source
        // (deterministic tiebreak on doc_id), each decile's count and
        // score envelope, plus the GLOBAL percentile its upper boundary
        // maps to — the rank-normalization evidence that says "source
        // A's decile 9 is only global median", i.e. per-source
        // thresholds must be calibrated, not shared, before a corpus-
        // wide quality cut. Scale shape: one scan computes scores; the
        // ntile window partitions BY SOURCE (distributed); the global
        // mapping broadcast-joins the (sources×10)-row boundary frame
        // back to the score frame — one pass, model-sized build side,
        // no global sort anywhere.
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            floor(TextOps.qualityScore(col("text")) * 1e6 + 0.5)
              .cast(LongType).as("score_fp"))
          .pin()
        val tot = d.agg(count(lit(1)).as("n_total"))
        val deciles = d
          .withColumn("decile", ntile(10).over(
            Window.partitionBy("source").orderBy("score_fp", "doc_id")))
          .groupBy("source", "decile")
          .agg(count(lit(1)).as("n_docs"),
            min("score_fp").as("min_q_fp"), max("score_fp").as("max_q_fp"))
        val bounds = deciles
          .select(col("source").as("b_source"), col("decile").as("b_decile"),
            col("max_q_fp").as("bound"))
        val le = d.join(broadcast(bounds), col("score_fp") <= col("bound"))
          .groupBy("b_source", "b_decile")
          .agg(count(lit(1)).as("cnt_le"))
        deciles
          .join(le, col("source") === col("b_source") &&
            col("decile") === col("b_decile"))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("decile").cast(LongType).as("decile"),
            col("n_docs"), col("min_q_fp"), col("max_q_fp"),
            expr("(10000 * cnt_le) div n_total").as("global_pct_fp"))
          .orderBy("source", "decile")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source, text,
             |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |    len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|that)\b')) AS stop_hits,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, source,
             |    CAST(floor((least(n_tokens / 64.0, 1.0) * 0.4
             |      + greatest(1.0 - (n_punct / greatest(length(text), 1.0)) * 4.0, 0.0) * 0.3
             |      + least((stop_hits / greatest(n_tokens, 1.0)) * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5) AS BIGINT) AS score_fp
             |  FROM toks),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM q),
             |dt AS (
             |  SELECT source, score_fp,
             |    ntile(10) OVER (PARTITION BY source ORDER BY score_fp, doc_id) AS decile
             |  FROM q),
             |dec AS (
             |  SELECT source, decile,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(min(score_fp) AS BIGINT) AS min_q_fp,
             |    CAST(max(score_fp) AS BIGINT) AS max_q_fp
             |  FROM dt GROUP BY 1, 2),
             |le AS (
             |  SELECT d.source, d.decile, count(*) AS cnt_le
             |  FROM dec d JOIN q ON q.score_fp <= d.max_q_fp
             |  GROUP BY 1, 2)
             |SELECT d.source, CAST(d.decile AS BIGINT) AS decile, d.n_docs,
             |  d.min_q_fp, d.max_q_fp,
             |  CAST((10000 * le.cnt_le) // t.n_total AS BIGINT) AS global_pct_fp
             |FROM dec d
             |JOIN le ON le.source = d.source AND le.decile = d.decile
             |CROSS JOIN tot t
             |ORDER BY d.source, d.decile""".stripMargin)),

    Q("q181_bbit_minhash",
      (s, dir) => {
        // b-bit MinHash (Li & König, CACM 2011) storage-compression
        // audit: keep only the LOWEST BIT of each of the 32 signature
        // values (32× smaller signatures — the difference between
        // shipping 256 B and 8 B per doc across a 100 TB shuffle) and
        // compare, on the production LSH candidate pairs, the 1-bit
        // estimator Ĵ = max(0, 2·E−1) (E = bit-agreement fraction;
        // the −1 removes the 1/2 chance-collision floor) against the
        // full 32-hash estimate and the exact 3-gram Jaccard — the
        // measured answer to "can the dedup signatures be packed 32×
        // before the estimator noise swamps the 0.5 threshold".
        // Exactness: agreement counts are integers; 10000·(2a−32)/32 =
        // 625·(a−16) exactly, so every output is a pure long. One
        // signature pass (pinned, shared by band join and estimate),
        // candidates never all-pairs, exact verify only on candidates —
        // the q158 discipline with the sig frame joined back twice.
        val docs = tp(s, dir, "documents")
        val sigs = DedupOps.minhashSignatures(
          docs, col("doc_id"), col("text"), 3, 32).pin()
        val sd = docs
          .select(col("doc_id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
          .pin()
        DedupOps.candidatePairsFromSignatures(sigs)
          .select(col("id_a"), col("id_b"))
          .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
          .join(sd.select(col("doc_id").as("id_a"), col("sd").as("sd_a")), "id_a")
          .join(sd.select(col("doc_id").as("id_b"), col("sd").as("sd_b")), "id_b")
          .withColumn("agree32",
            aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
              lit(0L), (acc, v) => acc + v))
          .withColumn("agree1",
            aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x % 2 === y % 2, 1L).otherwise(0L)),
              lit(0L), (acc, v) => acc + v))
          .withColumn("inter", size(array_intersect(col("sd_a"), col("sd_b"))).cast(LongType))
          .withColumn("uni",
            size(col("sd_a")) + size(col("sd_b")) -
              size(array_intersect(col("sd_a"), col("sd_b"))))
          .select(col("id_a"), col("id_b"),
            expr("(10000 * agree32) div 32").as("est32_fp"),
            greatest(lit(0L), lit(625L) * (col("agree1") - 16)).as("est1bit_fp"),
            when(col("uni") > 0, expr("(10000 * inter) div uni"))
              .otherwise(0L).as("exact_fp"))
          .withColumn("err32", abs(col("est32_fp") - col("exact_fp")))
          .withColumn("err1bit", abs(col("est1bit_fp") - col("exact_fp")))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |sd AS (SELECT doc_id, list_distinct(sh) AS sd FROM s),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             |    CAST(len(list_filter(generate_series(1, 32), i -> a.sig[i] = c.sig[i])) AS BIGINT) AS agree32,
             |    CAST(len(list_filter(generate_series(1, 32), i -> a.sig[i] % 2 = c.sig[i] % 2)) AS BIGINT) AS agree1
             |  FROM bk a JOIN bk c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |j AS (
             |  SELECT p.id_a, p.id_b, p.agree32, p.agree1,
             |    CAST(len(list_intersect(sa.sd, sb.sd)) AS BIGINT) AS inter,
             |    CAST(len(sa.sd) + len(sb.sd) - len(list_intersect(sa.sd, sb.sd)) AS BIGINT) AS uni
             |  FROM p JOIN sd sa ON sa.doc_id = p.id_a JOIN sd sb ON sb.doc_id = p.id_b)
             |SELECT id_a, id_b,
             |  CAST((10000 * agree32) // 32 AS BIGINT) AS est32_fp,
             |  CAST(greatest(0, 625 * (agree1 - 16)) AS BIGINT) AS est1bit_fp,
             |  CAST(CASE WHEN uni > 0 THEN (10000 * inter) // uni ELSE 0 END AS BIGINT) AS exact_fp,
             |  CAST(abs((10000 * agree32) // 32
             |    - (CASE WHEN uni > 0 THEN (10000 * inter) // uni ELSE 0 END)) AS BIGINT) AS err32,
             |  CAST(abs(greatest(0, 625 * (agree1 - 16))
             |    - (CASE WHEN uni > 0 THEN (10000 * inter) // uni ELSE 0 END)) AS BIGINT) AS err1bit
             |FROM j ORDER BY id_a, id_b""".stripMargin)),

    Q("q182_multiprobe_lsh",
      (s, dir) => {
        // Multi-probe LSH (Lv et al., VLDB 2007) recall-per-cost eval:
        // one hyperplane table probed at the query's bucket PLUS its
        // `bits` Hamming-1 neighbors, vs the same table single-probe,
        // vs two independent tables — each with measured recall@10
        // against the exact ground truth AND the candidate count the
        // configuration paid for it. Multi-probe is the memory lever:
        // the probe fan-out lives on the broadcast query side, the
        // corpus is bucketed/shuffled ONCE (a second table re-keys and
        // re-ships the corpus) — at 100 TB that is the difference
        // between widening a lookup and doubling the index. Every
        // method's top-k and every candidate count come from ONE pinned
        // candidate frame per method (count + bounded-heap rank share
        // the scan), over the production q39/q49 operators.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val exact = SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .select("qid", "cid").pin()
        def evalOf(name: String, cands0: DataFrame): DataFrame = {
          val cands = cands0.pin()
          val topk = SimilarityOps.rankTopK(
            cands.withColumn("cosine", SimilarityOps.cosineWithNorms(
              col("qvec"), col("cvec"), col("qnorm"), col("cnorm"))),
            "cosine", 10)
          exact.join(topk.select("qid", "cid"), Seq("qid", "cid"), "left_semi")
            .agg(count(lit(1)).as("hits"))
            .crossJoin(broadcast(exact.agg(count(lit(1)).as("possible"))))
            .crossJoin(broadcast(cands.agg(count(lit(1)).as("n_candidates"))))
            .select(lit(name).as("method"), col("hits"), col("possible"),
              expr("(10000 * hits) div possible").as("recall_fp"),
              col("n_candidates"))
        }
        evalOf("lsh_single",
            SimilarityOps.multiProbeCandidates(queries, corpus, embDim, 6,
              probes = 0))
          .unionAll(evalOf("lsh_multiprobe",
            SimilarityOps.multiProbeCandidates(queries, corpus, embDim, 6)))
          .unionAll(evalOf("lsh_2table",
            SimilarityOps.lshCandidates(queries, corpus, embDim, 6, tables = 2)))
          .orderBy("method")
      },
      // exact top-10 + all three candidate derivations composed; the
      // single-probe and multi-probe sets share one bucket CTE, the
      // 2-table set is the q49/q144 union-dedup form
      Some(s"""WITH q AS (
           |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id < 16),
           |corpus AS (
           |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |exs AS (
           |  SELECT q.qid, c.cid, list_cosine_similarity(q.qv, c.v) AS cos_raw
           |  FROM corpus c, q WHERE c.cid <> q.qid),
           |exr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM exs),
           |exk AS (SELECT qid, cid FROM exr WHERE rank <= 10),
           |lb AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
           |  FROM embeddings),
           |lq AS (SELECT vec_id AS qid, embedding AS qvec, bucket AS qb0
           |  FROM lb WHERE vec_id < 16),
           |pm AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS m),
           |lqp AS (SELECT qid, qvec, xor(qb0, m) AS pb FROM lq CROSS JOIN pm),
           |spc AS (
           |  SELECT lq.qid, c.vec_id AS cid, lq.qvec, c.embedding AS cvec
           |  FROM lb c JOIN lq ON c.bucket = lq.qb0 WHERE c.vec_id <> lq.qid),
           |mpc AS (
           |  SELECT lqp.qid, c.vec_id AS cid, lqp.qvec, c.embedding AS cvec
           |  FROM lb c JOIN lqp ON c.bucket = lqp.pb WHERE c.vec_id <> lqp.qid),
           |mb2 AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 8)} AS bucket
           |  FROM embeddings),
           |mq2 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM mb2 WHERE vec_id < 16),
           |ttc AS (
           |  SELECT lq.qid, c.vec_id AS cid, lq.qvec, c.embedding AS cvec
           |  FROM lb c JOIN lq ON c.bucket = lq.qb0 WHERE c.vec_id <> lq.qid
           |  UNION
           |  SELECT mq2.qid, c.vec_id AS cid, mq2.qvec, c.embedding AS cvec
           |  FROM mb2 c JOIN mq2 USING (bucket) WHERE c.vec_id <> mq2.qid),
           |spr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
           |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
           |  FROM spc),
           |mpr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
           |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
           |  FROM mpc),
           |ttr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
           |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
           |  FROM ttc),
           |poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM exk)
           |SELECT method, hits, possible,
           |  CAST((10000 * hits) // possible AS BIGINT) AS recall_fp, n_candidates
           |FROM (
           |  SELECT 'lsh_single' AS method,
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk
           |      JOIN (SELECT qid, cid FROM spr WHERE rank <= 10) USING (qid, cid)) AS hits,
           |    (SELECT CAST(count(*) AS BIGINT) FROM spc) AS n_candidates
           |  UNION ALL SELECT 'lsh_multiprobe',
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk
           |      JOIN (SELECT qid, cid FROM mpr WHERE rank <= 10) USING (qid, cid)),
           |    (SELECT CAST(count(*) AS BIGINT) FROM mpc)
           |  UNION ALL SELECT 'lsh_2table',
           |    (SELECT CAST(count(*) AS BIGINT) FROM exk
           |      JOIN (SELECT qid, cid FROM ttr WHERE rank <= 10) USING (qid, cid)),
           |    (SELECT CAST(count(*) AS BIGINT) FROM ttc)
           |) CROSS JOIN poss ORDER BY method""".stripMargin)),

    Q("q183_vocab_growth",
      (s, dir) => {
        // Heaps'-law type-token growth audit: per source, the EXACT
        // vocabulary-size curve V(n) at 10 document-count checkpoints
        // (docs ordered by doc_id — ingestion order), with per-step new
        // types, new tokens, and the marginal vocabulary yield (new
        // types per token, 1e6 fixed point) — the measured answer to
        // "does more of this source still buy new content, or is it
        // saturating?", the per-source complement of q179's unseen-
        // document estimate (documents vs vocabulary). Everything is
        // exact integer counting — no Heaps' exponent fit, because a
        // cross-engine log() cannot be hash-pinned; the curve IS the
        // evidence. Scale shape: one explode pass → per-(source, term)
        // MIN first-occurrence rank (map-side combined — the corpus-
        // sized shuffle); checkpoints are a broadcast (source×10)-row
        // frame; both checkpoint rollups are one non-equi broadcast
        // join each; the doc-rank window partitions BY SOURCE.
        val ranked = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokens(col("text")).as("toks"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy("doc_id")))
          .withColumn("n_toks", size(col("toks")).cast(LongType))
          .pin()
        val ck = ranked.groupBy("source").agg(max("rk").as("d_docs"))
          .select(col("source").as("ck_source"),
            explode(sequence(lit(1), lit(10))).as("k"), col("d_docs"))
          .withColumn("pos", expr("(k * d_docs) div 10"))
          .select(col("ck_source"), col("k").cast(LongType).as("k"), col("pos"))
        val firstOcc = ranked
          .select(col("source"), col("rk"),
            explode(array_distinct(col("toks"))).as("term"))
          .groupBy("source", "term").agg(min("rk").as("first_rk"))
        val vocab = firstOcc
          .join(broadcast(ck), col("source") === col("ck_source") &&
            col("first_rk") <= col("pos"))
          .groupBy("ck_source", "k").agg(count(lit(1)).as("cum_vocab"))
        val toks = ranked
          .join(broadcast(ck), col("source") === col("ck_source") &&
            col("rk") <= col("pos"))
          .groupBy("ck_source", "k").agg(sum("n_toks").as("cum_tokens"))
        val w = Window.partitionBy("src").orderBy("k")
        ck.join(vocab, Seq("ck_source", "k"), "left")
          .join(toks, Seq("ck_source", "k"), "left")
          .na.fill(0L, Seq("cum_vocab", "cum_tokens"))
          .select(col("ck_source").as("src"), col("k"), col("pos").as("pos_docs"),
            col("cum_tokens"), col("cum_vocab"))
          .withColumn("new_types",
            col("cum_vocab") - lag("cum_vocab", 1, 0L).over(w))
          .withColumn("new_tokens",
            col("cum_tokens") - lag("cum_tokens", 1, 0L).over(w))
          .withColumn("yield_fp",
            expr("(1000000 * new_types) div greatest(1, new_tokens)"))
          .withColumnRenamed("src", "source")
          .orderBy("source", "k")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |rk AS (
             |  SELECT doc_id, source, toks, CAST(len(toks) AS BIGINT) AS n_toks,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
             |  FROM d),
             |ck AS (
             |  SELECT source, CAST(k AS BIGINT) AS k, (k * d_docs) // 10 AS pos
             |  FROM (SELECT source, max(rk) AS d_docs FROM rk GROUP BY 1)
             |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS k)),
             |fo AS (
             |  SELECT source, term, min(rk) AS first_rk
             |  FROM (SELECT source, rk, unnest(list_distinct(toks)) AS term FROM rk)
             |  GROUP BY 1, 2),
             |vc AS (
             |  SELECT ck.source, ck.k, CAST(count(*) AS BIGINT) AS cum_vocab
             |  FROM ck JOIN fo ON fo.source = ck.source AND fo.first_rk <= ck.pos
             |  GROUP BY 1, 2),
             |tc AS (
             |  SELECT ck.source, ck.k, CAST(sum(r.n_toks) AS BIGINT) AS cum_tokens
             |  FROM ck JOIN rk r ON r.source = ck.source AND r.rk <= ck.pos
             |  GROUP BY 1, 2),
             |cur AS (
             |  SELECT ck.source, ck.k, ck.pos AS pos_docs,
             |    coalesce(tc.cum_tokens, 0) AS cum_tokens,
             |    coalesce(vc.cum_vocab, 0) AS cum_vocab
             |  FROM ck LEFT JOIN vc ON vc.source = ck.source AND vc.k = ck.k
             |  LEFT JOIN tc ON tc.source = ck.source AND tc.k = ck.k),
             |del AS (
             |  SELECT source, k, pos_docs, cum_tokens, cum_vocab,
             |    cum_vocab - coalesce(lag(cum_vocab) OVER
             |      (PARTITION BY source ORDER BY k), 0) AS new_types,
             |    cum_tokens - coalesce(lag(cum_tokens) OVER
             |      (PARTITION BY source ORDER BY k), 0) AS new_tokens
             |  FROM cur)
             |SELECT source, k, pos_docs, cum_tokens, cum_vocab,
             |  CAST(new_types AS BIGINT) AS new_types,
             |  CAST(new_tokens AS BIGINT) AS new_tokens,
             |  CAST((1000000 * new_types) // greatest(1, new_tokens) AS BIGINT) AS yield_fp
             |FROM del ORDER BY source, k""".stripMargin)),

    Q("q184_mixture_ess",
      (s, dir) => {
        // Effective sample size of the competing mixture plans — the
        // number that lets you COMPARE q162-style temperature scaling
        // against q178's UniMax against plain proportional sampling on
        // one axis: ESS = (Σw)²/Σw², the effective number of uniformly-
        // weighted languages the plan behaves like (1 = one language
        // dominates, S = perfectly uniform). Computed over 1e6
        // fixed-point SHARES (not raw weights) so every square stays
        // within long range at any corpus size — envelope: per-language
        // token counts ≤ 9.2e12 before the share numerator overflows
        // (the q137 envelope class; pre-divide by 1024 beyond it,
        // share-invariant up to truncation). One token-count scan
        // (shared with q178 via [[unimaxAlloc]]); all three plans are
        // projections of the same lang-cardinality frame.
        val ua = unimaxAlloc(s, dir)
        val plans = ua.select(lit("proportional").as("plan"), col("lang"),
            col("n_tokens").as("w"))
          .unionAll(ua.select(lit("temperature").as("plan"), col("lang"),
            floor(sqrt(col("n_tokens").cast(DoubleType)) * 1000000.0)
              .cast(LongType).as("w")))
          .unionAll(ua.select(lit("unimax").as("plan"), col("lang"),
            col("alloc_tokens").as("w")))
        val tw = plans.groupBy("plan").agg(sum("w").as("tw"))
        plans.join(broadcast(tw), "plan")
          .withColumn("sh", expr("(1000000 * w) div tw"))
          .groupBy("plan")
          .agg(count(lit(1)).as("n_groups"), max("sh").as("max_share_fp"),
            sum("sh").as("ssum"), sum(expr("sh * sh")).as("ssq"))
          .select(col("plan"), col("n_groups"), col("max_share_fp"),
            expr("(10000 * ssum * ssum) div ssq").as("ess_fp"))
          .orderBy("plan")
      },
      Some(s"""WITH $unimaxOracleCtes,
             |plans AS (
             |  SELECT 'proportional' AS plan, lang, n_tokens AS w FROM ua
             |  UNION ALL SELECT 'temperature', lang,
             |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) FROM ua
             |  UNION ALL SELECT 'unimax', lang, alloc_tokens FROM ua),
             |tw AS (SELECT plan, CAST(sum(w) AS BIGINT) AS tw FROM plans GROUP BY 1),
             |shr AS (
             |  SELECT p.plan, (1000000 * p.w) // t.tw AS sh
             |  FROM plans p JOIN tw t USING (plan))
             |SELECT plan, CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(max(sh) AS BIGINT) AS max_share_fp,
             |  CAST((10000 * sum(sh) * sum(sh)) // sum(sh * sh) AS BIGINT) AS ess_fp
             |FROM shr GROUP BY 1 ORDER BY plan""".stripMargin)),

    Q("q185_containment_dup",
      (s, dir) => {
        // Asymmetric containment audit (Broder 1997's containment
        // coefficient c(A,B) = |A∩B|/|A|): symmetric Jaccard
        // structurally under-scores subset relations — a 100-line
        // license header fully contained in a 10k-line file has
        // Jaccard ≈ 0.01 but containment ≈ 1 — so each LSH candidate
        // pair gets both direction-resolved coefficients and a
        // classification: near_dup (Jaccard ≥ 0.8), containment
        // (either direction ≥ 0.8), partial_overlap. Candidates come
        // from the production Jaccard-LSH path, so the report
        // DIAGNOSES asymmetry among Jaccard candidates; pairs whose
        // containment exists WITHOUT signature similarity are q139's
        // (span-level) job by design. Exact verification confined to
        // candidates; one pinned shingle-set frame joined twice.
        val docs = tp(s, dir, "documents")
        val sd = docs
          .select(col("doc_id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("sd"))
          .pin()
        DedupOps.minhashCandidatePairs(docs, col("doc_id"), col("text"))
          .select("id_a", "id_b")
          .join(sd.select(col("doc_id").as("id_a"), col("sd").as("sd_a")), "id_a")
          .join(sd.select(col("doc_id").as("id_b"), col("sd").as("sd_b")), "id_b")
          .withColumn("inter",
            size(array_intersect(col("sd_a"), col("sd_b"))).cast(LongType))
          .withColumn("na", size(col("sd_a")).cast(LongType))
          .withColumn("nb", size(col("sd_b")).cast(LongType))
          .select(col("id_a"), col("id_b"), col("na"), col("nb"),
            expr("(10000 * inter) div (na + nb - inter)").as("jaccard_fp"),
            expr("(10000 * inter) div na").as("cont_ab_fp"),
            expr("(10000 * inter) div nb").as("cont_ba_fp"))
          .withColumn("relation",
            when(col("jaccard_fp") >= 8000, "near_dup")
              .when(greatest(col("cont_ab_fp"), col("cont_ba_fp")) >= 8000,
                "containment")
              .otherwise("partial_overlap"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |sd AS (SELECT doc_id, list_distinct(sh) AS sd FROM s),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |p AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM bk a JOIN bk c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |j AS (
             |  SELECT p.id_a, p.id_b,
             |    CAST(len(sa.sd) AS BIGINT) AS na, CAST(len(sb.sd) AS BIGINT) AS nb,
             |    CAST(len(list_intersect(sa.sd, sb.sd)) AS BIGINT) AS inter
             |  FROM p JOIN sd sa ON sa.doc_id = p.id_a JOIN sd sb ON sb.doc_id = p.id_b)
             |SELECT id_a, id_b, na, nb,
             |  CAST((10000 * inter) // (na + nb - inter) AS BIGINT) AS jaccard_fp,
             |  CAST((10000 * inter) // na AS BIGINT) AS cont_ab_fp,
             |  CAST((10000 * inter) // nb AS BIGINT) AS cont_ba_fp,
             |  CASE WHEN (10000 * inter) // (na + nb - inter) >= 8000 THEN 'near_dup'
             |    WHEN greatest((10000 * inter) // na, (10000 * inter) // nb) >= 8000
             |      THEN 'containment'
             |    ELSE 'partial_overlap' END AS relation
             |FROM j ORDER BY id_a, id_b""".stripMargin)),

    Q("q186_dedup_agreement",
      (s, dir) => {
        // Which dedup methods are REDUNDANT on this corpus? Doc-level
        // duplicate verdicts from all four families — exact
        // (fingerprint class ≥ 2), MinHash (verified LSH candidate with
        // est-Jaccard ≥ 0.5), SimHash (identical 64-bit signature),
        // embedding (same sign-bucket pair with cosine ≥ 0.4, the q40
        // configuration) — crossed into the full agreement matrix:
        // flagged counts per method and the Jaccard overlap of every
        // method pair. High off-diagonal agreement = the cheaper method
        // subsumes the dearer one here; low = the stages catch
        // DIFFERENT duplication and a cascade earns its cost. Every
        // verdict reuses the production operators (q34/q35/q36/q40
        // parameters); the matrix itself is method²-sized. The verdict
        // union is pinned — counts and the pair intersection read one
        // frame; the doc_id/vec_id identity join is the corpus contract
        // (q129's precedent).
        import s.implicits._
        val docs = tp(s, dir, "documents")
        val fps = docs.select(col("doc_id"),
          TextOps.fingerprint(col("text"), 5).as("fp"))
        val exactD = fps
          .join(fps.groupBy("fp").agg(count(lit(1)).as("c")), "fp")
          .filter(col("c") >= 2).select(col("doc_id"))
        val mhD = DedupOps.minhashCandidatePairs(docs, col("doc_id"), col("text"))
          .filter(col("est_jaccard") >= 0.5)
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
        val shSig = DedupOps.simhashSignatures(docs, col("doc_id"), col("text"))
        val shD = shSig
          .join(shSig.groupBy("simhash").agg(count(lit(1)).as("c")), "simhash")
          .filter(col("c") >= 2).select(col("doc_id"))
        val emD = DedupOps.embeddingNearDupPairs(tp(s, dir, "embeddings"),
            col("vec_id"), col("embedding"), threshold = 0.4,
            dim = embDim, signBits = 6)
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
        val v = exactD.select(col("doc_id"), lit("exact").as("m"))
          .unionAll(mhD.select(col("doc_id"), lit("minhash").as("m")))
          .unionAll(shD.select(col("doc_id"), lit("simhash").as("m")))
          .unionAll(emD.select(col("doc_id"), lit("embedding").as("m")))
          .pin()
        val methods = Seq("embedding", "exact", "minhash", "simhash").toDF("m")
        val counts = methods
          .join(v.groupBy("m").agg(count(lit(1)).as("n")), Seq("m"), "left")
          .na.fill(0L, Seq("n"))
        val grid = counts.select(col("m").as("method_a"), col("n").as("n_a"))
          .crossJoin(counts.select(col("m").as("method_b"), col("n").as("n_b")))
          .filter(col("method_a") <= col("method_b"))
        val both = v.select(col("doc_id"), col("m").as("method_a"))
          .join(v.select(col("doc_id"), col("m").as("method_b")), "doc_id")
          .filter(col("method_a") <= col("method_b"))
          .groupBy("method_a", "method_b").agg(count(lit(1)).as("n_both"))
        grid.join(both, Seq("method_a", "method_b"), "left")
          .na.fill(0L, Seq("n_both"))
          .select(col("method_a"), col("method_b"), col("n_a"), col("n_b"),
            col("n_both"),
            when(col("n_a") + col("n_b") - col("n_both") > 0,
              expr("(10000 * n_both) div (n_a + n_b - n_both)"))
              .otherwise(0L).as("agree_jaccard_fp"))
          .orderBy("method_a", "method_b")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |s5 AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 5
             |    THEN list_transform(generate_series(0, len(toks) - 5),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |f AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM s5),
             |fc AS (SELECT fp, count(*) AS c FROM f GROUP BY 1),
             |exact_d AS (SELECT f.doc_id FROM f JOIN fc USING (fp) WHERE fc.c >= 2),
             |s3 AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 3
             |    THEN list_transform(generate_series(0, len(toks) - 3),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |hl AS (SELECT doc_id, list_transform(sh, x -> ${PortableHash.baseSql("x")}) AS hl FROM s3),
             |sig AS (SELECT doc_id, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT doc_id, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |mp AS (
             |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM bk a JOIN bk c
             |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
             |  WHERE len(list_filter(generate_series(1, 32), i -> a.sig[i] = c.sig[i])) / 32.0 >= 0.5),
             |mh_d AS (SELECT id_a AS doc_id FROM mp UNION SELECT id_b FROM mp),
             |tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tk FROM documents),
             |h AS (SELECT doc_id, ${PortableHash.int32Sql("tk", 0)} AS h1,
             |             ${PortableHash.int32Sql("tk", 1)} AS h2 FROM tok),
             |v AS (SELECT doc_id,
             |      ${PortableHash.simhashSumsSql("h1", "h2")}
             |      FROM h GROUP BY doc_id),
             |shh AS (SELECT doc_id, ${PortableHash.simhashPackSql} AS simhash FROM v),
             |shc AS (SELECT simhash, count(*) AS c FROM shh GROUP BY 1),
             |sh_d AS (SELECT shh.doc_id FROM shh JOIN shc USING (simhash) WHERE shc.c >= 2),
             |eb AS (
             |  SELECT vec_id, embedding,
             |    ${Hyperplanes.bucketSql("embedding", embDim, 6)} AS bucket
             |  FROM embeddings),
             |ep AS (
             |  SELECT a.vec_id AS id_a, c.vec_id AS id_b
             |  FROM eb a JOIN eb c USING (bucket)
             |  WHERE a.vec_id < c.vec_id
             |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |          CAST(c.embedding AS DOUBLE[])) >= 0.4),
             |em_d AS (SELECT id_a AS doc_id FROM ep UNION SELECT id_b FROM ep),
             |verd AS (
             |  SELECT doc_id, 'exact' AS m FROM exact_d
             |  UNION ALL SELECT doc_id, 'minhash' FROM mh_d
             |  UNION ALL SELECT doc_id, 'simhash' FROM sh_d
             |  UNION ALL SELECT doc_id, 'embedding' FROM em_d),
             |methods AS (SELECT unnest(['embedding', 'exact', 'minhash', 'simhash']) AS m),
             |cnt AS (
             |  SELECT methods.m, CAST(coalesce(c.n, 0) AS BIGINT) AS n
             |  FROM methods LEFT JOIN
             |    (SELECT m, count(*) AS n FROM verd GROUP BY 1) c USING (m)),
             |grid AS (
             |  SELECT a.m AS method_a, a.n AS n_a, b.m AS method_b, b.n AS n_b
             |  FROM cnt a CROSS JOIN cnt b WHERE a.m <= b.m),
             |bth AS (
             |  SELECT va.m AS method_a, vb.m AS method_b,
             |    CAST(count(*) AS BIGINT) AS n_both
             |  FROM verd va JOIN verd vb USING (doc_id)
             |  WHERE va.m <= vb.m GROUP BY 1, 2)
             |SELECT g.method_a, g.method_b, g.n_a, g.n_b,
             |  CAST(coalesce(b.n_both, 0) AS BIGINT) AS n_both,
             |  CAST(CASE WHEN g.n_a + g.n_b - coalesce(b.n_both, 0) > 0
             |    THEN (10000 * coalesce(b.n_both, 0))
             |      // (g.n_a + g.n_b - coalesce(b.n_both, 0))
             |    ELSE 0 END AS BIGINT) AS agree_jaccard_fp
             |FROM grid g LEFT JOIN bth b
             |  ON b.method_a = g.method_a AND b.method_b = g.method_b
             |ORDER BY g.method_a, g.method_b""".stripMargin)),

    Q("q187_unimax_apply",
      (s, dir) => {
        // Execute the q178 UniMax plan: admit documents per language in
        // doc_id (ingestion) order while the cumulative token count
        // stays within the language's allocation — hard-prefix
        // semantics (the first doc that would overflow the quota is
        // cut, and everything after it with it: the deterministic
        // truncation rule q57 uses). Per-language fill report closes
        // the plan→apply loop the way q169 does for IPF raking.
        // Scale shape: the naive plan is one cumsum window PER
        // LANGUAGE — five corpus-sized partitions, each serialized
        // through one task. This is the q57 two-phase form keyed by
        // doc_id buckets instead: bucket = doc_id div stride is
        // monotone in doc_id, so (bucket, doc_id) IS the global
        // per-language order; the within-bucket cumsum partitions by
        // (lang, bucket) — ~1024 parallel partitions per language —
        // and the only ordered windows left run over the ≤1024-row
        // bucket rollup. The oracle computes the naive global cumsum,
        // so the gate PROVES two-phase ≡ global. The max-doc_id probe
        // is an aggregate, not a collect.
        val ua = unimaxAlloc(s, dir)
          .select(col("lang").as("q_lang"), col("alloc_tokens"))
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        val mx = d.agg(max("doc_id").as("mx"))
        val base = d.crossJoin(broadcast(mx))
          .withColumn("bk", expr("doc_id div greatest(1L, (mx + 1) div 1024)"))
        val wIn = Window.partitionBy("lang", "bk").orderBy("doc_id")
        val withCum = base.withColumn("cumIn", sum("n_tokens").over(wIn))
        val perB = withCum.groupBy("lang", "bk").agg(max("cumIn").as("btok"))
        val wAbove = Window.partitionBy("lang").orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val above = perB
          .withColumn("above", coalesce(sum("btok").over(wAbove), lit(0L)))
          .select("lang", "bk", "above")
        withCum.join(broadcast(above), Seq("lang", "bk"))
          .join(broadcast(ua), col("lang") === col("q_lang"))
          .withColumn("admitted",
            (col("above") + col("cumIn") <= col("alloc_tokens"))
              .cast(LongType))
          .groupBy("lang")
          .agg(min("alloc_tokens").as("alloc_tokens"),
            sum("admitted").as("n_admitted"),
            sum(col("admitted") * col("n_tokens")).as("tokens_admitted"),
            sum(lit(1L) - col("admitted")).as("n_rejected"))
          .withColumn("fill_fp",
            expr("(10000 * tokens_admitted) div greatest(1L, alloc_tokens)"))
          .orderBy("lang")
      },
      Some(s"""WITH $unimaxOracleCtes,
             |d AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM d),
             |adm AS (
             |  SELECT c.lang, c.n_tokens, ua.alloc_tokens,
             |    CASE WHEN c.cum <= ua.alloc_tokens THEN 1 ELSE 0 END AS a
             |  FROM c JOIN ua ON ua.lang = c.lang)
             |SELECT lang,
             |  CAST(min(alloc_tokens) AS BIGINT) AS alloc_tokens,
             |  CAST(sum(a) AS BIGINT) AS n_admitted,
             |  CAST(sum(a * n_tokens) AS BIGINT) AS tokens_admitted,
             |  CAST(sum(1 - a) AS BIGINT) AS n_rejected,
             |  CAST((10000 * sum(a * n_tokens)) // greatest(1, min(alloc_tokens)) AS BIGINT) AS fill_fp
             |FROM adm GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("q188_leakage_safe_splits",
      (s, dir) => {
        // Leakage-safe train/val/test assignment: hash the NEAR-DUP
        // CLASS, not the document — a benchmark answer duplicated into
        // train under a per-doc hash split is exactly the
        // contamination q53 hunts after the fact; splitting by the dup
        // class prevents it BY CONSTRUCTION. The report proves it
        // relationally: for each split under both policies, the doc
        // count and the number of dup pairs with exactly one endpoint
        // in the split — structurally ZERO for the class-keyed policy
        // (same fp ⇒ same hash ⇒ same split), measurably nonzero for
        // the per-doc policy on a corpus with duplicates. Classes are
        // fingerprint classes (the q44 oracle-checkable generator; the
        // LSH-cluster path composes the same assignSplit over
        // resolveClusters ids, spec-covered). One fingerprint scan
        // (pinned) feeds the split labels, both rollups, and the
        // pair self-join; splits are the q51 portable-hash family, so
        // fractions land deterministically in any engine.
        import s.implicits._
        val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        val fps = tp(s, dir, "documents")
          .select(col("doc_id"), TextOps.fingerprint(col("text"), 5).as("fp"))
        val d = DedupOps.assignSplit(
            DedupOps.assignSplit(fps, col("doc_id"), fracs)
              .withColumnRenamed("split", "naive_split"),
            col("fp"), fracs)
          .withColumnRenamed("split", "cluster_split")
          .pin()
        val a = d.select(col("fp"), col("doc_id").as("id_a"),
          col("naive_split").as("nsa"), col("cluster_split").as("csa"))
        val b = d.select(col("fp"), col("doc_id").as("id_b"),
          col("naive_split").as("nsb"), col("cluster_split").as("csb"))
        val pairs = a.join(b, Seq("fp"))
          .filter(col("id_a") < col("id_b")).pin()
        val naiveLeak = pairs.filter(col("nsa") =!= col("nsb"))
          .select(explode(array(col("nsa"), col("nsb"))).as("split"))
          .groupBy("split").agg(count(lit(1)).as("cross_pairs_naive"))
        val clusterLeak = pairs.filter(col("csa") =!= col("csb"))
          .select(explode(array(col("csa"), col("csb"))).as("split"))
          .groupBy("split").agg(count(lit(1)).as("cross_pairs_cluster"))
        Seq("test", "train", "val").toDF("split")
          .join(d.groupBy(col("cluster_split").as("split"))
            .agg(count(lit(1)).as("n_docs_cluster")), Seq("split"), "left")
          .join(d.groupBy(col("naive_split").as("split"))
            .agg(count(lit(1)).as("n_docs_naive")), Seq("split"), "left")
          .join(clusterLeak, Seq("split"), "left")
          .join(naiveLeak, Seq("split"), "left")
          .na.fill(0L, Seq("n_docs_cluster", "n_docs_naive",
            "cross_pairs_cluster", "cross_pairs_naive"))
          .orderBy("split")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
             |sh AS (
             |  SELECT doc_id, CASE WHEN len(toks) >= 5
             |    THEN list_transform(generate_series(0, len(toks) - 5),
             |           i -> array_to_string(list_slice(toks, i + 1, i + 5), ' '))
             |    ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
             |f AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM sh),
             |d AS (
             |  SELECT doc_id, fp,
             |    ${DedupOps.assignSplitSql("doc_id::VARCHAR",
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS naive_split,
             |    ${DedupOps.assignSplitSql("fp",
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS cluster_split
             |  FROM f),
             |p AS (
             |  SELECT a.naive_split AS nsa, b.naive_split AS nsb,
             |    a.cluster_split AS csa, b.cluster_split AS csb
             |  FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id),
             |nl AS (
             |  SELECT split, CAST(count(*) AS BIGINT) AS cross_pairs_naive
             |  FROM (SELECT unnest([nsa, nsb]) AS split FROM p WHERE nsa <> nsb)
             |  GROUP BY 1),
             |cl AS (
             |  SELECT split, CAST(count(*) AS BIGINT) AS cross_pairs_cluster
             |  FROM (SELECT unnest([csa, csb]) AS split FROM p WHERE csa <> csb)
             |  GROUP BY 1),
             |cc AS (SELECT cluster_split AS split, CAST(count(*) AS BIGINT) AS n_docs_cluster
             |  FROM d GROUP BY 1),
             |nc AS (SELECT naive_split AS split, CAST(count(*) AS BIGINT) AS n_docs_naive
             |  FROM d GROUP BY 1),
             |sp AS (SELECT unnest(['test', 'train', 'val']) AS split)
             |SELECT sp.split,
             |  CAST(coalesce(cc.n_docs_cluster, 0) AS BIGINT) AS n_docs_cluster,
             |  CAST(coalesce(nc.n_docs_naive, 0) AS BIGINT) AS n_docs_naive,
             |  CAST(coalesce(cl.cross_pairs_cluster, 0) AS BIGINT) AS cross_pairs_cluster,
             |  CAST(coalesce(nl.cross_pairs_naive, 0) AS BIGINT) AS cross_pairs_naive
             |FROM sp LEFT JOIN cc USING (split) LEFT JOIN nc USING (split)
             |LEFT JOIN cl USING (split) LEFT JOIN nl USING (split)
             |ORDER BY sp.split""".stripMargin)),

    Q("q189_kcore",
      (s, dir) => {
        // 8-core of the purchase graph — the sixth member of the graph
        // family (PageRank centrality, BFS reachability, CC/LPA
        // community, triangles cohesion, k-core ENGAGEMENT TIER): peel
        // nodes of degree < 8 for 4 fixed rounds (cascade included —
        // removing a hub demotes its neighbors), keeping the maximal
        // subgraph where every customer/supplier has ≥ 8 surviving
        // relationships. k = 8 peels a real fringe at every test scale
        // while leaving a non-empty core even on the sf0.001 smoke
        // graph (degrees ~10 there); the fixpoint lands within the 4
        // rounds at all three scales — the convergence evidence the
        // bounded-round contract asks for (the spec pins the worst
        // case on a path graph, which peels exactly 2 nodes/round).
        // Output is each core member with its IN-CORE degree, so the
        // oracle hash-gates the full peeled subgraph, not just a count.
        GraphOps.kCore(purchaseGraph(s, dir), k = 8, rounds = 4)
          .orderBy("id")
      },
      Some(kcoreOracleSql(8, 4))),

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

    Q("q191_anisotropy",
      (s, dir) => {
        // Embedding anisotropy audit (Ethayarajh, EMNLP 2019: contextual
        // embeddings concentrate in a narrow cone): per label cluster,
        // the mean squared cosine of each vector to the corpus's TOP
        // PRINCIPAL DIRECTION (the shared q154 fit — same quantized
        // frame, same driver power iteration). Isotropic data scores
        // ≈ 1/d (156 fp at d=64); a cluster far above it lives along
        // the dominant axis — the warning that raw cosine thresholds
        // (dedup τ, ANN recall) are being inflated by a common
        // component and the corpus wants centering/whitening first.
        // times_isotropic_fp = mean·d reads directly as "×-above-
        // isotropic". Exactness: dot and norms are exact longs; each
        // per-row cos² is ONE identical IEEE double sequence floored
        // to 1e6 (the q164 discipline); cluster means are long sums
        // div counts. One pass over the pinned quantized frame; the
        // direction is model-sized driver state.
        val (qv, v, _) = pcaFit(s, dir)
        val n2v = v.map(x => x * x).sum
        val vLit = array(v.map(lit): _*)
        qv
          .withColumn("dt",
            aggregate(zip_with(col("q"), vLit, (a, b) => a * b),
              lit(0L), (acc, x) => acc + x))
          .withColumn("n2q",
            aggregate(transform(col("q"), x => x * x),
              lit(0L), (acc, x) => acc + x))
          .withColumn("cos2_fp",
            when(col("n2q") > 0 && lit(n2v) > 0,
              floor(col("dt").cast(DoubleType) * col("dt").cast(DoubleType)
                / (col("n2q").cast(DoubleType) * lit(n2v.toDouble))
                * 1000000.0).cast(LongType))
              .otherwise(lit(0L)))
          .groupBy(col("label").cast(LongType).as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum("cos2_fp").as("sum_cos2"),
            max("cos2_fp").as("max_cos2_fp"))
          .withColumn("mean_cos2_fp", expr("sum_cos2 div n_vecs"))
          .withColumn("times_isotropic_fp",
            expr(s"(10000 * $embDim * (sum_cos2 div n_vecs)) div 1000000"))
          .select("label", "n_vecs", "mean_cos2_fp", "max_cos2_fp",
            "times_isotropic_fp")
          .orderBy("label")
      },
      Some(s"""WITH ${pcaOracleCtes(6)},
             |vv AS (SELECT i, v * sg AS v FROM v6 CROSS JOIN sg),
             |n2v AS (SELECT CAST(sum(v * v) AS BIGINT) AS n2v FROM vv),
             |va AS (SELECT list(v ORDER BY i) AS varr FROM vv),
             |pr AS (
             |  SELECT qv.label,
             |    CAST(list_sum(list_transform(generate_series(1, len(q)),
             |      i -> q[i] * varr[i])) AS BIGINT) AS dt,
             |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2q
             |  FROM qv CROSS JOIN va),
             |sc AS (
             |  SELECT label,
             |    CASE WHEN n2q > 0 AND n2v > 0 THEN
             |      CAST(floor(CAST(dt AS DOUBLE) * CAST(dt AS DOUBLE)
             |        / (CAST(n2q AS DOUBLE) * CAST(n2v AS DOUBLE))
             |        * 1000000.0) AS BIGINT)
             |    ELSE 0 END AS cos2_fp
             |  FROM pr CROSS JOIN n2v)
             |SELECT CAST(label AS BIGINT) AS label,
             |  CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(sum(cos2_fp) // count(*) AS BIGINT) AS mean_cos2_fp,
             |  CAST(max(cos2_fp) AS BIGINT) AS max_cos2_fp,
             |  CAST((10000 * $embDim * (sum(cos2_fp) // count(*))) // 1000000 AS BIGINT)
             |    AS times_isotropic_fp
             |FROM sc GROUP BY 1 ORDER BY label""".stripMargin)),

    Q("q192_centering_knn_lift",
      (s, dir) => {
        // Does mean-centering fix what q191 diagnoses? The q173
        // leave-one-out kNN label accuracy, run twice from one query —
        // on the raw vectors and on MEAN-CENTERED ones — with the
        // per-class delta. Centering is the cheapest anisotropy
        // remedy (subtract the common component q191 measures); this
        // is the measured before/after that says whether it actually
        // buys neighbor quality on THIS corpus. Exactness: centering
        // happens in 1e4 fixed point — per-dim means are exact long
        // divisions, centered components are exact longs ≤ ~6e4, so
        // every dot/norm² partial sum (≤ 64·3.6e9 ≈ 2.3e11 ≪ 2^53)
        // is EXACTLY representable in double and the cosine is
        // summation-order-independent in any engine. The mean vector
        // is model-sized driver state (64 longs — the IVF-centroid
        // class); the centered corpus is one more projection of the
        // pinned fixed-point frame.
        val emb = tp(s, dir, "embeddings")
        def accOf(queries: DataFrame, corpus: DataFrame,
                  alias: String): DataFrame = {
          val nn = SimilarityOps.bruteForceTopK(queries, corpus, 10)
          val pred = broadcast(nn.select("qid", "cid"))
            .join(emb.select(col("vec_id").as("cid"),
              col("label").cast(LongType).as("nlabel")), "cid")
            .groupBy("qid", "nlabel").agg(count(lit(1)).as("v"))
            .groupBy("qid")
            .agg(max(struct(col("v"), (lit(0L) - col("nlabel")).as("negl"))).as("m"))
            .select(col("qid"), (lit(0L) - col("m").getField("negl")).as("pred"))
          emb.filter(col("vec_id") < 64)
            .select(col("vec_id").as("qid"), col("label").cast(LongType).as("label"))
            .join(broadcast(pred), "qid")
            .groupBy("label")
            .agg(count(lit(1)).as(s"n_$alias"),
              sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as(alias))
        }
        val rawQ = emb.filter(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val rawC = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val fx = emb.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))")
            .as("fx")).pin()
        val mRows = fx.select(posexplode(col("fx")).as(Seq("i", "v")))
          .groupBy("i").agg(sum("v").as("sv"))
          .crossJoin(broadcast(fx.agg(count(lit(1)).as("nv"))))
          .select(col("i"), expr("sv div nv").as("m")).collect()
        val mArr = Array.ofDim[Long](embDim)
        mRows.foreach(r => mArr(r.getInt(0)) = r.getLong(1))
        val mLit = array(mArr.map(lit): _*)
        val cent = fx.withColumn("cv",
          zip_with(col("fx"), mLit, (a, b) => (a - b).cast(DoubleType)))
        val cenQ = cent.filter(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("cv").as("qvec"))
        val cenC = cent.select(col("vec_id").as("cid"), col("cv").as("cvec"))
        accOf(rawQ, rawC, "c_raw")
          .join(accOf(cenQ, cenC, "c_cen"), Seq("label"))
          .select(col("label"), col("n_c_raw").as("n"),
            expr("(10000 * c_raw) div n_c_raw").as("acc_raw_fp"),
            expr("(10000 * c_cen) div n_c_cen").as("acc_centered_fp"))
          .withColumn("delta_fp",
            col("acc_centered_fp") - col("acc_raw_fp"))
          .orderBy("label")
      },
      Some("""WITH q AS (
             |  SELECT vec_id AS qid, embedding AS qvec,
             |    CAST(label AS BIGINT) AS qlabel
             |  FROM embeddings WHERE vec_id < 64),
             |scored AS (
             |  SELECT q.qid, c.vec_id AS cid,
             |    list_cosine_similarity(CAST(q.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
             |  FROM embeddings c, q WHERE c.vec_id <> q.qid),
             |ranked AS (
             |  SELECT qid, cid,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
             |  FROM scored),
             |nl AS (
             |  SELECT r.qid, CAST(e.label AS BIGINT) AS nlabel
             |  FROM ranked r JOIN embeddings e ON e.vec_id = r.cid
             |  WHERE r.rank <= 10),
             |votes AS (SELECT qid, nlabel, count(*) AS v FROM nl GROUP BY 1, 2),
             |pred AS (
             |  SELECT qid, nlabel AS pred FROM (
             |    SELECT qid, nlabel,
             |      row_number() OVER (PARTITION BY qid ORDER BY v DESC, nlabel) AS rn
             |    FROM votes) WHERE rn = 1),
             |raw_acc AS (
             |  SELECT q.qlabel AS label, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN p.pred = q.qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
             |  FROM q JOIN pred p USING (qid) GROUP BY 1),
             |fx AS (
             |  SELECT vec_id, CAST(label AS BIGINT) AS label,
             |    list_transform(embedding, x -> CAST(floor(x::DOUBLE * 10000.0) AS BIGINT)) AS fx
             |  FROM embeddings),
             |nn2 AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM fx),
             |mv AS (
             |  SELECT i, CAST(sum(v) AS BIGINT) AS sv
             |  FROM (SELECT unnest(generate_series(1, len(fx))) AS i, unnest(fx) AS v FROM fx)
             |  GROUP BY 1),
             |mm AS (SELECT i, sv // nv AS m FROM mv CROSS JOIN nn2),
             |ma AS (SELECT list(m ORDER BY i) AS marr FROM mm),
             |cen AS (
             |  SELECT vec_id, label,
             |    list_transform(generate_series(1, len(fx)),
             |      i -> CAST(fx[i] - marr[i] AS DOUBLE)) AS cv
             |  FROM fx CROSS JOIN ma),
             |cq AS (SELECT vec_id AS qid, label AS qlabel, cv AS qvec
             |  FROM cen WHERE vec_id < 64),
             |csc AS (
             |  SELECT cq.qid, c.vec_id AS cid,
             |    list_cosine_similarity(cq.qvec, c.cv) AS cos_raw
             |  FROM cen c, cq WHERE c.vec_id <> cq.qid),
             |crk AS (
             |  SELECT qid, cid,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rank
             |  FROM csc),
             |cnl AS (
             |  SELECT r.qid, CAST(e.label AS BIGINT) AS nlabel
             |  FROM crk r JOIN embeddings e ON e.vec_id = r.cid
             |  WHERE r.rank <= 10),
             |cvt AS (SELECT qid, nlabel, count(*) AS v FROM cnl GROUP BY 1, 2),
             |cpr AS (
             |  SELECT qid, nlabel AS pred FROM (
             |    SELECT qid, nlabel,
             |      row_number() OVER (PARTITION BY qid ORDER BY v DESC, nlabel) AS rn
             |    FROM cvt) WHERE rn = 1),
             |cen_acc AS (
             |  SELECT cq.qlabel AS label, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN p.pred = cq.qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
             |  FROM cq JOIN cpr p USING (qid) GROUP BY 1)
             |SELECT r.label, r.n,
             |  CAST((10000 * r.n_correct) // r.n AS BIGINT) AS acc_raw_fp,
             |  CAST((10000 * c.n_correct) // c.n AS BIGINT) AS acc_centered_fp,
             |  CAST((10000 * c.n_correct) // c.n - (10000 * r.n_correct) // r.n AS BIGINT)
             |    AS delta_fp
             |FROM raw_acc r JOIN cen_acc c USING (label)
             |ORDER BY r.label""".stripMargin)),

    Q("q193_ivf_nprobe_curve",
      (s, dir) => {
        // The IVF operating curve: recall@10 at nprobe ∈ {1, 2, 4, 8}
        // of a 16-list index against the exact ground truth, plus the
        // corpus fraction each setting scans (625·nprobe fp) — the
        // sweep that picks the latency/recall point BEFORE committing
        // a 100 TB serving config (q144 reports the single production
        // point; this is the dial around it). All four arms read the
        // SAME cached IVF fit (the q41/q70/q129/q134/q146/q164 index —
        // fit once, probed four ways) and the same pinned exact top-k;
        // each arm is a semi-join + two broadcast count rollups.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val exact = SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .select("qid", "cid").pin()
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, 16)
        def armOf(np: Int): DataFrame =
          exact.join(SimilarityOps.ivfTopK(queries, model, 10, np)
              .select("qid", "cid"), Seq("qid", "cid"), "left_semi")
            .agg(count(lit(1)).as("hits"))
            .crossJoin(broadcast(exact.agg(count(lit(1)).as("possible"))))
            .select(lit(np.toLong).as("nprobe"), col("hits"), col("possible"),
              expr("(10000 * hits) div possible").as("recall_fp"),
              lit(625L * np).as("probed_fp"))
        Seq(1, 2, 4, 8).map(armOf).reduce(_ unionAll _).orderBy("nprobe")
      },
      // the full IVF fit re-derived once; probe ranks computed WITHOUT
      // the fixed rn<=4 cut so each arm slices its own depth
      Some(s"""$ivfOracleCtes,
           |probeAll AS (
           |  SELECT q.qid, k.kid,
           |    row_number() OVER (PARTITION BY q.qid
           |      ORDER BY list_dot_product(q.qv, k.c) DESC, k.kid ASC) AS prn
           |  FROM q CROSS JOIN cent2 k),
           |exs AS (
           |  SELECT q.qid, c.cid, list_cosine_similarity(q.qv, c.v) AS cos_raw
           |  FROM corpus c, q WHERE c.cid <> q.qid),
           |exr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM exs),
           |exk AS (SELECT qid, cid FROM exr WHERE rank <= 10),
           |poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM exk),
           |${Seq(1, 2, 4, 8).map { np =>
             s"""ivs$np AS (
                |  SELECT q.qid, a.cid, list_cosine_similarity(q.qv, a.v) AS cos_raw
                |  FROM (SELECT qid, kid FROM probeAll WHERE prn <= $np) p
                |  JOIN q ON q.qid = p.qid JOIN asgF a ON a.kid = p.kid
                |  WHERE a.cid <> q.qid),
                |ivr$np AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
                |    ORDER BY cos_raw DESC, cid) AS rank FROM ivs$np),
                |ivk$np AS (SELECT qid, cid FROM ivr$np WHERE rank <= 10)""".stripMargin
           }.mkString(",\n")}
           |SELECT nprobe, hits, possible,
           |  CAST((10000 * hits) // possible AS BIGINT) AS recall_fp,
           |  CAST(625 * nprobe AS BIGINT) AS probed_fp
           |FROM (
           |${Seq(1, 2, 4, 8).map { np =>
             s"""  SELECT CAST($np AS BIGINT) AS nprobe,
                |    (SELECT CAST(count(*) AS BIGINT)
                |     FROM exk JOIN ivk$np USING (qid, cid)) AS hits""".stripMargin
           }.mkString("\n  UNION ALL\n")}
           |) CROSS JOIN poss ORDER BY nprobe""".stripMargin))
  )

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
