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

/** Classifier training/scoring/eval: LR quality classifiers,
  * calibration, AUC, confusion, DSIR, preference pairs, hard negatives.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesModel {

  val qs: Seq[Q] = Seq(

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
        // ONE distribution rollup instead of two: r_b and t_b come out
        // of the same bucket aggregation (t_b as a conditional sum —
        // null exactly when the old raw⟕tgt left join missed, i.e. a
        // bucket with no en rows), so the cached c feeds one scan
        // instead of two per reference and the raw⟕tgt shuffle join
        // disappears (guide §2.4). dist is bucket-sized (≤B rows),
        // pinned so the totals rollup doesn't re-derive it from c.
        val dist = c.groupBy("bkt").agg(
          sum("cnt").as("r_b"),
          sum(when(col("lang") === "en", col("cnt"))).as("t_b"))
          .pin()
        val totals = dist.agg(sum("r_b").as("rt"), sum("t_b").as("tt"))
        val w = dist
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
        // pinned: the fit is a lazy 4-iteration chain since the
        // single-plan rewrite, and wDf is referenced twice below
        // (confusion join + final output join) — the pin keeps the
        // chain to one execution, as the old collect-loop had
        val wDf = ClassifierOps.fitGroupedHardSigmoidLR(
          f, "source", zCols, "y", iters = 4, lr = 2.0).pin()
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
  )
}
