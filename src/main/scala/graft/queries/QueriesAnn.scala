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

/** Similarity & embedding audit: brute-force/LSH/IVF/PQ ANN,
  * quantization, PCA power iteration, anisotropy, recall curves.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesAnn {

  val qs: Seq[Q] = Seq(

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

    Q("q40_embedding_neardup",
      (s, dir) => embNearDupPairs(s, dir, bits = 6)
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
        // cluster totals and cluster-frequency ride on the ct rows via
        // windows (the q138/q150 discipline): two rollup aggregations +
        // two joins gone, and the pinned ct feeds 2 derivations instead
        // of 4 (tot was re-rolled for ncf too). Values identical —
        // every (cluster, term) key exists in its own rollup, so the
        // old inner joins dropped nothing.
        val ncf = ct.select(col("cluster")).distinct().agg(count(lit(1)).as("nc"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("score_fp").desc, col("term"))
        ct.withColumn("tot_c", sum("cnt").over(Window.partitionBy("cluster")))
          .withColumn("cdf", count(lit(1)).over(Window.partitionBy("term")))
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
        // precedent); encoding is the same argmin projection. ADC is
        // join-free: the corpus carries its 4 codes as one array, each
        // query's 4×16 distance table broadcasts as 4 kid-indexed
        // arrays, and adist is 4 element_at lookups — no (s, code)
        // shuffle, no (qid, cid)-grouped re-aggregation. Both rankings
        // run through the bounded-heap top-k aggregate (k·16 B per
        // group per partition through the shuffle) instead of a
        // row_number window, whose 16-partition full sort was the
        // superlinear term at the ×1000 rehearsal (exp 1.31, 76 s
        // warm at 2M vectors; this shape re-measured exp < 1). Both
        // orderings are `dist ASC, cid ASC` ≡ `-dist DESC, id ASC`,
        // and the negated longs stay exact in double (≤ 64·254²).
        // (Fit shared with the distortion profile q171 via
        // [[pqFitted]].)
        val (qv2, sub, cent) = pqFitted(s, dir)
        // per-subspace literal-codebook argmin over a slice of the
        // pinned q — the same zip_with arithmetic pqKidExpr applies to
        // the exploded subq rows (subq IS slice(q, s·16+1, 16)), so the
        // assigned codes are bit-identical to the aF frame's
        def distToSlice(sb: Int, cv: Array[Long]): Column = expr(
          s"""aggregate(zip_with(slice(q, ${sb * 16 + 1}, 16),
            array(${cv.map(_ + "L").mkString(",")}),
            (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)""")
        def kidFor(sb: Int): Column =
          array_min(array(cent(sb).zipWithIndex.map { case (cv, j) =>
            struct(distToSlice(sb, cv).as("d"), lit(j).as("k"))
          }: _*)).getField("k")
        val codes = qv2.select(col("vec_id").as("cid"),
          array((0 to 3).map(kidFor): _*).as("kids"))
        def distArrFor(sb: Int): Column =
          array(cent(sb).map(cv => pqDistTo(cv)): _*)
        // one row per query: t0..t3 are the kid-indexed code-distance
        // tables (sub has exactly one row per (vec_id, s), so the
        // ignoreNulls first() is deterministic)
        val qtab = sub.filter(col("vec_id") < 16)
          .withColumn("da",
            when(col("s") === 0, distArrFor(0)).when(col("s") === 1, distArrFor(1))
              .when(col("s") === 2, distArrFor(2)).otherwise(distArrFor(3)))
          .groupBy(col("vec_id").as("qid"))
          .agg(
            first(when(col("s") === 0, col("da")), ignoreNulls = true).as("t0"),
            first(when(col("s") === 1, col("da")), ignoreNulls = true).as("t1"),
            first(when(col("s") === 2, col("da")), ignoreNulls = true).as("t2"),
            first(when(col("s") === 3, col("da")), ignoreNulls = true).as("t3"))
        val adc = codes.crossJoin(broadcast(qtab))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            (element_at(col("t0"), col("kids")(0) + 1) +
              element_at(col("t1"), col("kids")(1) + 1) +
              element_at(col("t2"), col("kids")(2) + 1) +
              element_at(col("t3"), col("kids")(3) + 1)).as("adist"))
        val qq = qv2.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("q").as("qarr"))
        val exact = qv2.join(broadcast(qq), col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("cid"),
            expr("""aggregate(zip_with(q, qarr, (a, b) -> (a - b) * (a - b)),
              0L, (acc, v) -> acc + v)""").as("ed"))
        val topA = SimilarityOps.rankTopK(
            adc.withColumn("nd", -col("adist").cast(DoubleType)), "nd", 10)
          .select("qid", "cid")
        val topE = SimilarityOps.rankTopK(
            exact.withColumn("nd", -col("ed").cast(DoubleType)), "nd", 10)
          .select("qid", "cid")
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
        // fit once, probed four ways), the same pinned exact top-k,
        // and ONE shared scored-candidate frame (SimilarityOps
        // .ivfArmBoard — the probe join + cosines run once at the
        // deepest depth, each arm slices by probe rank; probed_fp =
        // 10000·np/nlist = 625·np at nlist 16, the literal the
        // pre-board inline arms emitted).
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val exact = SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .select("qid", "cid").pin()
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, 16)
        SimilarityOps.ivfArmBoard(exact, queries, model, 10, Seq(1, 2, 4, 8))
          .orderBy("nprobe")
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
           |) CROSS JOIN poss ORDER BY nprobe""".stripMargin)),

    Q("q196_ann_autotune",
      (s, dir) => {
        // Recall-TARGETED auto-tuning — the step that ACTS on q193's
        // diagnostic curve (the round-10 verdict's gap: "the
        // diagnostics exist but nothing acts on them"): declare
        // recall@10 ≥ 70 % and let SimilarityOps.tuneIvfNprobe measure
        // the sampled curve (same 16 exact-truth anchors, same cached
        // IVF fit as q41/q144/q193) and pick the CHEAPEST nprobe
        // meeting the target — nprobe = nlist (= 16) is the exact
        // fallback, so the target is always reachable. The scoreboard
        // is the output: every arm's measured recall, the scanned-
        // corpus fraction it pays, and the chosen flag — what a
        // deployment persists next to the index as its serving config.
        // ivfTopKForRecall is the documented default entry for callers
        // that declare targets rather than probe depths.
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val model = SimilarityOps.ivfFitCached(s"embeddings:$dir", corpus, 16)
        SimilarityOps.tuneIvfNprobe(queries, corpus, model, 10,
            targetRecallFp = 7000L, candidates = Seq(1, 2, 4, 8, 16))
          .select(col("nprobe"), col("hits"), col("possible"),
            col("recall_fp"), col("probed_fp"),
            col("chosen").cast(LongType).as("chosen"),
            lit(7000L).as("target_fp"))
          .orderBy("nprobe")
      },
      // q193's unrolled fit + per-depth probe arms, extended with the
      // exact nprobe=16 arm and the cheapest-meeting-target selection
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
           |${Seq(1, 2, 4, 8, 16).map { np =>
             s"""tns$np AS (
                |  SELECT q.qid, a.cid, list_cosine_similarity(q.qv, a.v) AS cos_raw
                |  FROM (SELECT qid, kid FROM probeAll WHERE prn <= $np) p
                |  JOIN q ON q.qid = p.qid JOIN asgF a ON a.kid = p.kid
                |  WHERE a.cid <> q.qid),
                |tnr$np AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
                |    ORDER BY cos_raw DESC, cid) AS rank FROM tns$np),
                |tnk$np AS (SELECT qid, cid FROM tnr$np WHERE rank <= 10)""".stripMargin
           }.mkString(",\n")},
           |board AS (
           |  SELECT nprobe, hits, possible,
           |    CAST((10000 * hits) // possible AS BIGINT) AS recall_fp,
           |    CAST(625 * nprobe AS BIGINT) AS probed_fp
           |  FROM (
           |${Seq(1, 2, 4, 8, 16).map { np =>
             s"""    SELECT CAST($np AS BIGINT) AS nprobe,
                |      (SELECT CAST(count(*) AS BIGINT)
                |       FROM exk JOIN tnk$np USING (qid, cid)) AS hits""".stripMargin
           }.mkString("\n    UNION ALL\n")}
           |  ) CROSS JOIN poss),
           |pick AS (
           |  SELECT min(CASE WHEN recall_fp >= 7000 THEN nprobe END) AS picked,
           |    max(nprobe) AS deepest FROM board)
           |SELECT nprobe, hits, possible, recall_fp, probed_fp,
           |  CAST(CASE WHEN nprobe = COALESCE(picked, deepest)
           |    THEN 1 ELSE 0 END AS BIGINT) AS chosen,
           |  CAST(7000 AS BIGINT) AS target_fp
           |FROM board CROSS JOIN pick ORDER BY nprobe""".stripMargin)),

    Q("q198_lsh_autotune",
      (s, dir) => {
        // q196's recall-targeted selection applied to the OTHER index
        // family's dial: sign-LSH table count. tuneLshTables measures
        // recall@10 per candidate table count against the exact truth
        // on the 16 sampled anchors (extra hyperplane families buy
        // recall at proportional candidate cost) and flags the
        // cheapest count meeting the declared 5% fixed-point target —
        // the deepest candidate as fallback when none does (unlike
        // IVF, LSH has no exact arm, so the fallback CAN miss the
        // target; the emitted recall makes that visible, which is the
        // point of a measured scoreboard).
        val emb = tp(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.tuneLshTables(queries, corpus, 10,
            dim = embDim, bits = 6, targetRecallFp = 500L,
            candidates = Seq(1, 2))
          .select(col("tables"), col("hits"), col("possible"),
            col("recall_fp"), col("chosen").cast(LongType).as("chosen"),
            lit(500L).as("target_fp"))
          .orderBy("tables")
      },
      // q144's 1-table and 2-table LSH arms + exact truth, reduced to
      // the scoreboard with the cheapest-meeting-target selection
      Some(s"""WITH lb AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 7)} AS bucket
           |  FROM embeddings),
           |lq AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM lb WHERE vec_id < 16),
           |lsc AS (
           |  SELECT lq.qid, c.vec_id AS cid,
           |    list_cosine_similarity(CAST(lq.qvec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
           |  FROM lb c JOIN lq USING (bucket) WHERE c.vec_id <> lq.qid),
           |lr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM lsc),
           |lk AS (SELECT qid, cid FROM lr WHERE rank <= 10),
           |mb2 AS (
           |  SELECT vec_id, embedding,
           |    ${Hyperplanes.bucketSql("embedding", embDim, 6, seed = 8)} AS bucket
           |  FROM embeddings),
           |mq2 AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM mb2 WHERE vec_id < 16),
           |mc AS (
           |  SELECT lq.qid, c.vec_id AS cid, lq.qvec, c.embedding AS cvec
           |  FROM lb c JOIN lq USING (bucket) WHERE c.vec_id <> lq.qid
           |  UNION
           |  SELECT mq2.qid, c.vec_id AS cid, mq2.qvec, c.embedding AS cvec
           |  FROM mb2 c JOIN mq2 USING (bucket) WHERE c.vec_id <> mq2.qid),
           |mr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
           |    list_cosine_similarity(CAST(qvec AS DOUBLE[]), CAST(cvec AS DOUBLE[])) DESC, cid) AS rank
           |  FROM mc),
           |mk AS (SELECT qid, cid FROM mr WHERE rank <= 10),
           |exs AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_raw
           |  FROM embeddings c, embeddings q
           |  WHERE q.vec_id < 16 AND c.vec_id <> q.vec_id),
           |exr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos_raw DESC, cid) AS rank FROM exs),
           |exk AS (SELECT qid, cid FROM exr WHERE rank <= 10),
           |poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM exk),
           |board AS (
           |  SELECT tables, hits, possible,
           |    CAST((10000 * hits) // possible AS BIGINT) AS recall_fp
           |  FROM (
           |    SELECT CAST(1 AS BIGINT) AS tables,
           |      (SELECT CAST(count(*) AS BIGINT) FROM exk JOIN lk USING (qid, cid)) AS hits
           |    UNION ALL
           |    SELECT CAST(2 AS BIGINT),
           |      (SELECT CAST(count(*) AS BIGINT) FROM exk JOIN mk USING (qid, cid))
           |  ) CROSS JOIN poss),
           |pick AS (
           |  SELECT min(CASE WHEN recall_fp >= 500 THEN tables END) AS picked,
           |    max(tables) AS deepest FROM board)
           |SELECT tables, hits, possible, recall_fp,
           |  CAST(CASE WHEN tables = COALESCE(picked, deepest)
           |    THEN 1 ELSE 0 END AS BIGINT) AS chosen,
           |  CAST(500 AS BIGINT) AS target_fp
           |FROM board CROSS JOIN pick ORDER BY tables""".stripMargin)),

    Q("q207_ivf_drift_refit",
      (s, dir) => {
        // The IVF observe→react maintenance loop, driver-gated END TO
        // END (FrameMaintenance.rollForwardIvfRecallTargeted): the
        // corpus DRIFTS — every embedding is cyclically rotated by its
        // own id and sign-flipped per (id, coordinate) bit, an exact
        // per-vector isometry (the ScaleUp decorrelation trick, made
        // engine-portable) that destroys cross-vector neighborhoods —
        // the frozen fit's recall is measured on the rolled inverted
        // file, the miss triggers the k-means re-fit, and the re-fit
        // index is what publishes. The oracle replays BOTH fits (the
        // frozen one over the original corpus, the re-fit over the
        // drifted one), both recall measurements at the deepest probe,
        // and the decision itself; the output pins the decision record
        // AND the per-centroid occupancy of whichever index won. The
        // hash can only match if the two engines agree on every Lloyd
        // round, the roll, the recall arithmetic, and the trigger.
        val old = tp(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val mut = old.withColumn("cvec", expr(
          """transform(sequence(0, 63), i ->
            |  cast(element_at(cvec, cast((i + cid) % 64 as int) + 1) *
            |       cast(1 - 2 * (shiftright(cid, cast(i % 16 as int)) % 2)
            |            as float) as float))""".stripMargin))
        val sample = mut.filter(col("cid") < 16)
          .select(col("cid").as("qid"), col("cvec").as("qvec"))
        val (frames, dec) =
          graft.etl.FrameMaintenance.rollForwardIvfRecallTargeted(
            s, s"embeddings:$dir", s"q207new:$dir", old, mut, sample,
            k = 10, targetRecallFp = 9000L, nlist = 16, iters = 2,
            // the decision consumes only the DEEPEST arm; shallower
            // arms would triple the probe joins for output nobody reads
            candidates = Seq(4))
        frames.toMap.apply("ivf-16-2-assigned")
          .groupBy("centroid_id")
          .agg(count(lit(1)).as("n_vecs"))
          .select(col("centroid_id").cast(LongType).as("centroid_id"),
            col("n_vecs"),
            lit(if (dec.refit) 1L else 0L).as("refit"),
            lit(dec.frozenRecallFp).as("frozen_recall_fp"),
            lit(dec.finalRecallFp).as("final_recall_fp"))
          .orderBy("centroid_id")
      },
      Some(s"""WITH ${ivfFitCtes(
               "SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")},
             |mut AS MATERIALIZED (
             |  SELECT cid, list_transform(generate_series(0, 63), i ->
             |    v[((i + cid) % 64) + 1] *
             |    CASE WHEN ((cid >> (i % 16)) & 1) = 1 THEN -1.0 ELSE 1.0 END) AS v
             |  FROM corpus),
             |${ivfFitCtes("SELECT cid, v FROM mut", "m")},
             |qs AS (SELECT cid AS qid, v AS qv FROM mut WHERE cid < 16),
             |exact AS MATERIALIZED (
             |  SELECT qid, cid FROM (
             |    SELECT q.qid, c.cid,
             |      row_number() OVER (PARTITION BY q.qid
             |        ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.cid) AS rn
             |    FROM qs q CROSS JOIN mut c WHERE c.cid <> q.qid) t
             |  WHERE rn <= 10),
             |poss AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM exact),
             |fasg AS MATERIALIZED (
             |  SELECT cid, v, kid FROM (
             |    SELECT c.cid, c.v, k.kid,
             |      row_number() OVER (PARTITION BY c.cid
             |        ORDER BY list_dot_product(c.v, k.c) DESC, k.kid DESC) AS rn
             |    FROM mut c CROSS JOIN cent2 k) t WHERE rn = 1),
             |fprobe AS (
             |  SELECT qid, kid FROM (
             |    SELECT q.qid, k.kid,
             |      row_number() OVER (PARTITION BY q.qid
             |        ORDER BY list_dot_product(q.qv, k.c) DESC, k.kid ASC) AS rn
             |    FROM qs q CROSS JOIN cent2 k) t WHERE rn <= 4),
             |fivf AS (
             |  SELECT qid, cid FROM (
             |    SELECT q.qid, a.cid,
             |      row_number() OVER (PARTITION BY q.qid
             |        ORDER BY list_cosine_similarity(q.qv, a.v) DESC, a.cid) AS rn
             |    FROM fprobe p JOIN qs q USING (qid) JOIN fasg a ON a.kid = p.kid
             |    WHERE a.cid <> q.qid) t WHERE rn <= 10),
             |frec AS MATERIALIZED (
             |  SELECT CAST((10000 * (SELECT count(*) FROM exact JOIN fivf USING (qid, cid)))
             |    // possible AS BIGINT) AS r FROM poss),
             |dec AS MATERIALIZED (SELECT (r < 9000) AS refit FROM frec),
             |bprobe AS (
             |  SELECT qid, kid FROM (
             |    SELECT q.qid, k.kid,
             |      row_number() OVER (PARTITION BY q.qid
             |        ORDER BY list_dot_product(q.qv, k.c) DESC, k.kid ASC) AS rn
             |    FROM qs q CROSS JOIN mcent2 k) t WHERE rn <= 4),
             |bivf AS (
             |  SELECT qid, cid FROM (
             |    SELECT q.qid, a.cid,
             |      row_number() OVER (PARTITION BY q.qid
             |        ORDER BY list_cosine_similarity(q.qv, a.v) DESC, a.cid) AS rn
             |    FROM bprobe p JOIN qs q USING (qid) JOIN masgF a ON a.kid = p.kid
             |    WHERE a.cid <> q.qid) t WHERE rn <= 10),
             |brec AS MATERIALIZED (
             |  SELECT CAST((10000 * (SELECT count(*) FROM exact JOIN bivf USING (qid, cid)))
             |    // possible AS BIGINT) AS r FROM poss),
             |finalasg AS (
             |  SELECT cid, kid FROM masgF WHERE (SELECT refit FROM dec)
             |  UNION ALL
             |  SELECT cid, kid FROM fasg WHERE NOT (SELECT refit FROM dec))
             |SELECT CAST(kid AS BIGINT) AS centroid_id,
             |  CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST((SELECT CASE WHEN refit THEN 1 ELSE 0 END FROM dec) AS BIGINT) AS refit,
             |  CAST((SELECT r FROM frec) AS BIGINT) AS frozen_recall_fp,
             |  CAST((SELECT CASE WHEN (SELECT refit FROM dec)
             |    THEN (SELECT r FROM brec) ELSE (SELECT r FROM frec) END) AS BIGINT)
             |    AS final_recall_fp
             |FROM finalasg GROUP BY kid ORDER BY centroid_id""".stripMargin)),
  )
}
