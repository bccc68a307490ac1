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

/** Text analysis & search: language ID, quality scores, tokenization,
  * BPE, LM scoring, TF-IDF/BM25/RRF retrieval, chunking.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesText {

  val qs: Seq[Q] = Seq(

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

    // ── Deduplication (training-pipeline ext) ─────────────────────────,

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

    Q("q76_bpe_merges",
      (s, dir) => BpeOps.bpeMerges(tp(s, dir, "documents"), col("text"),
        rounds = 4, cacheKey = Some(s"documents:$dir")),
      // the oracle unrolls the SAME four merge rounds as CTE stages;
      // literal replace is greedy left-to-right in both engines, so the
      // learned merge tables must agree exactly
      Some(BpeOps.oracleSql(4))),

    Q("q82_bpe_encode",
      (s, dir) => BpeOps.bpeEncodedSymbols(tp(s, dir, "documents"),
        col("text"), rounds = 4, topK = 15,
        cacheKey = Some(s"documents:$dir")),
      // learn + APPLY: the corpus re-segmented with the four learned
      // merges; the resulting sub-word inventory's top-15 hash-matches
      Some(BpeOps.encodeOracleSql(4, 15))),

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
        // dl pinned: both the corpus stats and the scoring join read it,
        // and unpinned each reference re-rolled the corpus-sized tf
        // cache (guide §2.4 — one exchange, shared)
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl")).pin()
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
        // model table PINNED and self-contained (the q150 pre-join
        // discipline): n_head rides on the bigram row via a window over
        // t1 instead of a separate hd rollup + second join — unpinned,
        // the old shape re-derived big three times from db (the w-build,
        // the hd rollup, and the scoring join) and joined twice. One
        // model build, one scoring join (guide §2.4).
        val big = db.groupBy("t1", "t2").agg(sum("k").as("n_ab"))
          .withColumn("n_head",
            sum("n_ab").over(Window.partitionBy("t1")))
          .pin()
        db.join(big, Seq("t1", "t2"))
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
        // model itself is the big side, so above [[LmPruneMinDocs]]
        // the model drops singleton trigrams before the joins —
        // Brants et al.'s min-count prune, SIZE-GATED (the q47/q176
        // precedent) with a `pruned` output flag; the oracle corpus
        // stays far below the gate on the exact full form.
        val pruned = documentCount(s, dir) > LmPruneMinDocs
        trigramBackoffLm(s, dir, pruneSingletons = pruned)
          .withColumn("pruned", lit(pruned))
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
             |  CAST(sum(k * s) // sum(k) AS BIGINT) AS avg_surprisal_fp,
             |  false AS pruned
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
        // System A: BM25 (the q130 derivation, unchanged; dl pinned for
        // the same two-reader reason as q130)
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl")).pin()
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

    Q("q204_blocklist_scan",
      (s, dir) => {
        // Multi-pattern blocklist scan via the Aho–Corasick expression
        // (graft.functions.TextScanExpressions): ONE automaton pass per
        // document finds every pattern — per-pattern contains() is
        // O(text × patterns) and a plan node per pattern; the automaton
        // is O(text + matches) with the whole list as one reference
        // object. The pattern set mixes guaranteed-hit single tokens,
        // multi-word phrases, an OVERLAPPING pair ("table value" /
        // "value part" can fire on the same trigram), and a
        // never-matching entry — the oracle replays each as a plain
        // contains() join, so the hash match pins exact per-pattern
        // contains semantics, overlaps included.
        val pats = Seq("vector", "spark", "table value", "value part",
          "customer stream", "zz-never-occurs")
        tp(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextScanExpressions.multiMatchIds(
              col("text"), pats).as("hit_ids"))
          .filter(size(col("hit_ids")) > 0)
          .select(col("doc_id"), size(col("hit_ids")).cast("long").as("n_hits"),
            // Serialize the (already ascending-distinct) id list to a
            // canonical CSV string: the driver's pandas gate cannot
            // hash/sort a bare array column, and a scalar column makes
            // the row hashable on both engines.
            array_join(transform(col("hit_ids"), _.cast("string")), ",")
              .as("hit_ids"))
          .orderBy("doc_id")
      },
      Some("""WITH p(pid, pat) AS (VALUES
             |    (0, 'vector'), (1, 'spark'), (2, 'table value'),
             |    (3, 'value part'), (4, 'customer stream'),
             |    (5, 'zz-never-occurs')),
             |hits AS (
             |  SELECT d.doc_id, p.pid FROM documents d
             |  JOIN p ON contains(d.text, p.pat))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
             |  array_to_string(list_sort(list(pid)), ',') AS hit_ids
             |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q210_html_extract",
      (s, dir) => {
        // HTML → text extraction end-to-end (graft.ext.HtmlOps): each
        // document is wrapped in a deterministic full-page template —
        // doctype, titled head, style + script blocks (the script body
        // embeds quoted markup and a bare `<`), an HTML comment, nav
        // with nested list links, header, a main div (headings,
        // entity-bearing paragraphs, the doc text, a list), footer —
        // and both extraction variants run over it. The oracle rebuilds
        // the SAME template by string concat and replays the SAME
        // regexp chain (HtmlOps.htmlChainSql folds the identical
        // pattern list), so the hash match pins every step: invisible-
        // content removal, chrome-vs-main cut, block segmentation,
        // entity decode (incl. the &amp;-last one-level rule),
        // whitespace canonicalization. main_text is gated verbatim;
        // full_chars pins the chrome-keeping variant through length.
        val d = tp(s, dir, "documents")
        val html = htmlFixtureCol
        d.select(col("doc_id"),
            HtmlOps.htmlMainText(html).as("main_text"),
            length(HtmlOps.htmlToText(html)).cast(LongType).as("full_chars"))
          .select(col("doc_id"), col("main_text"),
            length(col("main_text")).cast(LongType).as("n_chars"),
            (length(col("main_text"))
              - length(regexp_replace(col("main_text"), "\\n", "")) + 1)
              .cast(LongType).as("n_blocks"),
            col("full_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (
             |  SELECT doc_id, $htmlFixtureSql AS html FROM documents),
             |x AS (
             |  SELECT doc_id,
             |    ${HtmlOps.htmlChainSql("html", main = true)} AS main_text,
             |    ${HtmlOps.htmlChainSql("html", main = false)} AS full_text
             |  FROM h)
             |SELECT doc_id, main_text,
             |  CAST(length(main_text) AS BIGINT) AS n_chars,
             |  CAST(length(main_text) - length(replace(main_text, chr(10), '')) + 1 AS BIGINT) AS n_blocks,
             |  CAST(length(full_text) AS BIGINT) AS full_chars
             |FROM x ORDER BY doc_id""".stripMargin)),

    Q("q211_html_corpus_funnel",
      (s, dir) => {
        // The full training-corpus funnel WITH the markup ingress in
        // front: each doc's text is wrapped in a page whose CHROME
        // varies per document (nav/header/footer carry the doc_id)
        // while the main div carries the text verbatim — so the gate
        // simultaneously pins (a) the q48 funnel arithmetic running on
        // EXTRACTED text and (b) the property that makes main-content
        // extraction matter at all: two pages differing only in chrome
        // still collapse in the dedup stages (chrome leaking into
        // main_text injects per-doc shingles — doc_id is in the
        // chrome — shifting fingerprints and n_final, and any
        // extraction drift breaks the hash match against the oracle's
        // replayed extraction). Oracle = the SAME extraction chain CTE +
        // the SAME funnel body q48 uses (corpusFunnelSql), pointed at
        // the extraction instead of the raw table.
        val docs = tp(s, dir, "documents")
          .select(col("doc_id"), htmlWrapCol.as("html"))
        CorpusPipeline.cleanHtmlSummary(
          docs, col("doc_id"), col("html"), lang = "en", minQuality = 0.5)
      },
      Some(s"""WITH hh AS (
             |  SELECT doc_id, $htmlWrapSql AS html FROM documents),
             |ext AS MATERIALIZED (
             |  SELECT doc_id,
             |    ${HtmlOps.htmlChainSql("html", main = true)} AS text
             |  FROM hh),
             |${corpusFunnelSql("ext")}""".stripMargin)),

    Q("q213_url_canonical_dedup",
      (s, dir) => {
        // URL canonicalization as the crawl-corpus dedup key
        // (graft.ext.UrlOps): each doc gets a deterministic messy URL
        // exercising every rule at once — uppercase scheme/host, www
        // prefix, default :80 port, doubled path slashes, trailing
        // slash, MIXED-CASE path segment (must survive — paths are
        // case-sensitive), param order varying by doc parity, utm_* /
        // gclid tracking params, a fragment — and every 11th doc is an
        // unparseable string that must pass through trimmed, never
        // nulled. Docs sharing (source, doc_id mod 7) canonicalize to
        // the SAME url across all those surface differences, and the
        // gate hashes the full duplicate-class table (canonical form,
        // class size, min-id survivor). The oracle rebuilds the same
        // URLs and replays the same canonicalization arithmetic
        // (UrlOps.canonicalizeUrlSql — identical regex bytes).
        val d = tp(s, dir, "documents")
        val url = when(pmod(col("doc_id"), lit(11)) === 0, lit("  not a url  "))
          .otherwise(partsCol(urlFixtureParts))
        d.select(col("doc_id"), UrlOps.canonicalizeUrl(url).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy("canonical_url")
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN '  not a url  '
             |         ELSE ${partsSql(urlFixtureParts)} END AS url
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, ${UrlOps.canonicalizeUrlSql("url")} AS canonical_url
             |  FROM u)
             |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs,
             |  min(doc_id) AS first_doc
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),
  )

  /** q213's messy-URL template — one list, both engines (the q210/q211
    * lockstep pattern). */
  private lazy val urlFixtureParts: Seq[Either[String, (Column, String)]] = Seq(
    Left("HTTP://WWW."),
    Right((col("source"), "source")),
    Left(".Example.COM:80//articles//Item-"),
    Right((pmod(col("doc_id"), lit(7)).cast("string"), "(doc_id % 7)::VARCHAR")),
    Left("/?"),
    Right((when(pmod(col("doc_id"), lit(2)) === 1, lit("b=2&a=1"))
        .otherwise(lit("a=1&b=2")),
      "CASE WHEN doc_id % 2 = 1 THEN 'b=2&a=1' ELSE 'a=1&b=2' END")),
    Left("&utm_source=rss&gclid=g"),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("#sec-"),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
  )

  /** q211's page template: chrome varies per doc (doc_id in
    * nav/header/footer), main content is the doc text verbatim —
    * extraction must recover the text alone or the funnel's dedup
    * stages degenerate. Same one-list lockstep as [[htmlFixtureParts]]. */
  private lazy val htmlWrapParts: Seq[Either[String, (Column, String)]] = Seq(
    Left("<html><head><title>Item "),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</title><style>nav { color: #222; }</style></head><body>" +
      "<nav><ul><li>browse</li><li>item "),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</li></ul></nav><header><h1>Entry "),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</h1></header><div id=\"main\"><p>"),
    Right((col("text"), "text")),
    Left("</p></div><footer>rendered as item "),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</footer></body></html>"),
  )

  private def htmlWrapCol: Column = partsCol(htmlWrapParts)
  private def htmlWrapSql: String = partsSql(htmlWrapParts)

  /** q210's page template: one literal/column part list drives BOTH the
    * Spark fixture concat and the oracle's `||` chain — the same
    * lockstep-by-construction pattern as [[graft.ext.HtmlOps.chain]].
    * The template deliberately exercises every extraction step (see
    * q210's comment). */
  // lazy: referenced from the `qs` initializer above its definition
  private lazy val htmlFixtureParts: Seq[Either[String, (Column, String)]] = Seq(
    Left("<!DOCTYPE html><html><head><title>Doc "),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</title><style>body { color: #333; } .nav a { top: 1px; }</style>" +
      "<script type=\"text/javascript\">var n = 1 < 2; var s = \"<div>quoted markup</div>\";</script>" +
      "</head><body><!-- rendered for "),
    Right((col("source"), "source")),
    Left(" --><nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/docs\">Docs &amp; More</a></li></ul></nav>" +
      "<header><h1>Corpus browser</h1></header><div id=\"main\"><h2>"),
    Right((upper(col("source")), "upper(source)")),
    Left(" #"),
    Right((col("doc_id").cast("string"), "doc_id::VARCHAR")),
    Left("</h2><p>Lang: <b>"),
    Right((col("lang"), "lang")),
    Left("</b> &quot;tagged&quot; &#39;quoted&#39; A&amp;B &lt;kept-tag&gt; x&nbsp;y &amp;lt;once&amp;gt;</p><p>"),
    Right((substring(col("text"), 1, 240), "substr(text, 1, 240)")),
    Left("</p><ul><li>alpha item</li><li>beta item</li></ul></div>" +
      "<footer><p>&copy; 2026 corpus footer</p></footer></body></html>"),
  )

  /** The shared fold: one part list -> the Spark concat Column and
    * the oracle's || chain — written ONCE so quoting/escaping can
    * never diverge between the two templates (q210, q211). */
  private def partsCol(parts: Seq[Either[String, (Column, String)]]): Column =
    concat(parts.map {
      case Left(s) => lit(s)
      case Right((c, _)) => c
    }: _*)

  private def partsSql(parts: Seq[Either[String, (Column, String)]]): String =
    parts.map {
      case Left(s) => "'" + s.replace("'", "''") + "'"
      case Right((_, e)) => e
    }.mkString(" || ")

  private def htmlFixtureCol: Column = partsCol(htmlFixtureParts)
  private def htmlFixtureSql: String = partsSql(htmlFixtureParts)
}
