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

/** Mixture planning & curation: domain resampling, temperature/UniMax,
  * IPF raking, ESS, splits, token budgets, curriculum schedules.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesMixture {

  val qs: Seq[Q] = Seq(

    Q("q51_split_assignment",
      (s, dir) => DedupOps.assignSplit(tp(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split"),
      Some(s"""SELECT ${DedupOps.assignSplitSql("doc_id::VARCHAR",
                 Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))} AS split,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

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
    //    state; daily buckets in America/New_York shift with DST) ──────,

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
        // k·G rows — ALWAYS broadcast: at sf1 the post-aggregation size
        // estimate cleared autoBroadcastJoinThreshold and the join-back
        // fell into a sort-merge that SORTED the full events table
        // (measured 22× for 10× data; with the hint the probe is one
        // linear hash-join scan again)
        val sv = broadcast(sampled).join(ev.select("event_id", "value"), "event_id")
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
        // 100 TB. ALL per-doc derivations (token count, md5 digest,
        // min-md5-5-gram fingerprint) happen in ONE corpus pass whose
        // pinned result is NARROW — text is projected away, so the
        // cache is hash-column-sized, the expensive fingerprint runs
        // once per corpus (not once per consumer: the ×1000 Probe
        // showed the old two-branch form scanning the 1.5 GB corpus
        // four times and fingerprinting twice, 380 s/run), and class
        // counts are map-side-combined groupBys joined back on the
        // narrow frame. The span profile reads the session-shared
        // ExactSubstr span frame (the q139 family build,
        // QueryHelpers.exactSubstrSpans8 — paid once per session).
        // Every rate is an integer fixed-point division.
        val d = tp(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"),
            md5(col("text")).as("digest"),
            TextOps.fingerprint(col("text"), 5).as("fp"))
          .pin()
        val exCls = d.groupBy("digest").agg(count(lit(1)).as("copies"))
        val fpCls = d.groupBy("fp").agg(count(lit(1)).as("fcopies"))
        val sp = ExactSubstrOps.profileFromSpans(exactSubstrSpans8(s, dir))
          .select(col("doc_id"), col("dup_tokens"))
        d.join(exCls, "digest").join(fpCls, "fp")
          .join(sp, Seq("doc_id"), "left")
          .select(col("source"), col("n_tokens"),
            (col("copies") >= 2).cast(LongType).as("is_exact"),
            (col("fcopies") >= 2).cast(LongType).as("is_fpdup"),
            col("dup_tokens"))
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
  )
}
