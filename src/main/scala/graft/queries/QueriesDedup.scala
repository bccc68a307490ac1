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

/** Deduplication family: exact/MinHash/SimHash/n-gram near-dup,
  * cluster resolution, exact-substring spans, decontamination,
  * calibration sweeps and dedup quality audits.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesDedup {

  val qs: Seq[Q] = Seq(

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
      // the session-shared production banding frame (the same
      // signatures/candidates every banding consumer reads — q35 was
      // the one family query still re-deriving its own build per call:
      // 45.6 s warm at the ×1000 rehearsal, candidate-count-sized off
      // the shared frame)
      (s, dir) => minhashPairs(s, dir)
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
        // distinct 3-gram shingle sets come from the SESSION-SHARED
        // materialization (QueryHelpers.shingleSets — one corpus pass
        // serves the whole q46/q158/q172/q185/q186 verify family); the
        // per-pair jaccard then works on cached arrays instead of
        // re-deriving the shingle pipeline per reference
        val fps = tp(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.fingerprint(col("text"), 5).as("fp"))
          .join(shingleSets(s, dir), "doc_id")
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

    // ── Similarity search (training-pipeline ext) ─────────────────────,

    Q("q47_embedding_cluster_resolution",
      (s, dir) => {
        // General-graph component resolution, ORACLED: hyperplane-LSH
        // cosine pairs form non-clique graphs (a~b, b~c above the
        // threshold, a~c below it), so the DuckDB oracle needs a
        // RECURSIVE transitive closure — this is the query that proves
        // resolveClusters does real transitive merging, not GROUP BY.
        // SIZE-GATED (round 10, the q176 precedent): above
        // EmbClusterPinnedBitsMaxVecs the pinned signBits=6 arm is
        // quadratic in bucket occupancy (1311 s at 2M vectors), so
        // large corpora route through autoSignBits; the bits actually
        // used are an output column, so gated results are
        // distinguishable. The oracle pins the 6-bit form (the gate
        // corpus is far below the threshold). The pair frame is the
        // session-shared embNearDupPairs build (q40/q186 read the same
        // one) — per-call work is the q44-class resolution only.
        val bits =
          if (tableCount(s, dir, "embeddings") > EmbClusterPinnedBitsMaxVecs)
            SimilarityOps.autoSignBits(tableCount(s, dir, "embeddings"))
          else 6
        embNearDupClusters(s, dir, bits)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("csize"))
          .withColumn("sign_bits", lit(bits.toLong))
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
             |SELECT label AS cluster_id, CAST(count(*) AS BIGINT) AS csize,
             |  CAST(6 AS BIGINT) AS sign_bits
             |FROM lab GROUP BY label ORDER BY cluster_id""".stripMargin)),

    // ── Training-pipeline staples: deterministic split + repetition ──,

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
      Some(s"WITH ${corpusFunnelSql("documents")}")),

    Q("q50_simhash_neardup",
      (s, dir) => {
        // Constant-size audit sample above the gate (see q126): simhash
        // band-bucket collisions grow quadratically on a clustered
        // corpus; every m-th doc with m = ⌈n/50k⌉ pins the cost at any
        // corpus size. sf1 (50k docs) stays on the exact full form;
        // the oracle corpus (2k) is far below the gate.
        val m = auditSampleMod(s, dir, SimHashAuditTargetDocs)
        val base = tp(s, dir, "documents")
        val docs = if (m > 1) base.filter(pmod(col("doc_id"), lit(m)) === 0)
                   else base
        // above the gate the sampled arm ALSO runs the hot-bucket
        // guard (q137's cap precedent): even a 50k-doc audit sample
        // of a boilerplate corpus can concentrate identical simhashes
        // into one quadratic (band, block). Below the gate the exact
        // oracle-pinned form is untouched.
        val pairs =
          if (m > 1)
            DedupOps.cappedSimhashPairsFromSignatures(
              DedupOps.simhashSignatures(docs, col("doc_id"), col("text"),
                portable = true).pin(),
              maxHamming = 3, bands = 4, maxBucketSize = 256)
          else DedupOps.simhashNearDupPairs(docs, col("doc_id"), col("text"),
            maxHamming = 3, bands = 4)
        pairs
          .agg(count(lit(1)).as("neardup_pairs"))
          .withColumn("sample_mod", lit(m))
      },
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
             |SELECT CAST(count(*) AS BIGINT) AS neardup_pairs,
             |  CAST(1 AS BIGINT) AS sample_mod FROM p
             |WHERE bit_count(xor(sh_a, sh_b)) <= 3""".stripMargin)),

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

    Q("q126_setsim_join",
      (s, dir) => {
        // Exact-recall near-dup pairs via prefix-filtered set-similarity
        // join over distinct 3-gram shingle sets (Jaccard >= 0.6 as the
        // rational 6/10 — integer verify, no float boundary rows). The
        // oracle runs the naive all-pairs join, so the hash-match IS the
        // completeness proof for the prefix blocking.
        //
        // CONSTANT-SIZE AUDIT SAMPLE above the gate (the q47/q176
        // size-gate precedent, generalized to carry the sampling
        // rate): prefix-filter candidate volume is Σ f² over
        // prefix-token document frequencies, and on a corpus whose
        // rarest-per-doc shingles are still COMMON that term is
        // quadratic in corpus size — the round-11 sf1 sweep measured
        // candidates 312k → 36.2M (116×) for 10× docs even with
        // PPJoin's length + positional filters, and a FRACTIONAL
        // sample only delays the blow-up. Every m-th doc with
        // m = ⌈n/20k⌉ pins the audit at ~20k docs at any corpus size;
        // `sample_mod` (1 = exact full form) makes gated results
        // distinguishable, and the oracle corpus (sf0.01, 2k docs)
        // stays far below the gate on the full form. Exact-recall
        // dedup ABOVE the gate is what the MinHash/LSH cascade (q35)
        // is for — this operator is its fixed-size audit complement.
        val m = auditSampleMod(s, dir, SetSimAuditTargetDocs)
        val base = tp(s, dir, "documents")
        val docs = (if (m > 1) base.filter(pmod(col("doc_id"), lit(m)) === 0)
                    else base)
          .select(col("doc_id").as("id"),
            array_distinct(TextOps.shingles(col("text"), 3)).as("toks"))
        SetSimJoinOps.jaccardJoin(docs, tNum = 6, tDen = 10)
          .withColumn("jaccard",
            r4(col("inter").cast(DoubleType) / col("uni").cast(DoubleType)))
          .withColumn("sample_mod", lit(m))
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
             |  floor(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS jaccard,
             |  CAST(1 AS BIGINT) AS sample_mod
             |FROM p WHERE inter * 10 >= uni * 6 ORDER BY id_a, id_b""".stripMargin)),

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
        // Hot-bucket guard, driver-gated (q126/q47 precedent): below
        // the gate the plain band join is exact and the oracle pins it;
        // above (the ×100 rehearsal regime and beyond, where a
        // boilerplate-heavy corpus concentrates identical chunks into
        // mega-buckets) the guarded join bounds every bucket at 256 —
        // pure duplicate classes collapse to their representative star
        // (lossless for this est>=0.5 connectivity rollup), mixed
        // overflows take the deterministic first-256 slice.
        val guarded = tableCount(s, dir, "documents") > 100000L
        val pairs =
          if (!guarded) DedupOps.minhashCandidatePairs(chunks, col("cid"), col("ctext"))
          else {
            val sigs = DedupOps.minhashSignatures(chunks, col("cid"),
              col("ctext"), shingleSize = 3, numHashes = 32, portable = true).pin()
            DedupOps.cappedCandidatePairsFromSignatures(sigs,
              maxBucketSize = 256).drop("capped")
          }
        pairs
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

    Q("q139_exact_substring_spans",
      (s, dir) =>
        // ExactSubstr dedup profiling (Lee et al., arXiv:2107.06499) via
        // rolling 8-token grams + gaps-and-islands span reassembly — the
        // boilerplate/license-header detector that whole-doc MinHash
        // (q35) and the chunk grid (q137) both miss. Plan shape is in
        // ExactSubstrOps: one gram count shuffle (map-side combined), a
        // LEFT SEMI feedback join, per-document windows; never
        // all-pairs. The oracle pins the 8-gram short-doc form; the
        // production DEFAULT is the linear l=20+mergeGap operating
        // point (ExactSubstrOps.DefaultL — q194). The gram build and
        // the island merge are the session-shared family frames
        // (QueryHelpers.exactSubstrSpans8): q139/q143/q145/q170 answer
        // off one corpus pass. Top-50 most-covered documents.
        ExactSubstrOps.profileFromSpans(exactSubstrSpans8(s, dir))
          .orderBy(col("coverage_fp").desc, col("doc_id"))
          .limit(50),
      Some(exactSubstrOracleSql(l = 8, mergeGap = 0, limit = 50))),

    Q("q194_exact_substring_l20",
      (s, dir) =>
        // The LONGER-GRAM ExactSubstr operating point (Lee et al. use a
        // 50-token match floor on web-scale docs; this corpus's median
        // doc is ~56 tokens, so 20 tokens is the equivalent "only long
        // verbatim passages count" regime) with a nonzero span-merge
        // distance: duplicate ranges separated by <= 4 clean tokens
        // merge into one reported span, so a one-word edit inside a
        // boilerplate block doesn't split the report. Same plan shape
        // as q139 — one gram-count shuffle, LEFT SEMI feedback,
        // per-document windows — and, like q139, the build is a
        // session-shared frame (exactSubstrSpans20), so repeats answer
        // span-count-sized.
        ExactSubstrOps.profileFromSpans(exactSubstrSpans20(s, dir))
          .orderBy(col("coverage_fp").desc, col("doc_id"))
          .limit(50),
      Some(exactSubstrOracleSql(l = 20, mergeGap = 4, limit = 50))),

    Q("q143_strip_dup_spans",
      (s, dir) =>
        // The APPLY side of q139: rebuild each affected document with
        // its duplicated spans removed (strip-everywhere policy — see
        // ExactSubstrOps.stripDupSpans scaladoc) and return the 50 most-
        // reduced documents WITH the reconstructed text, so the oracle
        // proves the actual byte-level rewrite, not just the counts.
        // Reads the session-shared span frame — only the rebuild
        // re-reads the corpus (one tokenize pass, no gram hashing).
        ExactSubstrOps.stripFromSpans(tp(s, dir, "documents"),
            col("doc_id"), col("text"), exactSubstrSpans8(s, dir), l = 8)
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

    Q("q145_keep_one_dedup",
      (s, dir) =>
        // Lee-faithful keep-one ExactSubstr apply: each duplicated gram
        // elects the corpus-min (doc_id, pos) occurrence as canonical;
        // a position is stripped only when no covering gram occurrence
        // is canonical — so the FIRST copy of every duplicated passage
        // survives verbatim (q143 strips all copies). Election is one
        // grouped min per gram key; no cross-doc pairing anywhere.
        // Both family frames arrive prebuilt (session-shared): the
        // election groupBy reads the persisted occurrence frame, the
        // all-dup cover reads the persisted span frame — keep-one is
        // candidate-sized after the family's one corpus pass.
        ExactSubstrOps.keepOneFromFrames(tp(s, dir, "documents"),
            col("doc_id"), col("text"), exactSubstrDupOcc8(s, dir),
            exactSubstrSpans8(s, dir), l = 8, mergeGap = 0)
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
        // The CANDIDATE side runs the production blocking over the full
        // 5% name slice. GROUND TRUTH is all-pairs BY CONSTRUCTION (it
        // measures the candidate bound against exhaustive search), so
        // it runs on a further deterministic 1/4 sub-sample of BOTH
        // sides (portable md5 hash of the name — the declared constant
        // that cuts the truth join 16× to O(sample²)), and
        // completeness is scored on the blocking's hits restricted to
        // the same sampled pairs — an exact ratio on the sample,
        // unbiased for the full run. Exactly how you'd calibrate
        // blocking on 100 TB: brute-force a bounded sample, then trust
        // the measured completeness (here provably 10000 — the
        // gram-count bound is lossless — and the eval DEMONSTRATES it).
        // All counts are 1-row broadcast frames; only the sampled
        // quadratic join is ever materialized.
        val names = t(s, dir, "part")
          .filter(col("p_partkey") % 20 === 0)
          .select(col("p_name")).distinct()
        val clean = names.select(col("p_name").as("id"), col("p_name").as("s"))
        val dirty = names.select(col("p_name").as("id"),
          concat(substring(col("p_name"), 1, 1),
            expr("substring(p_name, 3)")).as("s"))
        val cand = FuzzyJoinOps.candidatePairs(dirty, clean, maxDist = 2, q = 3)
          .pin()
        val inSample = (c: Column) => PortableHash.long60(c) % 4 === 0
        val foundS = cand
          .filter(levenshtein(col("l_s"), col("r_s")) <= 2
            && inSample(col("l_id")) && inSample(col("r_id")))
        val truth = dirty.filter(inSample(col("id"))).select(col("s").as("ds"))
          .crossJoin(clean.filter(inSample(col("id"))).select(col("s").as("cs")))
          .filter(levenshtein(col("ds"), col("cs")) <= 2)
        dirty.agg(count(lit(1)).as("n_left"))
          .crossJoin(broadcast(clean.agg(count(lit(1)).as("n_right"))))
          .crossJoin(broadcast(dirty.filter(inSample(col("id")))
            .agg(count(lit(1)).as("n_truth_names"))))
          .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
          .crossJoin(broadcast(foundS.agg(count(lit(1)).as("n_found"))))
          .select(col("n_left"), col("n_right"), col("n_truth_names"),
            col("n_candidates"), col("n_true"), col("n_found"),
            expr("(10000 * (n_left * n_right - n_candidates)) div (n_left * n_right)")
              .as("reduction_fp"),
            // vacuously complete when the ¼ sample holds no true pair
            // (tiny corpora) — an unguarded div would yield null there
            when(col("n_true") > 0, expr("(10000 * n_found) div n_true"))
              .otherwise(10000L).as("completeness_fp"))
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
             |smp AS (SELECT id, s FROM dt
             |  WHERE ('0x' || substr(md5(id), 1, 15))::BIGINT % 4 = 0),
             |smc AS (SELECT id, s FROM cl
             |  WHERE ('0x' || substr(md5(id), 1, 15))::BIGINT % 4 = 0),
             |found AS (SELECT l_id FROM cand WHERE levenshtein(l_s, r_s) <= 2
             |  AND ('0x' || substr(md5(l_id), 1, 15))::BIGINT % 4 = 0
             |  AND ('0x' || substr(md5(r_id), 1, 15))::BIGINT % 4 = 0),
             |troo AS (SELECT smp.id FROM smp CROSS JOIN smc
             |  WHERE levenshtein(smp.s, smc.s) <= 2),
             |st AS (
             |  SELECT (SELECT count(*) FROM dt) AS n_left,
             |    (SELECT count(*) FROM cl) AS n_right,
             |    (SELECT count(*) FROM smp) AS n_truth_names,
             |    (SELECT count(*) FROM cand) AS n_candidates,
             |    (SELECT count(*) FROM troo) AS n_true,
             |    (SELECT count(*) FROM found) AS n_found)
             |SELECT CAST(n_left AS BIGINT) AS n_left,
             |  CAST(n_right AS BIGINT) AS n_right,
             |  CAST(n_truth_names AS BIGINT) AS n_truth_names,
             |  CAST(n_candidates AS BIGINT) AS n_candidates,
             |  CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_found AS BIGINT) AS n_found,
             |  CAST((10000 * (n_left * n_right - n_candidates))
             |    // (n_left * n_right) AS BIGINT) AS reduction_fp,
             |  CAST(CASE WHEN n_true > 0 THEN (10000 * n_found) // n_true
             |    ELSE 10000 END AS BIGINT) AS completeness_fp
             |FROM st""".stripMargin)),

    Q("q158_minhash_calibration",
      (s, dir) => {
        // MinHash estimator calibration: for every LSH candidate pair,
        // the signature-agreement Jaccard estimate (k matching rows /
        // 32) next to the EXACT 3-gram Jaccard and the absolute error —
        // the measurement that tells you whether 32 hashes and an 0.5
        // threshold are adequate before keying a 100 TB dedup on them
        // (q144 is the same discipline for the ANN indexes). Candidate
        // generation and signatures are the production q35 path
        // (portable hash family); BOTH corpus-sized inputs — candidate
        // pairs and per-doc shingle sets — are the session-shared
        // materializations (QueryHelpers), so the whole query is
        // candidate-sized beyond the family's one-time build.
        val sd = shingleSets(s, dir)
        minhashPairs(s, dir)
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

    Q("q172_neardup_threshold_sweep",
      (s, dir) => {
        // Threshold sensitivity of MinHash near-dedup: for est-Jaccard
        // cuts 0.5–0.9, how many candidate pairs survive, how many
        // documents are touched, and how many a greedy pairwise
        // keep-smaller-id pass would drop — the sweep a corpus owner
        // reads before fixing the q35 threshold for a 100 TB dedup (the
        // knee of pairs_ge vs t is the operating point). Candidates
        // come from the SESSION-SHARED production banding frame
        // (QueryHelpers.minhashPairs) fanned ×5 by a literal threshold
        // array; everything after is candidate-pair-sized. Thresholds
        // compare as t/10.0 — the identical double in both engines;
        // est values are k/32, which never manufactures a tie against
        // t/10 except the exact 0.5, handled identically by >= on both
        // sides.
        val pairs = minhashPairs(s, dir)
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
        // blocking). The signature pass and the shingle sets are BOTH
        // session-shared frames — all three band configs and the exact
        // verify read one materialization apiece. SIZE-GATED: above
        // BandSensitivityFullFormMaxDocs the finest (2-row-band) arm
        // is a deliberate candidate explosion — 27 min + an executor
        // memory failure at 5M docs — so large corpora route through
        // the q195 deterministic-sample plan; no registry entry can
        // OOM a sweep. The `sampled` output column says which route
        // ran (on the sample, n_candidates is ~16× smaller — without
        // the flag a consumer could not tell sampled counts from full
        // ones). The oracle pins the full form (the gate corpus is far
        // below the threshold).
        val sampled = documentCount(s, dir) > BandSensitivityFullFormMaxDocs
        bandSensitivityFrame(s, dir, sample = sampled)
          .withColumn("sampled", lit(sampled))
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
             |    ELSE 0 END AS precision_fp,
             |  false AS sampled
             |FROM cfg c LEFT JOIN res r USING (bands)
             |ORDER BY bands""".stripMargin)),

    Q("q195_band_sensitivity_sampled",
      (s, dir) => {
        // The ALWAYS-SAMPLED form of the S-curve diagnostic (q176's
        // size gate routes large corpora to this same plan): the full
        // form is quadratic BY CONSTRUCTION in its finest arm (2-row
        // bands at ×1000 materialize the very candidate explosion the
        // curve warns about — measured 27 min single-shot at 5M docs),
        // so the production diagnostic runs on a DETERMINISTIC 25%
        // sample (doc_id % 4 — SQL-expressible, so still exactly
        // oracled). Banding statistics are pair-level, so precision
        // transfers directly; candidate VOLUME scales ~(1/s)² and is
        // reported extrapolated (est_full_candidates = 16×) next to
        // the measured sample count. Both inputs are FILTERS of the
        // session-shared signature/shingle frames — zero new corpus
        // passes. Shared plan: QueryHelpers.bandSensitivityFrame.
        bandSensitivityFrame(s, dir, sample = true)
          .withColumn("est_full_candidates", col("n_candidates") * 16L)
          .orderBy("bands")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
             |  FROM documents WHERE doc_id % 4 = 0),
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
             |    ELSE 0 END AS precision_fp,
             |  CAST(COALESCE(r.n_candidates, 0) * 16 AS BIGINT) AS est_full_candidates
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
        val sigs = minhashSigs(s, dir)
        val sd = shingleSets(s, dir)
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
        // candidates; the shingle-set frame and the candidate pairs are
        // the session-shared materializations (QueryHelpers), so the
        // corpus-sized shingle build the ×100 rehearsal flagged here is
        // paid once per session, not once per query.
        val sd = shingleSets(s, dir)
        minhashPairs(s, dir)
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
        val mhD = minhashPairs(s, dir)
          .filter(col("est_jaccard") >= 0.5)
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
        val shSig = DedupOps.simhashSignatures(docs, col("doc_id"), col("text"))
        val shD = shSig
          .join(shSig.groupBy("simhash").agg(count(lit(1)).as("c")), "simhash")
          .filter(col("c") >= 2).select(col("doc_id"))
        val emD = embNearDupPairs(s, dir, bits = 6)
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

    Q("q197_incremental_strip",
      (s, dir) => {
        // CDC-incremental ExactSubstr, DRIVER-GATED end to end: mutate
        // the corpus (delete every 50th doc, append 3 tokens to every
        // 77th, insert an exact copy of every 97th under id+1e6 —
        // exercising delete/update/insert AND both duplication-status
        // flip directions: the inserted copies turn unique grams dup,
        // the deletes turn dup grams unique), then answer the strip
        // profile of the MUTATED corpus through
        // ExactSubstrOps.applyChanges — gram passes over touched docs
        // only, restrip over the affected set, starting from the
        // session-shared (FrameStore-durable) 8-gram state index. The
        // oracle re-derives the FULL strip on the mutated corpus from
        // scratch, so the hash-match proves incremental ≡ rebuild in
        // the driver gate, not just in a spec.
        // capped-demo corpus above the gate (see SubstrCdcTargetDocs):
        // the per-execution state rebuild is demo scaffolding, so the
        // demo corpus is bounded like the q126/q50 audits
        val m = auditSampleMod(s, dir, SubstrCdcTargetDocs)
        val full = tp(s, dir, "documents").select(col("doc_id"), col("text"))
        val old = if (m > 1) full.filter(pmod(col("doc_id"), lit(m)) === 0)
                  else full
        val newC = old.filter(pmod(col("doc_id"), lit(50)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(77)) === 0,
              concat(col("text"), lit(" zz zz zz"))).otherwise(col("text")))
          .unionByName(old.filter(pmod(col("doc_id"), lit(97)) === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val changes = ChangeCapture.diff(old, newC, "doc_id")
        // capped runs build their own state over the demo slice; the
        // full form reads the session-shared (FrameStore-durable) index
        val st = if (m > 1)
          ExactSubstrOps.initState(old, col("doc_id"), col("text"), l = 8)
        else exactSubstrState8(s, dir)
        val prevStrip = if (m > 1)
          ExactSubstrOps.stripDupSpans(old, col("doc_id"), col("text"),
            l = 8, mergeGap = 0)
        else ExactSubstrOps.stripFromSpans(full,
          col("doc_id"), col("text"), exactSubstrSpans8(s, dir), l = 8)
        val (_, strip) = ExactSubstrOps.applyChanges(
          st, prevStrip, changes, newC,
          col("doc_id"), col("text"), l = 8, minOccurrences = 2L,
          mergeGap = 0)
        strip
          .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
            col("removed_tokens"), col("cleaned_text"))
          .withColumn("sample_mod", lit(m))
          .orderBy(col("removed_tokens").desc, col("doc_id"))
          .limit(50)
      },
      // q143's full strip chain over the mutated-corpus CTE — a
      // from-scratch rebuild, deliberately NOT incremental
      Some("""WITH oldd AS (SELECT doc_id, text FROM documents),
             |newd AS (
             |  SELECT doc_id, CASE WHEN doc_id % 77 = 0
             |    THEN text || ' zz zz zz' ELSE text END AS text
             |  FROM oldd WHERE doc_id % 50 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, text FROM oldd WHERE doc_id % 97 = 0),
             |d AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM newd),
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
             |  COALESCE(cleaned_text, '') AS cleaned_text,
             |  CAST(1 AS BIGINT) AS sample_mod
             |FROM aff LEFT JOIN reb ON aff.doc_id = reb.doc_id AND aff.n = reb.n
             |ORDER BY removed_tokens DESC, aff.doc_id LIMIT 50""".stripMargin)),

    Q("q199_capped_passage_neardup",
      (s, dir) => {
        // q137's chunk-grid passage near-dup through the HOT-BUCKET-
        // GUARDED band join (DedupOps.cappedCandidatePairsFromSignatures)
        // at a deliberately tiny cap (2), so BOTH bounded arms — the
        // pure-duplicate-class star collapse and the flagged
        // deterministic slice of oversized mixed buckets — fire at gate
        // scale and are pinned by the oracle, not only by the synthetic
        // spec. The rollup carries n_capped, the count of chunk pairs
        // that rest on sampled (non-exhaustive) buckets, so a consumer
        // can see exactly which doc pairs are lower bounds.
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
        val sigs = DedupOps.minhashSignatures(chunks, col("cid"), col("ctext"),
          shingleSize = 3, numHashes = 32, portable = true).pin()
        DedupOps.cappedCandidatePairsFromSignatures(sigs, maxBucketSize = 2)
          .filter(col("est_jaccard") >= 0.5)
          .filter(expr("id_a div 1000000") =!= expr("id_b div 1000000"))
          .groupBy(expr("id_a div 1000000").as("doc_a"),
            expr("id_b div 1000000").as("doc_b"))
          .agg(count(lit(1)).as("n_chunk_pairs"),
            r4(max(col("est_jaccard"))).as("max_est"),
            sum(col("capped").cast(LongType)).as("n_capped"))
          .orderBy("doc_a", "doc_b")
      },
      // q137's oracle chain up to the banded keys, then the guard
      // replayed relationally: windowed occupancy/rank/purity per
      // (band, bucket), star arm for pure oversized buckets, sliced
      // self-join for the rest, min-capped/max-est merge per pair
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
             |sig AS MATERIALIZED (SELECT cid, ${PortableHash.sigArraySql("hl", 32)} AS sig FROM hl),
             |bk AS (
             |  SELECT cid, sig, band,
             |    array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',') AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) AS bb),
             |ann AS MATERIALIZED (
             |  SELECT cid, sig, band, bucket,
             |    count(*) OVER w AS occ,
             |    row_number() OVER (PARTITION BY band, bucket ORDER BY cid) AS rn,
             |    min(cid) OVER w AS rep,
             |    min(array_to_string(sig, ',')) OVER w
             |      = max(array_to_string(sig, ',')) OVER w AS pure
             |  FROM bk WINDOW w AS (PARTITION BY band, bucket)),
             |star AS (
             |  SELECT rep AS id_a, cid AS id_b, 1.0 AS est, 0 AS capped
             |  FROM ann WHERE occ > 2 AND pure AND cid <> rep),
             |jn AS (
             |  SELECT a.cid AS id_a, b.cid AS id_b,
             |    len(list_filter(generate_series(1, 32), i -> a.sig[i] = b.sig[i])) / 32.0 AS est,
             |    CASE WHEN a.occ > 2 THEN 1 ELSE 0 END AS capped
             |  FROM ann a JOIN ann b
             |    ON a.band = b.band AND a.bucket = b.bucket AND a.cid < b.cid
             |  WHERE (a.occ <= 2 OR (NOT a.pure AND a.rn <= 2))
             |    AND (b.occ <= 2 OR (NOT b.pure AND b.rn <= 2))),
             |pairs AS (
             |  SELECT id_a, id_b, max(est) AS est, min(capped) AS capped
             |  FROM (SELECT * FROM star UNION ALL SELECT * FROM jn)
             |  GROUP BY 1, 2),
             |f AS (
             |  SELECT id_a // 1000000 AS doc_a, id_b // 1000000 AS doc_b, est, capped
             |  FROM pairs
             |  WHERE est >= 0.5 AND id_a // 1000000 <> id_b // 1000000)
             |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_chunk_pairs,
             |  floor(max(est) * 10000.0 + 0.5) / 10000.0 AS max_est,
             |  CAST(sum(capped) AS BIGINT) AS n_capped
             |FROM f GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin)),

    Q("q200_rolled_span_profile",
      (s, dir) => {
        // The FrameMaintenance roll-forward, driver-oracle-gated: the
        // corpus mutates (20% deleted, every 7th doc edited, every
        // 11th-mod-3 doc duplicated under a shifted id — both
        // duplication-status flip directions fire), the ExactSubstr
        // family rolls forward through the bounded delta core
        // (ChangeCapture.diff → applySpanDelta; gram passes over
        // touched docs only), and the output is the span-coverage
        // profile off the ROLLED spans frame. The oracle computes the
        // profile from a FULL REBUILD over the mutated corpus — the
        // hash match IS the rolled ≡ rebuilt contract at gate scale
        // (FrameMaintenanceSpec pins it per-frame on fixtures). No
        // store is configured in the gate, so getOrBuild is the
        // identity and the roll is pure dataflow.
        val docs = tp(s, dir, "documents").select("doc_id", "text")
        val mutated = docs
          .filter(pmod(col("doc_id"), lit(5)) =!= 2)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" v2 v2"))).otherwise(col("text")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(11)) === 3)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        // old-snapshot family = the session-shared pinned 8-gram frames
        // (the exact derivations rollForward would otherwise re-run per
        // execution: same l, mergeGap, minOccurrences, same corpus) —
        // the deployment shape too: the old side is READ, never re-built
        val st8 = exactSubstrState8(s, dir)
        val rolled = graft.etl.FrameMaintenance.rollForwardExactSubstr(
          s, s"q200old:$dir", s"q200new:$dir", docs, mutated,
          l = 8, mergeGap = 0,
          oldFrames = Some((st8.occ, st8.cnt, exactSubstrSpans8(s, dir)))).toMap
        ExactSubstrOps.profileFromSpans(rolled("esspans8"))
          .orderBy(col("coverage_fp").desc, col("doc_id"))
          .limit(50)
      },
      Some(exactSubstrOracleSql(l = 8, mergeGap = 0, limit = 50,
        src = "mut",
        prelude = """mut AS (
                    |  SELECT doc_id,
                    |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2 v2'
                    |         ELSE text END AS text
                    |  FROM documents WHERE doc_id % 5 <> 2
                    |  UNION ALL
                    |  SELECT doc_id + 1000000, text FROM documents
                    |  WHERE doc_id % 11 = 3),
                    |""".stripMargin))),

    Q("q206_image_neardup_gate",
      (s, dir) => {
        // The image near-dup pipeline driver-gated END TO END: real BMP
        // bytes are rendered per doc (9×8 pattern images whose pixels
        // are the bits of a portable md5-derived 64-bit value), decoded
        // and dHashed by the REAL executor-side codec path
        // (MultimodalOps.imageDhashes), then paired by the REAL
        // SimHash block join + hamming verify + hot-bucket guard
        // (imageNearDupPairs). doc_id%9 picks one of 9 class patterns
        // (oversized duplicate classes at gate scale → both guard arms
        // fire at cap 8); docs with doc_id%4=1 in classes 0–5 get ONE
        // pattern bit flipped (≤4 dHash bits — near-dups that exercise
        // the hamming verify; classes 6–8 stay pure → star arm). The
        // oracle replays pixel → dHash analytically (one pixel per
        // grid cell makes the hash closed-form) and the guard
        // relationally — a hash mismatch catches a defect anywhere in
        // encode, ImageIO decode, luma/grid arithmetic, banding, or
        // the guard. Pigeonhole completeness: maxHamming 6 < bands 8.
        val media = MultimodalOps.renderPatternImages(
          patternBitsFixture(s, dir, "imgcls"))
        MultimodalOps.imageNearDupPairs(s, media, maxHamming = 6,
            bands = 8, maxBucketSize = 8)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast(LongType).as("hamming"),
            col("capped").cast(IntegerType).as("capped"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH ${patternFixtureCtesSql("imgcls")},
             |dh AS MATERIALIZED (
             |  SELECT doc_id, ${imageDhashHalfSql(1)} AS d1,
             |    ${imageDhashHalfSql(0)} AS d2 FROM hp),
             |$simhashGuardReplaySql""".stripMargin)),

    Q("q208_audio_neardup_gate",
      (s, dir) => {
        // The AUDIO near-dup pipeline driver-gated END TO END — the
        // q206 image pattern applied to the sound arm: real WAV bytes
        // are rendered per doc (65 constant-amplitude tone frames
        // encoding a portable md5-derived 64-bit value), decoded and
        // fingerprinted by the REAL javax.sound codec path
        // (MultimodalOps.audioFingerprints: integer-exact frame-energy
        // deltas), then paired by the REAL SimHash block join + hamming
        // verify + hot-bucket guard (audioNearDupPairs). Same class /
        // flip structure as q206 so both guard arms fire at gate scale;
        // the fingerprint's frame 64 WRAPS to pattern bit 0, so the
        // closed form (and the gate) covers the wraparound bit too.
        val media = MultimodalOps.renderToneWavs(
          patternBitsFixture(s, dir, "audcls"))
        MultimodalOps.audioNearDupPairs(s, media, maxHamming = 6,
            bands = 8, maxBucketSize = 8)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast(LongType).as("hamming"),
            col("capped").cast(IntegerType).as("capped"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH ${patternFixtureCtesSql("audcls")},
             |dh AS MATERIALIZED (
             |  SELECT doc_id, ${audioFpHalfSql(1)} AS d1,
             |    ${audioFpHalfSql(0)} AS d2 FROM hp),
             |$simhashGuardReplaySql""".stripMargin)),

    Q("q209_media_fingerprint_gate",
      (s, dir) => {
        // The MIXED-media ingest fingerprint pass
        // (MultimodalOps.mediaFingerprints — what StreamingPrep
        // .fingerprintMedia runs at the door) driver-gated: one corpus
        // where doc_id%3 picks the modality — image rows render real
        // BMPs, audio rows real WAVs (both closed-form fixtures over
        // the q206/q208 pattern bits), video rows carry an opaque
        // payload with no fingerprint path. The ONE output column
        // carries dHash for images, the loudness-delta fingerprint for
        // audio, and an auditable NULL for video — so the hash gate
        // pins the kind DISPATCH itself on top of both codec paths.
        val media = MultimodalOps.renderMixedFixtures(
          patternBitsFixture(s, dir, "medcls")
            .withColumn("kind", expr(
              """CASE media_id % 3 WHEN 0 THEN 'image'
                |WHEN 1 THEN 'audio' ELSE 'video' END""".stripMargin)))
        MultimodalOps.mediaFingerprints(media)
          .select(col("media_id"), col("kind"), col("fingerprint"))
          .orderBy("media_id")
      },
      Some(s"""WITH ${patternFixtureCtesSql("medcls")},
             |dhimg AS (
             |  SELECT doc_id, ${imageDhashHalfSql(1)} AS d1,
             |    ${imageDhashHalfSql(0)} AS d2 FROM hp WHERE doc_id % 3 = 0),
             |dhaud AS (
             |  SELECT doc_id, ${audioFpHalfSql(1)} AS d1,
             |    ${audioFpHalfSql(0)} AS d2 FROM hp WHERE doc_id % 3 = 1),
             |fp AS (
             |  SELECT doc_id, 'image' AS kind,
             |    ${signed64Sql("d1", "d2")} AS fingerprint FROM dhimg
             |  UNION ALL SELECT doc_id, 'audio',
             |    ${signed64Sql("d1", "d2")} FROM dhaud
             |  UNION ALL SELECT doc_id, 'video', NULL FROM hp
             |  WHERE doc_id % 3 = 2)
             |SELECT doc_id AS media_id, kind,
             |  CAST(fingerprint AS BIGINT) AS fingerprint
             |FROM fp ORDER BY media_id""".stripMargin)),
  )

  /** Recombine two 32-bit halves into ONE signed BIGINT without
    * overflow in either engine: re-sign the high half into
    * [−2³¹, 2³¹) first, so the ×2³² product spans exactly the signed
    * 64-bit range (Spark-side this is just `(d1 << 32) | d2`). */
  private def signed64Sql(hi: String, lo: String): String =
    s"(($hi - CASE WHEN $hi >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + $lo)"

  /** Shared gate-fixture pattern bits for q206/q208/q209: class
    * pattern from a portable md5 prefix over `salt:<doc_id%9>` (9
    * oversized duplicate classes at gate scale), ONE bit flipped for
    * doc_id%4==1 in classes 0–5 (near-dups that exercise the verify;
    * classes 6–8 stay pure for the star arm). Returns
    * (media_id, bits). */
  private def patternBitsFixture(s: SparkSession, dir: String,
                                 salt: String): DataFrame =
    tp(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        PortableHash.prefix64(
          concat(lit(s"$salt:"),
            pmod(col("doc_id"), lit(9)).cast("string"))).as("bits0"))
      .withColumn("bits", expr(
        """CASE WHEN media_id % 4 = 1 AND media_id % 9 < 6
          |THEN bits0 ^ shiftleft(cast(1 as bigint),
          |                       cast(media_id % 64 as int))
          |ELSE bits0 END""".stripMargin))

  /** The oracle twin of [[patternBitsFixture]]: CTEs `d0`/`hp` exposing
    * the post-flip pattern halves `h1` (bits 63..32) / `h2` (31..0). */
  private def patternFixtureCtesSql(salt: String): String =
    s"""d0 AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('$salt:' || CAST(doc_id % 9 AS VARCHAR)), 1, 8))::BIGINT AS h1,
       |    ('0x' || substr(md5('$salt:' || CAST(doc_id % 9 AS VARCHAR)), 9, 8))::BIGINT AS h2,
       |    (doc_id % 4 = 1 AND doc_id % 9 < 6) AS flip,
       |    doc_id % 64 AS p
       |  FROM documents),
       |hp AS (
       |  SELECT doc_id,
       |    CASE WHEN flip AND p >= 32 THEN xor(h1, (1::BIGINT << (p - 32)))
       |         ELSE h1 END AS h1,
       |    CASE WHEN flip AND p < 32 THEN xor(h2, (1::BIGINT << p))
       |         ELSE h2 END AS h2
       |  FROM d0)""".stripMargin

  /** DuckDB SQL for one 32-bit half of a 64-bit pattern-comparison
    * signature whose source bits live in columns `h1` (bits 63..32)
    * and `h2` (bits 31..0): signature bit i is set iff pattern bit
    * `p1Of(i)` < pattern bit `p2Of(i)`. Each half is a sum of disjoint
    * powers of two (< 2³² — no BIGINT overflow in either engine). */
  private def patternCmpHalfSql(half: Int, p1Of: Int => Int,
                                p2Of: Int => Int): String = {
    def pix(q: Int): String = {
      val m = q % 64
      if (m < 32) s"((h2 >> $m) & 1)" else s"((h1 >> ${m - 32}) & 1)"
    }
    (0 until 32).map { j =>
      val i = half * 32 + j
      s"(CASE WHEN ${pix(p1Of(i))} < ${pix(p2Of(i))} THEN ${1L << j}::BIGINT ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** The analytic dHash of a [[MultimodalOps.renderPatternImage]]
    * image: dHash bit i (gy = i/8, gx = i%8) compares pattern bits at
    * pixel positions gy·9+gx and gy·9+gx+1 (mod 64). */
  private def imageDhashHalfSql(half: Int): String =
    patternCmpHalfSql(half, i => (i / 8) * 9 + i % 8, i => (i / 8) * 9 + i % 8 + 1)

  /** The analytic [[MultimodalOps.audioFingerprint]] of a
    * [[MultimodalOps.renderToneWav]] clip: bit i compares the energies
    * of tone frames i and i+1, whose amplitudes encode pattern bits
    * (i mod 64) and ((i+1) mod 64) — frame 64 wraps to bit 0. */
  private def audioFpHalfSql(half: Int): String =
    patternCmpHalfSql(half, i => i, i => (i + 1) % 64)

  /** Guard replay over a `dh(doc_id, d1, d2)` CTE (the two 32-bit
    * halves of a 64-bit signature): banding, occupancy/purity windows,
    * star and capped-slice arms, per-pair merge — the relational twin
    * of `DedupOps.cappedSimhashPairsFromSignatures(maxHamming = 6,
    * bands = 8, maxBucketSize = 8)`, shared by q206/q208. */
  private def simhashGuardReplaySql: String =
    """bk AS (
      |  SELECT doc_id, d1, d2, band,
      |    CASE WHEN band < 4 THEN (d2 >> (band * 8)) & 255
      |         ELSE (d1 >> ((band - 4) * 8)) & 255 END AS block
      |  FROM dh, (SELECT unnest(generate_series(0, 7)) AS band) b),
      |ann AS MATERIALIZED (
      |  SELECT doc_id, d1, d2, band, block,
      |    count(*) OVER w AS occ,
      |    row_number() OVER (PARTITION BY band, block ORDER BY doc_id) AS rn,
      |    min(doc_id) OVER w AS rep,
      |    (min(d1) OVER w = max(d1) OVER w
      |     AND min(d2) OVER w = max(d2) OVER w) AS pure
      |  FROM bk WINDOW w AS (PARTITION BY band, block)),
      |star AS (
      |  SELECT rep AS id_a, doc_id AS id_b, 0 AS ham, 0 AS capped
      |  FROM ann WHERE occ > 8 AND pure AND doc_id <> rep),
      |jn AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    bit_count(xor(a.d1, b.d1)) + bit_count(xor(a.d2, b.d2)) AS ham,
      |    CASE WHEN a.occ > 8 THEN 1 ELSE 0 END AS capped
      |  FROM ann a JOIN ann b
      |    ON a.band = b.band AND a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE (a.occ <= 8 OR (NOT a.pure AND a.rn <= 8))
      |    AND (b.occ <= 8 OR (NOT b.pure AND b.rn <= 8))
      |    AND bit_count(xor(a.d1, b.d1)) + bit_count(xor(a.d2, b.d2)) <= 6),
      |pr AS (
      |  SELECT id_a, id_b, min(ham) AS ham, min(capped) AS capped
      |  FROM (SELECT * FROM star UNION ALL SELECT * FROM jn)
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(ham AS BIGINT) AS hamming,
      |  CAST(capped AS INT) AS capped
      |FROM pr ORDER BY id_a, id_b""".stripMargin
}
