package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.QueryCaches.Pinned

/** Deterministic random-hyperplane family for sign-LSH.
  *
  * Components are seeded Gaussians ROUNDED TO 6 DECIMALS so the exact
  * same numbers are expressible as literals in oracle SQL: both engines
  * then evaluate the identical left-associated double-precision sum, so
  * the sign test agrees bit-for-bit.
  *
  * Why hyperplanes and not the signs of the leading raw dimensions:
  * real embeddings have correlated leading dims, which piles most of the
  * corpus into a few buckets — one reducer then owns the hot bucket at
  * 100 TB. A random projection decorrelates the bits, so bucket sizes
  * concentrate around n/2^bits.
  */
object Hyperplanes {

  /** `bits` hyperplanes of `dim` 6-decimal components. Deterministic in
    * (dim, bits, seed) — across runs, engines, cluster sizes. */
  def planes(dim: Int, bits: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(math.floor(rnd.nextGaussian() * 1e6 + 0.5) / 1e6))
  }

  /** Codegen'd literal dot product: Σ vec[i]·w[i] expanded to a
    * left-associated chain of multiply-adds (a higher-order `aggregate`
    * over a literal array would run interpreted). */
  def dotLit(vec: Column, w: Seq[Double]): Column =
    w.zipWithIndex.map { case (c, i) =>
      element_at(vec, i + 1).cast(DoubleType) * lit(c)
    }.reduce(_ + _)

  /** Sign-LSH bucket id in [0, 2^bits): bit i set iff dot(vec, plane_i)
    * ≥ 0. One custom codegen'd expression node ([[graft.functions
    * .VecExpressions.MatSignBucket]]): the dim×bits literal-chain form
    * this replaces cost ~1.5 s of Catalyst ANALYSIS per run on the
    * multi-table LSH query — plan size, not task time. Accumulation
    * order is identical, so bucket ids (and every oracle) are
    * unchanged. Narrow, codegen'd, zero shuffle. */
  def bucket(vec: Column, dim: Int, bits: Int, seed: Long = 7L): Column =
    graft.functions.VecExpressions.matSignBucket(vec,
      planes(dim, bits, seed).map(_.toArray).toArray)

  /** The SAME bucket computation as DuckDB SQL over `vecExpr` (a FLOAT[]
    * column). Literals are ::DOUBLE-cast — DuckDB would otherwise parse
    * them as DECIMAL and diverge from Spark's double arithmetic. */
  def bucketSql(vecExpr: String, dim: Int, bits: Int, seed: Long = 7L): String =
    planes(dim, bits, seed).zipWithIndex.map { case (p, i) =>
      val dot = p.zipWithIndex
        .map { case (c, j) => s"$vecExpr[${j + 1}]::DOUBLE * ($c)::DOUBLE" }
        .mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Three paths, per the standard design:
  *  - `bruteForceTopK` — exact baseline: broadcast the (small) query set
  *    against the corpus; one corpus scan, dot products via `zip_with` +
  *    `aggregate`, per-query top-k via the native bounded-heap
  *    aggregate. Right answer, O(|Q|·|C|) compares but O(|Q|·k) state.
  *  - `lshTopK` — sign-LSH bucket join over random hyperplanes; only
  *    same-bucket candidates are scored. `tables` unions several
  *    independent hyperplane families for recall.
  *  - `ivfTopK` — IVF: spherical k-means centroids (broadcast literals,
  *    shuffle-free assignment), searches probe only `nprobe/nlist` of
  *    the corpus. The index is built once per (corpus, params) and
  *    persisted — queries reuse it.
  */
object SimilarityOps {

  /** Dot product of two float/double-array columns, accumulated in
    * double. A custom codegen'd expression ([[graft.functions
    * .VecExpressions.VecDot]]) — the `aggregate(zip_with(...))` form it
    * replaces is a higher-order function: interpreted per ROW, which
    * made it the dominant per-pair cost in candidate scoring. Same
    * left-to-right accumulation from 0.0 — bit-identical results. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecExpressions.vecDot(a, b)

  /** L2 norm of a float-array column. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Cosine from PRE-COMPUTED norms: bit-identical to `cosine` (same op
    * order: d / (na·nb)) but only ONE array traversal per pair. The
    * candidate-scoring paths materialize each side's norm once per
    * DOCUMENT before the pair join — per-pair norm recomputation was 3
    * interpreted array traversals where one suffices. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val n = na * nb
    when(n > 0, dot(a, b) / n).otherwise(lit(0.0))
  }

  /** Sign-LSH bucket id from `bits` seeded random hyperplanes (see
    * [[Hyperplanes]]). `dim` is the embedding dimensionality. */
  def signBucket(vec: Column, dim: Int, bits: Int, seed: Long = 7L): Column =
    Hyperplanes.bucket(vec, dim, bits, seed)

  /** The sign-LSH bit count that keeps expected bucket occupancy near
    * `targetBucket` vectors: ceil(log2(n / targetBucket)), clamped.
    * The bucketed pair joins are Θ(n²/2^bits) comparisons, so `bits`
    * MUST grow with the corpus — the round-6 sf10 rehearsal measured
    * the same 500k-vector join at 12 s with 6 bits and 1.9 s with 14
    * (BENCH_sf10.json). Fixed-bit callers (oracle-pinned queries) are
    * the small-corpus configuration; services sizing for an unknown n
    * should pass `autoSignBits(corpus.count())`. More bits trade
    * recall for that bound — recover recall by unioning several
    * `seed`s, which multiplies work linearly, never quadratically. */
  def autoSignBits(n: Long, targetBucket: Long = 1000L,
                   minBits: Int = 4, maxBits: Int = 24): Int = {
    require(n >= 0 && targetBucket > 0)
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(maxBits, math.max(minBits, needed))
  }

  /** Per-query top-k over a scored candidate frame (qid, cid, <score>),
    * via [[graft.functions.TopKAgg.topKByScore]]: an ObjectHashAggregate
    * with map-side partial combine whose per-group state is a k-capped
    * heap. Identical ordering to the former
    * `row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid)`
    * idiom (ties → lower cid; NaN sorts largest), but the shuffle
    * carries |Q| heap buffers per partition instead of EVERY scored
    * row, and no full-candidate sort exists in the plan — the sf100
    * rehearsal caught the window form spending 26 min in one straggler
    * task sorting a 2M-row query group single-threaded. */
  /** Per-query top-k over an already-scored candidate frame
    * (qid, cid, <score>) — public so recall/cost evals can pin ONE
    * candidate frame and both count it and rank it. Bounded-heap
    * aggregate, deterministic tiebreak on cid (see scaladoc below). */
  def rankTopK(scored: DataFrame, score: String, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topKByScore(col("cid"), col(score), k)
        .as("__top"))
      .select(col("qid"), posexplode(col("__top")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as(score), (col("pos") + 1).as("rank"))
      .orderBy("qid", "rank")

  /** Exact brute-force cosine top-k.
    * `queries`: (qid, qvec); `corpus`: (cid, cvec). Returns
    * (qid, cid, cosine, rank) with rank 1..k per query, deterministic
    * tiebreak on cid. Queries are broadcast — the corpus is scanned once
    * regardless of |Q|, which is the correct 100 TB plan when |Q| is
    * small. Self-matches (qid == cid) are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    rankTopK(scored, "cosine", k)
  }

  /** Hard-negative mining for contrastive training: per query, the k
    * most-similar corpus vectors carrying a DIFFERENT label — the
    * standard way to build (anchor, hard-negative) pairs for embedding
    * fine-tuning. `queries`: (qid, qvec, qlabel); `corpus`:
    * (cid, cvec, clabel). Same plan shape as [[bruteForceTopK]]
    * (broadcast queries, one corpus scan, bounded-heap top-k — no
    * full-candidate sort); the label-mismatch test is evaluated BEFORE
    * the cosine, so same-label pairs never pay the array traversal.
    * NULL-label semantics (deliberate, SQL-standard): `clabel =!= qlabel`
    * is three-valued, so a NULL on EITHER side drops the pair — a
    * null-labeled corpus vector is never returned as a negative, and a
    * null-labeled query gets zero negatives. This matches the DuckDB
    * `<>` oracle exactly (portability is why the filter is not
    * null-safe); callers with partially-labeled corpora who want
    * unlabeled vectors treated as cross-label should pre-fill labels
    * (e.g. `coalesce(label, '∅')`) before calling.
    * Swap the corpus scan for an LSH/IVF candidate stage when the
    * corpus outgrows a single pass per query batch. */
  def hardNegativesTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("clabel") =!= col("qlabel"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    rankTopK(scored, "cosine", k)
  }

  /** Exact top-k over int8-QUANTIZED vectors: both sides are quantized
    * by [[graft.functions.VecExpressions.Int8Quantize]] and scored by
    * the cosine of the integer CODE vectors — the per-vector scales
    * cancel in the cosine, so the score is pure small-integer
    * arithmetic: 4× (fp32) less candidate-stage memory/shuffle at a
    * bounded rank perturbation (spec: ≥0.8 top-k overlap vs fp32 on the
    * test embeddings). Integer dots are exact, so the ranking is
    * deterministic and reproducible in any engine. Same output shape as
    * [[bruteForceTopK]], score column `qcos`. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.functions.VecExpressions.int8Quantize
    val qq = queries.select(col("qid"), int8Quantize(col("qvec")).as("qvec"))
    val qc = corpus.select(col("cid"), int8Quantize(col("cvec")).as("cvec"))
    rankTopK(qc.crossJoin(broadcast(qq))
      .filter(col("qid") =!= col("cid"))
      .withColumn("qcos", cosine(col("qvec"), col("cvec"))), "qcos", k)
  }

  /** Approximate top-k via sign-LSH bucket join: candidates must share
    * the query's bucket in at least one of `tables` hyperplane families.
    * Same output shape as `bruteForceTopK`. At cluster scale both sides
    * shuffle (or broadcast) on the bucket key, so the pair space shrinks
    * by ~2^bits per table for near-uniform data; extra tables buy recall
    * at proportional candidate cost. Don't guess `tables`: declare a
    * recall target and let [[tuneLshTables]] pick it from the measured
    * sampled curve. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 8, tables: Int = 1): DataFrame =
    lshImpl(queries, corpus, k, dim, bits, tables,
      quantize = false, score = "cosine")

  /** [[lshTopK]] with the candidate payload QUANTIZED to int8 codes:
    * buckets are still derived from the fp32 vectors (an index-build-
    * time decision — full precision is available there), but everything
    * that flows through the bucket join and the scoring stage is the 4×
    * smaller code vector, and the score is the cosine of the CODES
    * (scales cancel; integer dots are exact, so the ranking is engine-
    * reproducible). This is the 100 TB composition: the bucketed
    * candidate structure bounds WHO gets compared, the codes bound the
    * BYTES each comparison moves. Score column `qcos`. */
  def lshQuantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       dim: Int, bits: Int = 8, tables: Int = 1): DataFrame =
    lshImpl(queries, corpus, k, dim, bits, tables,
      quantize = true, score = "qcos")

  /** The candidate-generation half of [[lshTopK]]: the deduped
    * same-bucket pair frame (qid, qvec, qnorm, cid, cvec, cnorm) before
    * scoring. Public so evals (q182) can measure the CANDIDATE COST of
    * an index configuration on the exact frame the production search
    * scores — with `tables > 1` the corpus-side bucketed frame is
    * persisted internally so every table's join reads one cache. */
  def lshCandidates(queries: DataFrame, corpus: DataFrame,
                    dim: Int, bits: Int, tables: Int = 1,
                    quantize: Boolean = false): DataFrame =
    lshCandImpl(queries, corpus, dim, bits, tables, quantize)

  /** Multi-probe sign-LSH candidates over ONE hyperplane table: each
    * query probes its own bucket plus the `probes` single-bit-flip
    * neighbor buckets (default all `bits` — the full Hamming-1 ring).
    * The probe fan-out lives entirely on the broadcast QUERY side
    * (|Q|·(probes+1) rows); the corpus is bucketed and shuffled ONCE —
    * vs `tables`-table LSH which recomputes/marshals a second bucket
    * column per table. Distinct probe masks give disjoint candidate
    * sets, so no dedup pass is needed. The classic recall/memory
    * trade (Lv et al., VLDB 2007): one index, wider probes. */
  def multiProbeCandidates(queries: DataFrame, corpus: DataFrame,
                           dim: Int, bits: Int, probes: Int = -1,
                           seed: Long = 7L): DataFrame = {
    val np = if (probes < 0) bits else math.min(probes, bits)
    val masks = lit(0L) +: (0 until np).map(i => lit(1L << i))
    val cb = corpus
      .withColumn("cbucket", Hyperplanes.bucket(col("cvec"), dim, bits, seed))
      .withColumn("cnorm", l2Norm(col("cvec")))
    val qb = broadcast(queries
      .withColumn("qbucket0", Hyperplanes.bucket(col("qvec"), dim, bits, seed))
      .withColumn("qnorm", l2Norm(col("qvec")))
      .select(col("qid"), col("qvec"), col("qnorm"),
        explode(array(masks.map(m => col("qbucket0").bitwiseXOR(m)): _*))
          .as("qbucket")))
    cb.join(qb, col("cbucket") === col("qbucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qvec", "qnorm", "cid", "cvec", "cnorm")
  }

  /** Top-k via [[multiProbeCandidates]] — same output shape and
    * ranking semantics as [[lshTopK]], score column `cosine`. */
  def multiProbeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     dim: Int, bits: Int, probes: Int = -1,
                     seed: Long = 7L): DataFrame =
    rankTopK(multiProbeCandidates(queries, corpus, dim, bits, probes, seed)
      .withColumn("cosine",
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm"))),
      "cosine", k)

  private def lshImpl(queries: DataFrame, corpus: DataFrame, k: Int,
                      dim: Int, bits: Int, tables: Int,
                      quantize: Boolean, score: String): DataFrame =
    rankTopK(lshCandImpl(queries, corpus, dim, bits, tables, quantize)
      .withColumn(score,
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm"))),
      score, k)

  /** [[tuneLshTables]]'s shared scored frame: every same-bucket
    * (qid, cid) pair across `tables` hyperplane families, with its
    * cosine and the LOWEST table index that produced it —
    * (qid, cid, tmin, cosine). The cosine is evaluated per table HIT
    * and the (qid, cid) dedup aggregates (min tmin, min cosine): the
    * duplicate evaluations are rare (a pair colliding in several
    * tables) and identical-valued (pure function of the vectors, so
    * the min IS the value), and the dedup exchange then carries four
    * narrow columns instead of the two embedding payloads
    * `dropDuplicates` after a payload-carrying union would. */
  private def lshScoredWithTable(queries: DataFrame, corpus: DataFrame,
                                 dim: Int, bits: Int,
                                 tables: Int): DataFrame = {
    def bucketed(df: DataFrame, vec: String, norm: String, prefix: String) =
      (0 until tables).foldLeft(df) {
        (d, t) => d.withColumn(s"$prefix$t", signBucket(col(vec), dim, bits, 7L + t))
      }.withColumn(norm, l2Norm(col(vec)))
    val qb = broadcast(bucketed(queries, "qvec", "qnorm", "qbucket_"))
    val cb0 = bucketed(corpus, "cvec", "cnorm", "cbucket_")
    val cb = if (tables == 1) cb0
      else cb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until tables).map { t =>
      cb.join(qb, col(s"cbucket_$t") === col(s"qbucket_$t"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), lit(t).as("tmin"),
          cosineWithNorms(col("qvec"), col("cvec"),
            col("qnorm"), col("cnorm")).as("cosine"))
    }.reduce(_ unionByName _)
      .groupBy("qid", "cid")
      .agg(min("tmin").as("tmin"), min("cosine").as("cosine"))
  }

  private def lshCandImpl(queries: DataFrame, corpus: DataFrame,
                          dim: Int, bits: Int, tables: Int,
                          quantize: Boolean): DataFrame = {
    import graft.functions.VecExpressions.int8Quantize
    // ALL tables' bucket columns come from ONE pass over each side (a
    // per-table re-derivation re-scanned the corpus and recomputed the
    // norm `tables` times); with several tables the corpus frame is
    // persisted so each table's bucket join reads the same cache.
    // Buckets come from the fp32 vector; in the quantized path the
    // payload is then REPLACED by its int8 codes (norms are code norms).
    def bucketed(df: DataFrame, vec: String, norm: String, prefix: String) = {
      val b = (0 until tables).foldLeft(df) {
        (d, t) => d.withColumn(s"$prefix$t", signBucket(col(vec), dim, bits, 7L + t))
      }
      val p = if (quantize) b.withColumn(vec, int8Quantize(col(vec))) else b
      p.withColumn(norm, l2Norm(col(vec)))
    }
    val qb = broadcast(bucketed(queries, "qvec", "qnorm", "qbucket_"))
    val cb0 = bucketed(corpus, "cvec", "cnorm", "cbucket_")
    val cb = if (tables == 1) cb0
      else cb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candTables = (0 until tables).map { t =>
      cb.join(qb, col(s"cbucket_$t") === col(s"qbucket_$t"))
        .filter(col("qid") =!= col("cid"))
        .select("qid", "qvec", "qnorm", "cid", "cvec", "cnorm")
    }
    if (tables == 1) candTables.head
    else candTables.reduce(_ unionByName _).dropDuplicates("qid", "cid")
  }

  // ── IVF ────────────────────────────────────────────────────────────

  /** A fitted IVF index: unit-normalized centroid literals (index
    * metadata, lives on the driver/broadcast — NOT data-path rows) plus
    * the corpus with its per-row nearest-centroid assignment (the
    * inverted file), persisted for reuse across query batches. */
  case class IvfModel(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Dot of a vector column with an ARRAY-LITERAL centroid (used on the
    * tiny query side only — the corpus-side argmax is one
    * [[graft.functions.VecExpressions.NearestCentroid]] node). */
  private def dotArr(vec: Column, c: Array[Double]): Column =
    dot(vec, lit(c))

  /** Per-row argmax over the centroid literals: one custom codegen'd
    * expression node — zero shuffle, zero row amplification, O(1) plan
    * size. (The earlier array_max-over-structs form was interpreted;
    * the unrolled literal chain blew janino's 64 KB method limit.)
    * Ties break to the larger centroid id, as array_max did. */
  private def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.VecExpressions.nearestCentroid(vec, centroids)

  /** Lloyd-step corpus cap: the k-means refinement runs over a
    * ~`ivfFitSampleCap`-row hash-threshold sample of the corpus, not
    * the full corpus — centroid quality saturates long before the
    * corpus does, and the full-corpus fit was the once-per-corpus cold
    * price (measured 200 s at 5M×64). The sample is DETERMINISTIC and
    * engine-portable (keep rows whose [[PortableHash.base]] falls
    * below P/ceil(n/cap) — a pure filter, no sort, no shuffle), so the
    * DuckDB oracle replays it exactly ([[
    * graft.queries.QueryHelpers.ivfFitCtes]] carries the same WHERE);
    * at gate scale ceil(n/cap) == 1, the threshold admits every row,
    * and the fit is identical to the unsampled one. The FINAL
    * assignment pass always covers the full corpus, and recall against
    * a declared target stays measured, not assumed ([[tuneIvfNprobe]]
    * gates acceptability; a miss triggers the q207 refit loop as
    * before). */
  val ivfFitSampleCap: Int = 262144

  /** Fit an IVF index: deterministic hash-ordered sample init, then
    * `iters` spherical-k-means (Lloyd) refinement steps over the
    * [[ivfFitSampleCap]]-row hash-threshold sample. Each step is ONE
    * narrow sample scan (assignment = broadcast-literal argmax) plus
    * a (nlist × dim)-row partial aggregate — no crossJoin, no
    * full-corpus shuffle anywhere; only the final assignment pass
    * touches the full corpus. Centroids are unit-normalized and
    * rounded to 6 decimals so refits are bit-deterministic.
    *
    * Every arithmetic step is ENGINE-PORTABLE, so the whole fit is
    * reproducible in DuckDB SQL (q41's oracle re-derives it):
    *  - sample + init order = [[PortableHash.base]] of the id
    *    (md5-based), not xxhash64, with the id itself as tiebreak;
    *  - centroid ids = lexicographic (element-wise numeric) order of the
    *    rounded vectors — NOT a JVM toString sort;
    *  - cluster means accumulate fixed-point longs (floor(x·1e7)), an
    *    order-independent exact sum, where a double `avg` would depend
    *    on partition/accumulation order and diverge across engines. */
  def ivfFit(corpus: DataFrame, nlist: Int, iters: Int = 2): IvfModel = {
    def normRound(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => if (n > 0) math.floor(x / n * 1e6 + 0.5) / 1e6 else 0.0)
    }
    // element-wise numeric lexicographic compare — matches SQL list "<"
    def lexLess(a: Array[Double], b: Array[Double]): Boolean = {
      var i = 0
      while (i < a.length && i < b.length) {
        if (a(i) != b(i)) return a(i) < b(i)
        i += 1
      }
      a.length < b.length
    }
    // Hash-THRESHOLD sample the Lloyd steps iterate over: keep rows
    // with portable-hash(cid) < P/mod where mod = ceil(n/cap) — a
    // rank-free narrow filter, deterministic and replayable in SQL.
    // (A rank-exact ORDER BY+LIMIT prefix was measured first: its
    // global sort + single-task GlobalLimit pull cost ~60 s per fit at
    // 5M×64 — as much as the full-corpus fit it replaced.) mod == 1,
    // the gate-scale case, short-circuits to the corpus itself; the
    // count() job sizing the threshold is memoized per (session,
    // corpus plan) — the r14 verdict measured q207 paying it once per
    // fit, i.e. twice per cold run of the drift→refit loop.
    val mod = math.max(1L,
      math.ceil(memoizedCount(corpus).toDouble / ivfFitSampleCap).toLong)
    // below the cap the sample IS the caller's frame — do NOT
    // persist/unpersist it: CacheManager has no refcounting, so the
    // trailing unpersist would evict a cache entry the caller owns on
    // that exact plan (pinned corpora, FrameMaintenance's vecs)
    val sampled = mod > 1L
    val fitSample = if (!sampled) corpus
      else corpus.filter(
          PortableHash.base(col("cid").cast("string")) < PortableHash.P / mod)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[Array[Double]] = corpus
      .orderBy(PortableHash.base(col("cid").cast("string")), col("cid"))
      .limit(nlist)
      .select(col("cvec"))
      .collect()
      .map(r => normRound(r.getSeq[Float](0).map(_.toDouble).toArray))
      .sortWith(lexLess)
    for (_ <- 1 to iters) {
      val sums = fitSample
        .withColumn("centroid_id", nearestCentroid(col("cvec"), centroids))
        .select(col("centroid_id"), posexplode(col("cvec")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(sum(floor(col("x").cast(DoubleType) * 1e7).cast(org.apache.spark.sql.types.LongType)).as("sf"),
          count(lit(1)).as("n"))
        .collect()
      val byId = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { i =>
        byId.get(i) match {
          case Some(rows) =>
            normRound(rows.sortBy(_.getInt(1))
              .map(r => r.getLong(2).toDouble / r.getLong(3) / 1e7).toArray)
          case None => centroids(i) // empty cluster keeps its centroid
        }
      }.toArray
    }
    if (sampled) fitSample.unpersist()
    IvfModel(centroids, ivfAssign(corpus, centroids))
  }

  /** The inverted-file derivation alone: assign each corpus row to its
    * nearest FROZEN centroid and stamp the norm. A pure per-row
    * function of (vector, centroid literals) — which is why the
    * inverted file rolls forward under corpus deltas without a re-fit
    * ([[graft.etl.FrameMaintenance.rollForwardIvfAssigned]]): only
    * touched vectors re-assign. Centroid drift under sustained churn
    * is OBSERVABLE, not guessed — [[tuneIvfNprobe]] on the rolled file
    * measures the recall the frozen fit still buys, and a miss of the
    * target is the re-fit trigger (a NEW family key). */
  def ivfAssign(corpus: DataFrame,
                centroids: Array[Array[Double]]): DataFrame = corpus
    .withColumn("centroid_id", nearestCentroid(col("cvec"), centroids))
    .withColumn("cnorm", l2Norm(col("cvec"))) // norm lives in the index

  /** Sample-sizing count memo, keyed on the CANONICALIZED corpus plan
    * (expression ids normalized, so structurally identical frames share
    * one entry): [[ivfFit]]'s threshold-sizing `count()` runs once per
    * (session, corpus) instead of once per fit. Exactness is by plan
    * EQUALITY — a different plan is a different key — so this can never
    * serve a stale count; same lifecycle as every [[graft.SessionMemo]]
    * (entries die with the SparkContext). */
  private val corpusCounts =
    new graft.SessionMemo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long]

  private def memoizedCount(df: DataFrame): Long =
    corpusCounts.getOrBuild(df.sparkSession,
      df.queryExecution.analyzed.canonicalized)(df.count())

  /** Index cache: one fitted+persisted model per (session, caller key,
    * nlist, iters) — the index is built once and reused across query
    * batches, as a real deployment would persist it next to the corpus.
    * Keyed on the session UUID too, so a stale model never outlives
    * the SparkSession that persisted it.
    *
    * With a [[graft.etl.FrameStore]] configured the fit is DURABLE:
    * the centroid table (`(cid, pos, c)`, model-sized) and the
    * assigned inverted file (corpus-sized) publish once per
    * (cacheKey, nlist, iters), and a fresh session re-hydrates the
    * model from parquet instead of re-running the k-means collects. */
  private val modelCache =
    new graft.SessionMemo[(String, Int, Int), IvfModel]

  def ivfFitCached(cacheKey: String, corpus: DataFrame,
                   nlist: Int, iters: Int = 2): IvfModel =
    modelCache.getOrBuild(corpus.sparkSession, (cacheKey, nlist, iters)) {
      val s = corpus.sparkSession
      // the fit runs lazily at most once: the centroid publish forces
      // it; the assigned frame then reuses the same model object
      lazy val fitted = ivfFit(corpus, nlist, iters)
      val centFrame = graft.etl.FrameStore.getOrBuild(
          s, cacheKey, s"ivf-$nlist-$iters-centroids") {
        import s.implicits._
        fitted.centroids.zipWithIndex.flatMap { case (cv, cid) =>
          cv.zipWithIndex.map { case (c, pos) => (cid, pos, c) }
        }.toSeq.toDF("cid", "pos", "c")
      }
      val centroids = centFrame.collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
      val assigned = graft.etl.FrameStore.getOrBuild(
          s, cacheKey, s"ivf-$nlist-$iters-assigned")(fitted.assigned)
      IvfModel(centroids,
        assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** IVF top-k: each query probes its `nprobe` nearest centroids and
    * scores only the inverted lists behind them — the classic
    * recall-for-throughput trade at 100 TB corpus scale. Don't guess
    * `nprobe`: declare a recall target and let [[ivfTopKForRecall]] /
    * [[tuneIvfNprobe]] pick it from the measured sampled curve.
    *
    * Plan shape: each broadcast query row carries its probe-id ARRAY
    * (top-nprobe centroids, a projection over the centroid literals),
    * and probe membership is the JOIN CONDITION (`array_contains`) —
    * one broadcast join over the cached inverted file, the same stage
    * count as the brute-force scan, with the cosine evaluated only on
    * the ~nprobe/nlist of pairs that survive the cheap membership
    * test. (A separate explode+equi-join probe stage measured ~0.2 s
    * of pure extra stage overhead per run.) */
  def ivfTopK(queries: DataFrame, model: IvfModel, k: Int, nprobe: Int): DataFrame = {
    val probeStructs = array_sort(array(model.centroids.zipWithIndex.map {
      case (c, i) =>
        struct((-dotArr(col("qvec"), c)).as("negsim"), lit(i).as("cid"))
    }: _*))
    val qprobes = queries
      .select(col("qid"), col("qvec"), l2Norm(col("qvec")).as("qnorm"),
        transform(slice(probeStructs, 1, nprobe), p => p.getField("cid"))
          .as("probe_ids"))
    rankTopK(model.assigned.join(broadcast(qprobes),
        array_contains(col("probe_ids"), col("centroid_id")) &&
          col("qid") =!= col("cid"))
      .withColumn("cosine",
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm"))),
      "cosine", k)
  }

  /** Convenience overload: fit (or reuse via `cacheKey`) then search. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              cacheKey: Option[String] = None): DataFrame = {
    val model = cacheKey match {
      case Some(key) => ivfFitCached(key, corpus, nlist)
      case None => ivfFit(corpus, nlist)
    }
    ivfTopK(queries, model, k, nprobe)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings with the IVF
    * spherical-k-means fit, then drop every document whose cosine to a
    * LOWER-id document in the SAME cluster is ≥ `tau` (greedy
    * keep-first — deterministic, relationally expressible, and equal
    * to SemDeDup's keep-one-per-semantic-group up to representative
    * choice). Returns the surviving (cid, cvec, centroid_id) rows.
    *
    * Scale shape: the pair join is confined to cluster mates —
    * Θ(n²/nlist) comparisons — so `nlist` MUST grow with the corpus
    * (SemDeDup runs ~10⁵ clusters at billion scale; size for expected
    * cluster occupancy the way [[autoSignBits]] sizes sign-LSH
    * buckets). The fit is shared via `cacheKey` exactly like the ANN
    * queries: one persisted index serves both search and dedup. */
  def semanticDedup(corpus: DataFrame, tau: Double, nlist: Int = 16,
                    cacheKey: Option[String] = None): DataFrame = {
    val model = cacheKey match {
      case Some(key) => ivfFitCached(key, corpus, nlist)
      case None => ivfFit(corpus, nlist)
    }
    val a = model.assigned.select(col("centroid_id"), col("cid").as("id_a"),
      col("cvec").as("v_a"), col("cnorm").as("n_a"))
    val b = model.assigned.select(col("centroid_id"), col("cid").as("id_b"),
      col("cvec").as("v_b"), col("cnorm").as("n_b"))
    val dropped = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b") &&
        cosineWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")) >= tau)
      .select(col("id_b").as("cid")).distinct()
    model.assigned.join(dropped, Seq("cid"), "left_anti")
      .select(col("cid"), col("cvec"), col("centroid_id"))
  }

  /** IVF search over an int8-QUANTIZED inverted file: probe selection
    * stays fp32 (query × centroid literals — full precision is free on
    * the tiny query side), but the inverted-file payload that the probe
    * join scans is the 4× smaller code vector and the score is the
    * cosine of the CODES. This is the IVF face of the same composition
    * as [[lshQuantizedTopK]]: the index bounds who is compared, the
    * codes bound the bytes per comparison — at 100 TB the quantized
    * inverted file IS what a deployment persists (here it is a narrow
    * codegen'd projection over the cached fp32 file, so the fit stays
    * shared with [[ivfTopK]]). Score column `qcos`. */
  def ivfQuantizedTopK(queries: DataFrame, model: IvfModel, k: Int,
                       nprobe: Int): DataFrame = {
    import graft.functions.VecExpressions.int8Quantize
    val probeStructs = array_sort(array(model.centroids.zipWithIndex.map {
      case (c, i) =>
        struct((-dotArr(col("qvec"), c)).as("negsim"), lit(i).as("cid"))
    }: _*))
    val qprobes = queries
      .select(col("qid"), col("qvec"),
        transform(slice(probeStructs, 1, nprobe), p => p.getField("cid"))
          .as("probe_ids"))
      .withColumn("qvec", int8Quantize(col("qvec")))
      .withColumn("qnorm", l2Norm(col("qvec")))
    val inv = model.assigned
      .select(col("cid"), col("centroid_id"), int8Quantize(col("cvec")).as("cvec"))
      .withColumn("cnorm", l2Norm(col("cvec")))
    rankTopK(inv.join(broadcast(qprobes),
        array_contains(col("probe_ids"), col("centroid_id")) &&
          col("qid") =!= col("cid"))
      .withColumn("qcos",
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm"))),
      "qcos", k)
  }

  /** Convenience overload: fit (or reuse via `cacheKey`) then search
    * the quantized inverted file. */
  def ivfQuantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       nlist: Int, nprobe: Int,
                       cacheKey: Option[String]): DataFrame = {
    val model = cacheKey match {
      case Some(key) => ivfFitCached(key, corpus, nlist)
      case None => ivfFit(corpus, nlist)
    }
    ivfQuantizedTopK(queries, model, k, nprobe)
  }

  // ── Recall-targeted auto-tuning ─────────────────────────────────────

  /** Measured IVF operating scoreboard + config pick — the step that
    * ACTS on the q193-style diagnostic curve instead of leaving the
    * dial to the caller: recall@k of every candidate `nprobe` against
    * the exact ground truth on `sampleQueries` (the standard sampled
    * protocol — exact search on a handful of anchors is affordable at
    * any corpus size), and `chosen = true` on the CHEAPEST config whose
    * measured recall meets `targetRecallFp` (fixed-point, 10000 =
    * 100 %) — falling back to the deepest candidate when none does
    * (nprobe = nlist is exact up to assignment, so a reachable target
    * always has a config). Columns: nprobe, hits, possible, recall_fp,
    * probed_fp (expected corpus fraction scanned, fp), chosen.
    *
    * Cost shape: one brute-force pass over the sample anchors plus one
    * probe join per candidate, all off the SAME cached fit — this is a
    * calibration run a deployment pays once per (corpus, index),
    * exactly like the fit itself. */
  def tuneIvfNprobe(sampleQueries: DataFrame, corpus: DataFrame,
                    model: IvfModel, k: Int, targetRecallFp: Long,
                    candidates: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame =
    if (candidates.max >= model.centroids.length)
      // the deepest arm probes EVERY centroid, so its candidate set is
      // all (qid ≠ cid) pairs and its cosine is the same arithmetic as
      // the brute-force pass — the exact ground truth falls out of the
      // shared scored frame for free and the separate corpus pass is
      // pure duplication (measured: one of q196's two full-corpus
      // scoring passes)
      withChosen(armBoard(None, sampleQueries, model, k, candidates),
        targetRecallFp)
    else
      tuneIvfNprobeWithExact(
        bruteForceTopK(sampleQueries, corpus, k).select("qid", "cid")
          .pin(), // sample-sized, but repeated calibrations must be drain()-able
        sampleQueries, model, k, targetRecallFp, candidates)

  /** [[tuneIvfNprobe]] against a PRECOMPUTED exact top-k frame — the
    * ground truth is model-independent, so a caller measuring several
    * candidate indexes over one corpus (the drift→refit maintenance
    * loop) pays the brute-force pass once instead of per model. */
  def tuneIvfNprobeWithExact(exact: DataFrame, sampleQueries: DataFrame,
                             model: IvfModel, k: Int, targetRecallFp: Long,
                             candidates: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame =
    withChosen(ivfArmBoard(exact, sampleQueries, model, k, candidates),
      targetRecallFp)

  /** The cheapest-meeting-target selection over an arm board. */
  private def withChosen(arms: DataFrame, targetRecallFp: Long): DataFrame = {
    val pick = arms.agg(
      min(when(col("recall_fp") >= targetRecallFp, col("nprobe"))).as("picked"),
      max(col("nprobe")).as("deepest"))
    arms.crossJoin(broadcast(pick))
      .withColumn("chosen",
        col("nprobe") === coalesce(col("picked"), col("deepest")))
      .drop("picked", "deepest")
  }

  /** The measured scoreboard shared by [[tuneIvfNprobeWithExact]] (which
    * adds the cheapest-meeting-target pick) and the raw-curve consumers
    * (q193): (nprobe, hits, possible, recall_fp, probed_fp) per
    * candidate.
    *
    * All arms read ONE pinned scored-candidate frame built at the
    * DEEPEST candidate depth, each row carrying its probe rank `pr`
    * (the position of the candidate's centroid in the query's probe
    * order): arm np's candidate set is exactly the `pr <= np` slice, so
    * its top-k is [[rankTopK]] over that filter — row-identical to
    * `ivfTopK(queries, model, k, np)` (same probe membership, same
    * cosine expression, same bounded-heap ranking) while the probe join
    * and the per-pair cosines run ONCE instead of once per arm (the
    * per-arm form paid Σ np/nlist corpus passes — 31/16 for the default
    * dial; this pays max/nlist). The per-arm top-k is |Q|·k rows and is
    * broadcast into the recall semi join — the SortMergeJoin (2
    * exchanges + 2 sorts per arm) the unhinted semi join planned is
    * gone. */
  def ivfArmBoard(exact: DataFrame, sampleQueries: DataFrame,
                  model: IvfModel, k: Int,
                  candidates: Seq[Int]): DataFrame =
    armBoard(Some(exact), sampleQueries, model, k, candidates)

  /** [[ivfArmBoard]] body; `exactOpt = None` derives the ground truth
    * from the shared scored frame itself (valid only when the deepest
    * candidate probes every centroid — then the `pr` filter is
    * vacuous and the frame scores every qid ≠ cid pair, i.e. IS the
    * brute-force pass). */
  private def armBoard(exactOpt: Option[DataFrame], sampleQueries: DataFrame,
                       model: IvfModel, k: Int,
                       candidates: Seq[Int]): DataFrame = {
    val nlist = model.centroids.length.toLong
    val maxNp = candidates.max
    require(exactOpt.isDefined || maxNp >= nlist,
      s"exact-free board needs a full-depth arm: max candidate $maxNp < nlist $nlist")
    val probeStructs = array_sort(array(model.centroids.zipWithIndex.map {
      case (c, i) =>
        struct((-dotArr(col("qvec"), c)).as("negsim"), lit(i).as("cid"))
    }: _*))
    val qprobes = sampleQueries
      .select(col("qid"), col("qvec"), l2Norm(col("qvec")).as("qnorm"),
        transform(slice(probeStructs, 1, maxNp), p => p.getField("cid"))
          .as("probe_ids"))
    val scored = model.assigned.join(broadcast(qprobes),
        array_contains(col("probe_ids"), col("centroid_id")) &&
          col("qid") =!= col("cid"))
      .withColumn("pr", array_position(col("probe_ids"), col("centroid_id")))
      .withColumn("cosine",
        cosineWithNorms(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .select("qid", "cid", "pr", "cosine")
      .pin() // candidate-sized (≤ |Q|·n·maxNp/nlist); drain()-tracked
    val exact = exactOpt.getOrElse(
      rankTopK(scored, "cosine", k).select("qid", "cid")
        .pin()) // sample-sized; reread by every arm + the possible rollup
    candidates.map { np =>
      exact.join(
          broadcast(rankTopK(scored.filter(col("pr") <= np), "cosine", k)
            .select("qid", "cid")),
          Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(exact.agg(count(lit(1)).as("possible"))))
        .select(lit(np.toLong).as("nprobe"), col("hits"), col("possible"),
          expr("(10000 * hits) div possible").as("recall_fp"),
          lit(10000L * np / nlist).as("probed_fp"))
    }.reduce(_ unionAll _)
  }

  /** Sign-LSH analogue of [[tuneIvfNprobe]] over the TABLE-count dial:
    * recall@k per candidate table count (extra hyperplane families buy
    * recall at proportional candidate cost), cheapest config meeting
    * the target chosen. Columns: tables, hits, possible, recall_fp,
    * chosen. */
  def tuneLshTables(sampleQueries: DataFrame, corpus: DataFrame, k: Int,
                    dim: Int, bits: Int, targetRecallFp: Long,
                    candidates: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val exact = bruteForceTopK(sampleQueries, corpus, k).select("qid", "cid")
      .pin() // sample-sized, but repeated calibrations must be drain()-able
    // ONE scored candidate frame at the DEEPEST table count, each row
    // stamped with the LOWEST table index that produced it: arm t's
    // candidate set is exactly the `tmin < t` slice (the per-table
    // candidate sets nest by construction — same families, same seeds),
    // so the corpus bucketing + pair cosines run once instead of once
    // per arm (the per-arm form re-derived tables 0..t-1 for every t:
    // Σ t = 2× the work for the default q198 dial). `tmin` = min table
    // index over a pair's collisions ≡ membership in the t-table union
    // for every t ≥ tmin+1; scoring after the (qid, cid) dedup is the
    // same value lshImpl computes (cosine is a pure function of the
    // vectors). The per-arm top-k is |Q|·k rows, broadcast into the
    // recall semi join like the IVF board.
    val maxT = candidates.max
    val scored = lshScoredWithTable(sampleQueries, corpus, dim, bits, maxT)
      .pin() // candidate-sized; drain()-tracked
    val arms = candidates.map { t =>
      exact.join(
          broadcast(rankTopK(scored.filter(col("tmin") < t), "cosine", k)
            .select("qid", "cid")),
          Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(exact.agg(count(lit(1)).as("possible"))))
        .select(lit(t.toLong).as("tables"), col("hits"), col("possible"),
          expr("(10000 * hits) div possible").as("recall_fp"))
    }.reduce(_ unionAll _)
    val pick = arms.agg(
      min(when(col("recall_fp") >= targetRecallFp, col("tables"))).as("picked"),
      max(col("tables")).as("deepest"))
    arms.crossJoin(broadcast(pick))
      .withColumn("chosen",
        col("tables") === coalesce(col("picked"), col("deepest")))
      .drop("picked", "deepest")
  }

  /** [[ivfTopK]] at the `nprobe` [[tuneIvfNprobe]] picks for
    * `targetRecallFp` on `sampleQueries` — the documented DEFAULT way
    * to run IVF search when the caller declares a recall target rather
    * than a probe depth. The scoreboard's chosen row is config-sized,
    * so the driver-side read is index metadata, not data. */
  def ivfTopKForRecall(queries: DataFrame, sampleQueries: DataFrame,
                       corpus: DataFrame, model: IvfModel, k: Int,
                       targetRecallFp: Long,
                       candidates: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val chosen = tuneIvfNprobe(sampleQueries, corpus, model, k,
        targetRecallFp, candidates)
      .filter(col("chosen")).select("nprobe").head().getLong(0).toInt
    ivfTopK(queries, model, k, chosen)
  }
}
