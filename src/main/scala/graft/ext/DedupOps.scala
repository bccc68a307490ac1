package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design:
  *  - Exact dedup = hash-groupBy: one shuffle on a 128-bit digest.
  *  - MinHash signatures and SimHash are per-row array arithmetic
  *    (no shuffle, codegen'd); LSH banding turns the O(n²) pair search
  *    into a shuffle on (band, band-hash) bucket keys, so the join only
  *    compares documents that collide in ≥1 band — the standard way this
  *    survives 100 TB. Candidate verification (exact Jaccard) runs only
  *    on the candidate pairs.
  *  - Hashing is deterministic across runs and cluster sizes; the
  *    default `portable = true` family ([[PortableHash]], md5-derived
  *    universal hashing) is additionally reproducible in ANY engine
  *    with md5 — so MinHash/SimHash pipelines are DuckDB-oracle-
  *    verifiable end to end. `portable = false` switches to xxhash64
  *    (engine-specific, ~2× cheaper per value) for pure-throughput use.
  */
object DedupOps {

  /** Exact duplicate classes: one row per distinct text digest with its
    * multiplicity. `keepFirst` semantics are a `min(doc_id)` away. */
  def exactDupClasses(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("digest"))
      .agg(count(lit(1)).as("copies"), min(id).as("keep_id"))

  /** Exact dedup: keep one row per distinct text. */
  def exactDedup(df: DataFrame, text: Column): DataFrame =
    df.withColumn("__digest", md5(text)).dropDuplicates("__digest").drop("__digest")

  /** Deterministic per-function (xor-mask, rotation) pairs — seeded, so
    * signatures are stable across runs and cluster sizes. XOR + rotate
    * instead of multiply-add: bit ops never overflow, so the expression
    * is safe under Spark 4's default ANSI mode. */
  private def hashCoeffs(numHashes: Int): Seq[(Long, Int)] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(numHashes)(i => (rnd.nextLong(), i % 63 + 1))
  }

  /** The per-hash-function min aggregates for one exploded base-hash
    * column `h`: portable = universal-hash mixes mod 2³¹−1 (the
    * [[PortableHash]] family — oracle-expressible in DuckDB); fast =
    * xor-rotate over xxhash64 (engine-specific, ~2× cheaper). */
  private def minhashAggs(numHashes: Int, portable: Boolean): Seq[Column] =
    if (portable)
      PortableHash.coeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
        min(PortableHash.mix(col("h"), a, b)).as(s"m_$i")
      }
    else
      hashCoeffs(numHashes).zipWithIndex.map { case ((b, r), i) =>
        val x = col("h").bitwiseXOR(lit(b))
        min(shiftleft(x, r).bitwiseOR(shiftrightunsigned(x, 64 - r))).as(s"m_$i")
      }

  /** Per-shingle base hash (applied AFTER the explode, so it runs as a
    * codegen'd column expression, not inside an interpreted lambda). */
  private def shingleBase(s: Column, portable: Boolean): Column =
    if (portable) PortableHash.base(s) else xxhash64(s)

  /** MinHash signatures, one row per document: shingle→base-hash ONCE,
    * explode, then `numHashes` cheap arithmetic `min` aggregates
    * (map-side combined). This shape hashes each shingle exactly once —
    * computing the signature as one nested array expression re-evaluates
    * the shingle pipeline per hash function, which benchmarked 30×
    * slower. With `portable = true` (default) the signature values are
    * reproducible in any engine with md5 — see [[PortableHash]]. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
                        shingleSize: Int, numHashes: Int,
                        portable: Boolean = true): DataFrame = {
    val exploded = df
      .select(id.as("doc_id"), explode(TextOps.shingles(text, shingleSize)).as("s"))
      .select(col("doc_id"), shingleBase(col("s"), portable).as("h"))
    val mins = minhashAggs(numHashes, portable)
    exploded.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** LSH band keys: split the signature into `bands` bands of
    * `numHashes/bands` rows; each band keyed to one bucket. Emits an
    * array of (band, bucket) structs for explode+join. Portable buckets
    * are the joined signature-value string itself (exactly DuckDB's
    * `array_to_string(list_slice(sig, …), ',')`); the xxhash64 form
    * compresses it to a long for leaner shuffle keys. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int,
                  portable: Boolean = true): Column = {
    val key: Column => Column = if (portable) identity else (xxhash64(_))
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        key(concat_ws(",",
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")))).as("bucket")))
  }

  /** Candidate near-duplicate pairs via MinHash LSH: documents sharing
    * any (band, bucket). Returns distinct (id_a, id_b) with id_a < id_b,
    * plus the estimated Jaccard from full signature agreement. */
  def minhashCandidatePairs(df: DataFrame, id: Column, text: Column,
                            shingleSize: Int = 3, numHashes: Int = 32,
                            bands: Int = 8, portable: Boolean = true,
                            release: Boolean = false): DataFrame = {
    // persisted: both band-join branches read ONE MinHash derivation
    // from cache (lazy persist — AQE-safe; r1 measured that an eager
    // localCheckpoint and a self-alias join both LOSE, but a plain
    // persist wins, same as minhashVerifiedPairs)
    val sigs = minhashSignatures(df, id, text, shingleSize, numHashes, portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = candidatePairsFromSignatures(sigs, numHashes, bands, portable)
    graft.CachePolicy.finish(release, Seq(sigs))(pairs)
  }

  /** The LSH band-join half of [[minhashCandidatePairs]], over an
    * ALREADY-COMPUTED `(doc_id, sig)` frame — the entry point for
    * callers that amortize the signature pass (a persisted
    * [[SignatureStore]], a cached frame, a checkpoint). The caller owns
    * the persistence of `sigs`; both band branches reference it twice. */
  def candidatePairsFromSignatures(sigs: DataFrame, numHashes: Int = 32,
                                   bands: Int = 8,
                                   portable: Boolean = true): DataFrame = {
    val rowsPerBand = numHashes / bands
    val keyed = sigs
      .select(col("doc_id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand, portable)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = keyed.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = keyed.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast(DoubleType) / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** Candidate pairs with AT LEAST ONE endpoint in `deltaSigs`, probed
    * against the full `allSigs` index — the band join's incremental
    * form for corpus-delta maintenance: a delta re-bands only the
    * TOUCHED signatures and joins them against the maintained
    * signature frame, so the work is (touched × bucket mates), never
    * all × all. [[graft.etl.FrameMaintenance]] composes this with an
    * anti-join carry of the previous pair frame to roll the durable
    * `mhpairs` artifact forward. Output matches
    * [[candidatePairsFromSignatures]] (id_a < id_b, est_jaccard). */
  def incrementalCandidatePairs(deltaSigs: DataFrame, allSigs: DataFrame,
                                numHashes: Int = 32, bands: Int = 8,
                                portable: Boolean = true): DataFrame = {
    val rowsPerBand = numHashes / bands
    def keyed(df: DataFrame, suffix: String) = df
      .select(col("doc_id").as("id" + suffix), col("sig").as("sig" + suffix),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand, portable)).as("bb"))
      .select(col("id" + suffix), col("sig" + suffix),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    keyed(deltaSigs, "_d").join(keyed(allSigs, "_x"), Seq("band", "bucket"))
      .filter(col("id_d") =!= col("id_x"))
      .select(least(col("id_d"), col("id_x")).as("id_a"),
        greatest(col("id_d"), col("id_x")).as("id_b"),
        // est is symmetric, so endpoint order doesn't matter
        (aggregate(zip_with(col("sig_d"), col("sig_x"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast(DoubleType) / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** [[candidatePairsFromSignatures]] with a HOT-BUCKET GUARD — the
    * 100×-robustness form for corpora where one bucket concentrates a
    * huge member list (boilerplate-heavy corpora at chunk granularity:
    * identical license headers, navigation chrome, templated pages).
    * The plain band join pairs every bucket quadratically; one
    * million-member bucket is 5·10¹¹ intermediate rows on a single
    * shuffle key. Two bounded arms replace it above `maxBucketSize`:
    *
    *  - a bucket whose signatures are ALL identical is a pure duplicate
    *    class — its members are pairwise est_jaccard 1.0 BY DEFINITION,
    *    so pairing them is pure waste. It collapses to a star:
    *    (min-id representative, member) edges, m−1 rows instead of
    *    C(m,2), with the class fully recoverable by transitivity
    *    (exactly what downstream union-find consumes).
    *  - an oversized MIXED bucket emits all pairs of its
    *    DETERMINISTIC first-`maxBucketSize` members by id, flagged
    *    `capped = true` — the q126/q176 size-gate precedent: bounded
    *    and labeled, never silently quadratic.
    *
    * Buckets at or below the cap pair exactly as the plain form, so
    * with a cap no bucket exceeds the output is IDENTICAL to
    * [[candidatePairsFromSignatures]] plus a constant-false `capped`
    * column (spec-pinned). The occupancy/rank/purity annotations ride
    * one window over the SAME (band, bucket) shuffle key the join
    * needs — the guard costs a sort within each bucket, O(m log m)
    * where the unguarded join pays O(m²). */
  def cappedCandidatePairsFromSignatures(sigs: DataFrame, numHashes: Int = 32,
                                         bands: Int = 8,
                                         portable: Boolean = true,
                                         maxBucketSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rowsPerBand = numHashes / bands
    val keyed = sigs
      .select(col("doc_id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand, portable)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val w = Window.partitionBy("band", "bucket")
    val sigStr = concat_ws(",", transform(col("sig"), _.cast("string")))
    val ann = keyed
      .withColumn("sigstr", sigStr)
      .withColumn("occ", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy("doc_id")))
      .withColumn("rep", min("doc_id").over(w))
      .withColumn("pure", min("sigstr").over(w) === max("sigstr").over(w))
      .drop("sigstr")
    val star = ann
      .filter(col("occ") > maxBucketSize && col("pure") &&
        col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"),
        lit(1.0).as("est_jaccard"), lit(false).as("capped"))
    val joinable = ann.filter(col("occ") <= maxBucketSize ||
      (!col("pure") && col("rn") <= maxBucketSize))
    val a = joinable.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"),
      (col("occ") > maxBucketSize).as("capped"))
    val b = joinable.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val joined = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast(DoubleType) / lit(numHashes.toDouble)).as("est_jaccard"),
        col("capped"))
    // a pair reachable through ANY full-fidelity bucket is uncapped
    joined.unionByName(star)
      .groupBy("id_a", "id_b")
      .agg(max(col("est_jaccard")).as("est_jaccard"),
        (min(col("capped").cast("int")) === 1).as("capped"))
  }

  /** MinHash signatures with the document text carried through the
    * aggregate (`first(text)` partial-aggregates map-side, so the
    * shuffle carries one text per doc per map partition — the same bytes
    * a join-back would move, without the extra join). */
  private def minhashWithText(df: DataFrame, id: Column, text: Column,
                              shingleSize: Int, numHashes: Int,
                              portable: Boolean): DataFrame = {
    // two projections: aliasing `text` and referencing the caller's
    // `text` column in ONE select trips Spark's lateral-column-alias
    // resolution (INTERNAL_ERROR LateralColumnAliasReference)
    val base = df.select(id.as("doc_id"), text.as("text"))
    val exploded = base
      .select(col("doc_id"), col("text"),
        explode(TextOps.shingles(col("text"), shingleSize)).as("s"))
      .select(col("doc_id"), col("text"), shingleBase(col("s"), portable).as("h"))
    val mins = minhashAggs(numHashes, portable)
    val aggs = first(col("text")).as("text") +: mins
    exploded.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), col("text"),
        array((0 until numHashes).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** Candidate pairs + exact n-gram Jaccard verify in ONE pass: the
    * signature frame is persisted (lazy cache — AQE-compatible, unlike
    * an eager localCheckpoint) so the two band-join branches compute the
    * MinHash stage once, and the text rides along through the band
    * explode so no join-back to the corpus is needed. Returns
    * (id_a, id_b, est_jaccard, jaccard). */
  def minhashVerifiedPairs(df: DataFrame, id: Column, text: Column,
                           shingleSize: Int = 3, numHashes: Int = 32,
                           bands: Int = 8, estThreshold: Double = 0.5,
                           portable: Boolean = true,
                           release: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashWithText(df, id, text, shingleSize, numHashes, portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = sigs
      .select(col("doc_id"), col("text"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand, portable)).as("bb"))
      .select(col("doc_id"), col("text"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = keyed.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"), col("text").as("text_a"))
    val b = keyed.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"), col("text").as("text_b"))
    val verified = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast(DoubleType) / lit(numHashes.toDouble)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("est_jaccard") >= estThreshold)
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), shingleSize))
      .select("id_a", "id_b", "est_jaccard", "jaccard")
    graft.CachePolicy.finish(release, Seq(sigs))(verified)
  }

  /** [[minhashVerifiedPairs]] over PRECOMPUTED signatures (a
    * [[SignatureStore]]) — the amortized end-to-end near-dup path: no
    * signature recompute; texts for the exact-Jaccard verify join back
    * from the corpus for the (candidate-sized, tiny) filtered pair set
    * only. Output contract identical to minhashVerifiedPairs. */
  def verifiedPairsFromSignatures(sigs: DataFrame, corpus: DataFrame,
                                  id: Column, text: Column,
                                  shingleSize: Int = 3, numHashes: Int = 32,
                                  bands: Int = 8, estThreshold: Double = 0.5,
                                  portable: Boolean = true): DataFrame = {
    val docs = corpus.select(id.as("doc_id"), text.as("text"))
    candidatePairsFromSignatures(sigs, numHashes, bands, portable)
      .filter(col("est_jaccard") >= estThreshold)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), shingleSize))
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** Jaccard similarity of two ALREADY-MATERIALIZED distinct shingle
    * arrays. Callers computing similarity per candidate PAIR should
    * materialize `array_distinct(TextOps.shingles(text, k))` per
    * document BEFORE the pair join and use this — inlining the full
    * shingle pipeline into a per-pair expression makes Catalyst
    * re-derive it for every reference (no CSE for interpreted
    * higher-order functions; measured ~8 copies in the q46 plan). */
  def jaccardFromShingleSets(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast(DoubleType)
    val union = (size(sa) + size(sb)).cast(DoubleType) - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Exact n-gram Jaccard similarity between two texts' shingle sets. */
  def ngramJaccard(textA: Column, textB: Column, k: Int = 3): Column =
    jaccardFromShingleSets(
      array_distinct(TextOps.shingles(textA, k)),
      array_distinct(TextOps.shingles(textB, k)))

  /** SimHash-64 per document: each token's 64-bit hash contributes
    * +1/−1 to 64 bit positions; positive positions set the output bit.
    *
    * Shaped as explode(tokens) → SWAR-packed codegen'd `sum` aggregates
    * → one unpack+bit-pack projection over the per-doc rows. A per-row
    * `aggregate`/`zip_with` array expression computes the same thing
    * but runs interpreted, ~5× slower. The per-bit counters are packed
    * THREE 20-bit lanes per long (bit b rides long b/3, lane b%3), so
    * the aggregation updates 22 sum buffers per token instead of 64 —
    * and sums plain 1-bit lane values, with the ±1 recovered afterwards
    * as 2·ones_b − n (same sign test, so outputs are bit-identical).
    * The shuffle is map-side combined: (doc, 22 longs + count) per
    * partition, not per token. Documents with no tokens are dropped.
    * Lane width bounds documents at 2^20 tokens — beyond that a lane
    * overflows; pre-split pathological documents upstream. */
  def simhashSignatures(df: DataFrame, id: Column, text: Column,
                        portable: Boolean = true): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("t"))
    // portable: the 64-bit pattern is two 32-bit halves of ONE md5
    // digest prefix (reproducible in DuckDB); fast: xxhash64 directly
    val exploded =
      if (portable) tok.withColumn("p64", PortableHash.prefix64(col("t")))
        .select(col("doc_id"),
          PortableHash.int32(col("p64"), 0).as("h1"),
          PortableHash.int32(col("p64"), 1).as("h2"))
      else tok.select(col("doc_id"), xxhash64(col("t")).as("h"))
    def bitOf(b: Int): Column =
      if (portable) {
        val (src, sh) = if (b < 32) ("h1", b) else ("h2", b - 32)
        shiftright(col(src), sh).bitwiseAND(1)
      } else shiftright(col("h"), b).bitwiseAND(1)
    val nLongs = (64 + 2) / 3 // 22
    val packed = (0 until nLongs).map { j =>
      val lanes = (0 until 3).map(i => j * 3 + i).filter(_ < 64).map { b =>
        // lanes are 20 bits apart and each holds a 0/1 summand — lane
        // sums stay disjoint for up to 2^20 tokens, so + never carries
        shiftleft(bitOf(b).cast(LongType), (b % 3) * 20)
      }
      sum(lanes.reduce(_ + _)).as(s"p_$j")
    }
    val aggs = packed :+ count(lit(1)).as("n_tok")
    exploded.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { b =>
          val ones = shiftrightunsigned(col(s"p_${b / 3}"), (b % 3) * 20)
            .bitwiseAND(lit((1L << 20) - 1))
          // sum(±1) > 0  ⇔  2·ones − n > 0
          when(ones * 2 > col("n_tok"), lit(1L << b)).otherwise(lit(0L))
        }.reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with hamming distance ≤ `maxHamming`,
    * found via the standard band trick: split the 64-bit hash into
    * `bands` contiguous blocks — two hashes within hamming k < bands
    * must agree EXACTLY on at least one block (pigeonhole), so
    * candidates are a bucket join on (band, block-bits), never an
    * all-pairs scan. Exact hamming verifies the survivors. Requires
    * maxHamming < bands for completeness within the candidate set. */
  def simhashNearDupPairs(df: DataFrame, id: Column, text: Column,
                          maxHamming: Int = 3, bands: Int = 4,
                          portable: Boolean = true,
                          release: Boolean = false): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming ($maxHamming) < bands ($bands)")
    val bits = 64 / bands
    val sigs = simhashSignatures(df, id, text, portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("block"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.block"))
    val a = keyed.select(col("band"), col("block"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("band"), col("block"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    // hamming is a pure per-pair function, so the verify runs BEFORE
    // the cross-band dedup: the dropDuplicates shuffle then carries
    // only true near-dup pairs instead of every band collision (on a
    // clustered corpus the collision volume is the dominant term —
    // the round-11 sf1 sweep measured the old order shuffling 100×
    // more rows than survive the filter)
    val pairs = a.join(b, Seq("band", "block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
    graft.CachePolicy.finish(release, Seq(sigs))(pairs)
  }

  /** [[simhashNearDupPairs]] with the HOT-BUCKET GUARD — the SimHash
    * block join has exactly the mega-bucket exposure the MinHash band
    * join has ([[cappedCandidatePairsFromSignatures]]): a
    * boilerplate-heavy corpus concentrates IDENTICAL simhashes into
    * one (band, block) bucket and the within-bucket pairing goes
    * quadratic. Same two bounded arms over an ALREADY-COMPUTED
    * `(doc_id, simhash)` frame: an all-identical bucket is a hamming-0
    * clique and collapses to the min-id representative star (m−1 rows,
    * the class recoverable by transitivity); an oversized mixed bucket
    * emits the deterministic first-cap slice flagged `capped = true`.
    * At-or-below-cap buckets pair exactly as the plain form, so with a
    * never-exceeded cap the output is [[simhashNearDupPairs]] plus a
    * constant-false `capped` column (spec-pinned). */
  def cappedSimhashPairsFromSignatures(sigs: DataFrame, maxHamming: Int = 3,
                                       bands: Int = 4,
                                       maxBucketSize: Int = 64): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming ($maxHamming) < bands ($bands)")
    import org.apache.spark.sql.expressions.Window
    val bits = 64 / bands
    val keyed = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("block"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.block"))
    val w = Window.partitionBy("band", "block")
    val ann = keyed
      .withColumn("occ", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy("doc_id")))
      .withColumn("rep", min("doc_id").over(w))
      .withColumn("pure", min("simhash").over(w) === max("simhash").over(w))
    val star = ann
      .filter(col("occ") > maxBucketSize && col("pure") &&
        col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"),
        lit(0).as("hamming"), lit(false).as("capped")) // bit_count is int
    val joinable = ann.filter(col("occ") <= maxBucketSize ||
      (!col("pure") && col("rn") <= maxBucketSize))
    val a = joinable.select(col("band"), col("block"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"),
      (col("occ") > maxBucketSize).as("capped"))
    val b = joinable.select(col("band"), col("block"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val joined = a.join(b, Seq("band", "block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"), col("capped"))
      .filter(col("hamming") <= maxHamming)
    // hamming is the same for a pair wherever it is found; a pair
    // reachable through ANY full-fidelity bucket is uncapped
    joined.unionByName(star)
      .groupBy("id_a", "id_b")
      .agg(min(col("hamming")).as("hamming"),
        (min(col("capped").cast("int")) === 1).as("capped"))
  }

  /** Sentinel for `signBits`: size the bucket width from the corpus
    * count via [[SimilarityOps.autoSignBits]] (occupancy-targeted —
    * ~1000 vectors/bucket). This is the production default: a pinned
    * bit width that balances buckets at one scale goes quadratic at
    * 1000× (the sf100 rehearsal measured exactly this at signBits=6);
    * the count is one metadata-cheap pass over parquet footers. */
  val AutoBits = 0

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed
    * by sign-LSH over `signBits` seeded random hyperplanes (see
    * [[Hyperplanes]] — random projections keep buckets balanced where
    * raw leading dimensions would skew them) so only same-bucket pairs
    * are compared. For recall, callers can union several seeds;
    * exactness is traded for the bucket join's scalability.
    * `signBits` defaults to [[AutoBits]] = corpus-count-sized. */
  def embeddingNearDupPairs(df: DataFrame, id: Column, vec: Column,
                            threshold: Double, dim: Int,
                            signBits: Int = AutoBits, seed: Long = 7L,
                            release: Boolean = false): DataFrame = {
    val bits =
      if (signBits == AutoBits) SimilarityOps.autoSignBits(df.count())
      else signBits
    // persisted: the a/b join branches read ONE bucket+norm pass from
    // cache instead of re-deriving the (wide, codegen'd) hyperplane
    // projection over the full corpus twice
    val bucketed = df.select(
      id.as("vid"), vec.as("v"),
      SimilarityOps.signBucket(vec, dim, bits, seed).as("bucket"),
      SimilarityOps.l2Norm(vec).as("vn")) // norm once per doc, not per pair
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("bucket"), col("vid").as("id_a"),
      col("v").as("va"), col("vn").as("na"))
    val b = bucketed.select(col("bucket"), col("vid").as("id_b"),
      col("v").as("vb"), col("vn").as("nb"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        SimilarityOps.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    graft.CachePolicy.finish(release, Seq(bucketed))(pairs)
  }

  /** Embedding near-dup pairs with AT LEAST ONE endpoint in
    * `deltaVecs`, probed against the full `allVecs` set — the sign-LSH
    * analogue of [[incrementalCandidatePairs]] for corpus-delta
    * maintenance of the `embpairs` family frame. `signBits`/`seed`
    * MUST match the stored family's (they define the bucket geometry;
    * the family key carries the bits for exactly this reason — an
    * auto-sized width re-derived at the NEW corpus count could differ
    * and silently mix semantics). Output matches
    * [[embeddingNearDupPairs]]: (id_a < id_b, cosine ≥ threshold). */
  def incrementalEmbeddingPairs(deltaVecs: DataFrame, allVecs: DataFrame,
                                id: Column, vec: Column, threshold: Double,
                                dim: Int, signBits: Int,
                                seed: Long = 7L): DataFrame = {
    def bucketed(df: DataFrame, suffix: String) = df.select(
      id.as("id" + suffix), vec.as("v" + suffix),
      SimilarityOps.signBucket(vec, dim, signBits, seed).as("bucket"),
      SimilarityOps.l2Norm(vec).as("n" + suffix))
    bucketed(deltaVecs, "_d").join(bucketed(allVecs, "_x"), Seq("bucket"))
      .filter(col("id_d") =!= col("id_x"))
      .withColumn("cosine", SimilarityOps.cosineWithNorms(
        col("v_d"), col("v_x"), col("n_d"), col("n_x")))
      .filter(col("cosine") >= threshold)
      .select(least(col("id_d"), col("id_x")).as("id_a"),
        greatest(col("id_d"), col("id_x")).as("id_b"), col("cosine"))
      .dropDuplicates("id_a", "id_b")
  }

  // ── Cluster resolution: pairs → connected components → keep-one ────

  /** Connected components over a candidate-pair edge list: returns
    * (doc_id, cluster_id) for every id that appears in `pairs`, where
    * cluster_id = the MINIMUM id in the component (so the canonical
    * "keep" doc falls out as doc_id == cluster_id).
    *
    * Algorithm: iterative min-label propagation with one-hop pointer
    * compression per round — each round is two shuffles on the id key
    * (neighbor-min aggregate + parent lookup), and the compression step
    * makes labels chase pointers so convergence is O(log component
    * diameter), not O(diameter). Each round's label frame is
    * checkpointed (localCheckpoint — on a cluster, reliable checkpoint)
    * to truncate the logical plan: iterating raw DataFrames grows the
    * Catalyst plan per round and analysis time explodes. Convergence is
    * detected by a changed-row count. This is the standard way
    * components survive a 100 TB edge list — no driver-side union-find,
    * no collect. */
  def resolveClusters(pairs: DataFrame, maxIters: Int = 25): DataFrame =
    resolveClustersCounted(pairs, maxIters)._1

  /** [[resolveClusters]] plus the number of propagate/compress rounds it
    * took to converge — the observable for the O(log diameter) claim
    * (the chain-graph spec pins rounds ≤ log₂(diameter)+2: each round's
    * compress reads the SAME round's propagated labels, so label reach
    * roughly doubles per round even on a path graph). */
  private[graft] def resolveClustersCounted(pairs: DataFrame,
                                            maxIters: Int = 25): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    // both edge directions from ONE pass over `pairs` (an explode, not
    // a self-union — the union re-derived the caller's whole candidate
    // pipeline twice; for LSH pair generators that pipeline is the
    // expensive part)
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").cast(LongType).as("src"), col("id_b").cast(LongType).as("dst")),
        struct(col("id_b").cast(LongType).as("src"), col("id_a").cast(LongType).as("dst"))
      )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init = the first propagate round fused into label creation:
    // label₀(v) = min(v, min neighbour) comes straight out of the edge
    // aggregate, so cliques/stars converge one full round (two joins +
    // checkpoint + count) earlier than the label₀(v) = v start.
    // Lazily persisted, NOT checkpointed: an eager checkpoint here costs
    // a full extra job round-trip before round 1 even starts; with
    // persist, round 1's own checkpoint action materializes init once
    // and both of its join branches read the cache.
    var initCache: Option[DataFrame] = None
    var labels = {
      val l = edges.groupBy(col("src").as("id"))
        .agg(min("dst").as("nbr"))
        .select(col("id"), least(col("id"), col("nbr")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      initCache = Some(l)
      l
    }
    var iter = 0
    var done = false
    // superseded round checkpoints are unpersisted as soon as the next
    // round has materialized past them — without this, a long-iterating
    // resolution leaves one registered RDD per round until GC
    var prevCk: Option[DataFrame] = None
    while (!done && iter < maxIters) {
      iter += 1
      // propagate: candidate label = min(own, min over neighbours)
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("label").as("nbr"))
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      // compress: follow the label pointer ONE hop (label ids are node
      // ids, so the parent's label is defined for every label value);
      // the pre-compression old label rides along so the convergence
      // check is a filter over the checkpointed frame, not another join.
      // (A two-hop pointer-jumping variant was measured at sf0.1:
      // 6.1 s vs 5.7 s across q44/q47/q48 — dup-cluster graphs are
      // near-cliques that converge in ~2 rounds, so the extra same-key
      // join per round is pure overhead. Large-diameter graphs do NOT
      // tip the other way: because this one-hop compress reads the SAME
      // round's propagated labels, reach still ~doubles per round — a
      // 1024-node chain converges in ≤ log₂(d)+2 rounds, spec-pinned.)
      val parent = prop.select(col("id").as("label"), col("label").as("plabel"))
      // lazy checkpoint: the convergence count below is the action that
      // materializes it, so each round runs ONE job (eager checkpoint +
      // count was two); the plan is truncated either way
      val next = prop.join(parent, Seq("label"), "left")
        .select(col("id"), col("old"),
          coalesce(col("plabel"), col("label")).as("label"))
        .localCheckpoint(eager = false)
      initCache.foreach(_.unpersist()) // round 1 has materialized past it
      initCache = None
      val changed = next.filter(col("label") =!= col("old")).count()
      prevCk.foreach(_.unpersist(false)) // this count materialized past it
      prevCk = Some(next)
      labels = next.select("id", "label")
      done = changed == 0
    }
    edges.unpersist()
    (labels.select(col("id").as("doc_id"), col("label").as("cluster_id")), iter)
  }

  /** End-to-end near-dedup of an EMBEDDING corpus: hyperplane-LSH
    * cosine pairs → connected components → keep the minimum-id vector
    * per cluster. Same resolution machinery as the text path; the
    * pair graph is genuinely non-clique (a~b, b~c above threshold with
    * a~c below it still merge transitively). */
  def nearDedupEmbeddings(df: DataFrame, id: Column, vec: Column,
                          threshold: Double, dim: Int,
                          signBits: Int = AutoBits, seed: Long = 7L,
                          release: Boolean = false): DataFrame = {
    val pairs = embeddingNearDupPairs(df, id, vec, threshold, dim, signBits, seed,
      release = release)
      .select("id_a", "id_b")
    val losers = resolveClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__loser_id"))
    df.join(losers, id === col("__loser_id"), "left_anti")
  }

  /** End-to-end near-dedup of a corpus: MinHash-LSH candidates →
    * exact-Jaccard verify → connected components → keep the minimum-id
    * document of each duplicate cluster. Returns the surviving rows of
    * `df` (anti-join against the non-keepers — the corpus itself never
    * collects anywhere). */
  def nearDedup(df: DataFrame, id: Column, text: Column,
                shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
                jaccardThreshold: Double = 0.8,
                release: Boolean = false): DataFrame = {
    val pairs = minhashVerifiedPairs(df, id, text, shingleSize, numHashes, bands,
      estThreshold = 0.5, release = release)
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b")
    val losers = resolveClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__loser_id"))
    df.join(losers, id === col("__loser_id"), "left_anti")
  }

  /** Deterministic train/val/test split: a `split` label column from the
    * portable hash of (id, salt) against cumulative fraction thresholds.
    * Narrow projection — no shuffle, no sampling state; the assignment
    * is stable across runs, engines and cluster sizes, which is what a
    * training pipeline needs (re-runs must not migrate documents across
    * splits). Change `salt` to draw a fresh independent split. */
  def assignSplit(df: DataFrame, id: Column,
                  fractions: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = (PortableHash.base(concat(id.cast("string"), lit(":" + salt)))
      % 1000000L).cast(DoubleType) / 1e6
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = fractions.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) {
        case ((name, c), acc) => when(u < c, lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** The same split label as DuckDB SQL (the oracle side): thresholds
    * are emitted from the SAME Scala-computed cumulative doubles
    * (0.8 + 0.1 is 0.9000000000000001 in both engines only if the
    * literal round-trips — hence the ::DOUBLE casts). */
  def assignSplitSql(idExpr: String, fractions: Seq[(String, Double)],
                     salt: String = "split"): String = {
    val u = s"(((('0x' || substr(md5($idExpr || ':$salt'), 1, 15))::BIGINT" +
      s" % ${PortableHash.P}) % 1000000) / 1e6)"
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val whens = fractions.map(_._1).zip(cum).dropRight(1)
      .map { case (name, c) => s"WHEN $u < ($c)::DOUBLE THEN '$name'" }
      .mkString(" ")
    s"(CASE $whens ELSE '${fractions.last._1}' END)"
  }
}
