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
  *  - All hashing uses xxhash64 with per-function seeds — deterministic
  *    across runs and cluster sizes.
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

  /** MinHash signatures, one row per document: shingle→xxhash64 ONCE,
    * explode, then `numHashes` cheap `min(rot(h ⊕ b, r))` aggregates
    * (map-side combined). This shape hashes each shingle exactly once —
    * computing the signature as one nested array expression re-evaluates
    * the shingle pipeline per hash function, which benchmarked 30×
    * slower. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
                        shingleSize: Int, numHashes: Int): DataFrame = {
    val coeffs = hashCoeffs(numHashes)
    val exploded = df.select(id.as("doc_id"),
      explode(transform(TextOps.shingles(text, shingleSize), s => xxhash64(s))).as("h"))
    val mins = coeffs.zipWithIndex.map { case ((b, r), i) =>
      val x = col("h").bitwiseXOR(lit(b))
      min(shiftleft(x, r).bitwiseOR(shiftrightunsigned(x, 64 - r))).as(s"m_$i")
    }
    exploded.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** LSH band keys: split the signature into `bands` bands of
    * `numHashes/bands` rows; each band hashed to one bucket key. Emits an
    * array of (band, bucket) structs for explode+join. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")))).as("bucket")))

  /** Candidate near-duplicate pairs via MinHash LSH: documents sharing
    * any (band, bucket). Returns distinct (id_a, id_b) with id_a < id_b,
    * plus the estimated Jaccard from full signature agreement. */
  def minhashCandidatePairs(df: DataFrame, id: Column, text: Column,
                            shingleSize: Int = 3, numHashes: Int = 32,
                            bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(df, id, text, shingleSize, numHashes)
    // NOTE: the two join branches re-derive the signature stage (their
    // projections differ, so ReuseExchange does not apply). A measured
    // attempt to share one pre-shuffled plan via a self-alias join was
    // 8x SLOWER (forced repartition defeats AQE); two cheap signature
    // passes win.
    val keyed = sigs
      .select(col("doc_id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bb"))
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

  /** Exact n-gram Jaccard similarity between two texts' shingle sets. */
  def ngramJaccard(textA: Column, textB: Column, k: Int = 3): Column = {
    val sa = array_distinct(TextOps.shingles(textA, k))
    val sb = array_distinct(TextOps.shingles(textB, k))
    val inter = size(array_intersect(sa, sb)).cast(DoubleType)
    val union = (size(sa) + size(sb)).cast(DoubleType) - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** SimHash-64 per document: each token's xxhash64 contributes +1/−1 to
    * 64 bit positions; positive positions set the output bit.
    *
    * Shaped as explode(tokens) → 64 codegen'd `sum` aggregates → one
    * bit-packing projection. A per-row `aggregate`/`zip_with` array
    * expression computes the same thing but runs interpreted, ~5×
    * slower. The shuffle is map-side combined: (doc, 64 longs) per
    * partition, not per token. Documents with no tokens are dropped. */
  def simhashSignatures(df: DataFrame, id: Column, text: Column): DataFrame = {
    val exploded = df.select(id.as("doc_id"),
      explode(TextOps.tokens(text)).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val sums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$b")
    }
    exploded.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * sign-LSH over the first `signBits` dimensions so only same-bucket
    * pairs are compared (plus, for recall, callers can union several
    * rotations; exactness is traded for the bucket join's scalability). */
  def embeddingNearDupPairs(df: DataFrame, id: Column, vec: Column,
                            threshold: Double, signBits: Int = 8): DataFrame = {
    val bucketed = df.select(
      id.as("vid"), vec.as("v"),
      SimilarityOps.signBucket(vec, signBits).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vid").as("id_a"), col("v").as("va"))
    val b = bucketed.select(col("bucket"), col("vid").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", SimilarityOps.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
