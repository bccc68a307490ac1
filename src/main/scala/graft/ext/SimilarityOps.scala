package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths, per the standard design:
  *  - `bruteForceTopK` — exact baseline: broadcast the (small) query set
  *    against the corpus; one corpus scan, dot products via `zip_with` +
  *    `aggregate` (codegen'd, no UDF), per-query top-k via window. Scales
  *    linearly in corpus size; right answer, O(|Q|·|C|) work.
  *  - `lshTopK` — scale path: sign-LSH bucket join. Corpus and queries
  *    hash to sign-pattern buckets over the leading dimensions; only
  *    same-bucket candidates are scored. Recall < 1 by construction;
  *    `probeBits` trades recall for candidate volume.
  */
object SimilarityOps {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Sign-LSH bucket id from the signs of the first `bits` dimensions:
    * an integer in [0, 2^bits). Deterministic, engine-agnostic. */
  def signBucket(vec: Column, bits: Int): Column =
    aggregate(
      zip_with(slice(vec, 1, bits), sequence(lit(0), lit(bits - 1)),
        (x, i) => when(x.cast(DoubleType) >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

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
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
      .orderBy("qid", "rank")
  }

  /** IVF-style index: `nlist` centroids picked deterministically from
    * the corpus (hash-ordered sample — a real deployment would k-means;
    * the plumbing is identical), plus the corpus with each vector
    * assigned to its nearest centroid. Returns (centroids, assigned).
    *
    * Scale shape: centroids broadcast everywhere; assignment is ONE
    * corpus scan (cross join with the tiny broadcast list + per-row
    * argmax via max(struct)). The assigned table is the inverted file:
    * searches touch only `nprobe/nlist` of it. */
  def ivfIndex(corpus: DataFrame, nlist: Int): (DataFrame, DataFrame) = {
    val centroids = broadcast(
      corpus.orderBy(xxhash64(col("cid")))
        .limit(nlist)
        .select(col("cvec").as("centvec"))
        .withColumn("centroid_id",
          row_number().over(Window.orderBy(xxhash64(col("centvec").cast("string"))))))
    val assigned = corpus.crossJoin(centroids)
      .groupBy("cid")
      .agg(
        first("cvec").as("cvec"),
        max(struct(cosine(col("cvec"), col("centvec")).as("sim"),
          col("centroid_id"))).getField("centroid_id").as("centroid_id"))
    (centroids, assigned)
  }

  /** IVF top-k: each query probes its `nprobe` nearest centroids and
    * scores only the inverted lists behind them — the classic
    * recall-for-throughput trade at 100 TB corpus scale. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (centroids, assigned) = ivfIndex(corpus, nlist)
    val scoredProbes = queries.crossJoin(centroids)
      .withColumn("sim_c", cosine(col("qvec"), col("centvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim_c"), asc("centroid_id"))))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("centroid_id"))
    scoredProbes.join(assigned, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
      .orderBy("qid", "rank")
  }

  /** Approximate top-k via sign-LSH bucket join: candidates must share
    * the query's sign bucket. Same output shape as `bruteForceTopK`. At
    * cluster scale both sides shuffle (or broadcast) on the bucket key,
    * so the pair space shrinks by ~2^bits for near-uniform data. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 8): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col("qvec"), bits))
    val cb = corpus.withColumn("bucket", signBucket(col("cvec"), bits))
    cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cosine", "rank")
      .orderBy("qid", "rank")
  }
}
