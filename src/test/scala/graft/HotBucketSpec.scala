package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.DedupOps

/** The LSH band-join hot-bucket guard
  * ([[DedupOps.cappedCandidatePairsFromSignatures]]): exact below the
  * cap, bounded above it — star collapse for pure duplicate classes,
  * deterministic flagged slice for oversized mixed buckets. */
class HotBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = SparkTestSession.sfDir
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("below the cap the guarded join is the plain join plus a constant-false capped column") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val sigs = DedupOps.minhashSignatures(docs, col("doc_id"), col("text"),
        shingleSize = 3, numHashes = 32, portable = true)
      .persist()
    try {
      val exact = DedupOps.candidatePairsFromSignatures(sigs)
      val guarded = DedupOps.cappedCandidatePairsFromSignatures(
        sigs, maxBucketSize = 10000)
      assert(pairsOf(guarded.drop("capped")) == pairsOf(exact))
      assert(guarded.filter(col("capped")).count() == 0)
    } finally sigs.unpersist()
  }

  test("a pure oversized bucket collapses to the m-1 representative star at est 1.0") {
    // 10 identical signatures, cap 4: every band bucket is pure with
    // occupancy 10 — the unguarded join would emit C(10,2)=45 pairs
    val sig = Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L)
    val sigs = (1L to 10L).map(i => (i, sig)).toDF("doc_id", "sig")
    val out = DedupOps.cappedCandidatePairsFromSignatures(
      sigs, numHashes = 8, bands = 2, maxBucketSize = 4)
    val rows = pairsOf(out)
    assert(rows == (2L to 10L).map(i => (1L, i, 1.0)),
      "star edges from the min-id representative, nothing else")
    assert(out.filter(col("capped")).count() == 0,
      "the star carries the FULL class by transitivity — not a sample")
  }

  test("an oversized mixed bucket emits the deterministic first-cap slice, flagged capped") {
    // band 0 collides for all 6 docs (first 4 sig rows equal), band 1
    // is distinct per doc; cap 4 slices to ids 1..4 by id order
    val sigs = (1L to 6L).map(i =>
      (i, Seq(5L, 5L, 5L, 5L, i * 10, i * 10 + 1, i * 10 + 2, i * 10 + 3)))
      .toDF("doc_id", "sig")
    val out = DedupOps.cappedCandidatePairsFromSignatures(
      sigs, numHashes = 8, bands = 2, maxBucketSize = 4)
    val rows = out.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    val expected = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b, 0.5, true)
    assert(rows == expected,
      "all pairs among the first-cap members by id, every one flagged")
  }

  test("simhash: below the cap the guarded block join is the plain join plus a constant-false flag") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val sigs = DedupOps.simhashSignatures(docs, col("doc_id"), col("text"),
      portable = true).persist()
    try {
      val exact = DedupOps.simhashNearDupPairs(docs, col("doc_id"), col("text"))
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val guarded = DedupOps.cappedSimhashPairsFromSignatures(
        sigs, maxBucketSize = 10000)
      val gRows = guarded.orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(gRows == exact)
      assert(guarded.filter(col("capped")).count() == 0)
    } finally sigs.unpersist()
  }

  test("simhash: a pure oversized block collapses to the hamming-0 representative star") {
    val sigs = (1L to 10L).map(i => (i, 0x1234567890abcdefL))
      .toDF("doc_id", "simhash")
    val out = DedupOps.cappedSimhashPairsFromSignatures(sigs, maxBucketSize = 4)
    val rows = out.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == (2L to 10L).map(i => (1L, i, 0)))
    assert(out.filter(col("capped")).count() == 0,
      "a hamming-0 clique star is complete information, not a sample")
  }

  test("simhash: an oversized mixed block emits the deterministic first-cap slice, flagged") {
    // all 6 docs share the low 48 bits (blocks 0..2 collide, occ 6,
    // NOT pure); top-16 block has one distinct bit set per doc, so
    // every pair is hamming 2 <= 3 and survives the verify
    val sigs = (1L to 6L).map(i => (i, 0x0000123412341234L | (1L << (47 + i))))
      .toDF("doc_id", "simhash")
    val out = DedupOps.cappedSimhashPairsFromSignatures(sigs, maxBucketSize = 4)
    val rows = out.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
    val expected = for { a <- 1L to 4L; b <- (a + 1) to 4L }
      yield (a, b, 2, true)
    assert(rows == expected)
  }

  test("a pair reachable through any full-fidelity bucket is not flagged") {
    // docs 1..6 share the oversized mixed band-0 bucket (cap 4 slices
    // to 1..4), but docs 1 and 2 ALSO share a private band-1 bucket of
    // occupancy 2 — that bucket vouches for the pair at full fidelity
    val sigs = ((1L to 6L).map { i =>
      val b1 = if (i <= 2) Seq(9L, 9L, 9L, 9L)
               else Seq(i * 10, i * 10 + 1, i * 10 + 2, i * 10 + 3)
      (i, Seq(5L, 5L, 5L, 5L) ++ b1)
    }).toDF("doc_id", "sig")
    val out = DedupOps.cappedCandidatePairsFromSignatures(
      sigs, numHashes = 8, bands = 2, maxBucketSize = 4)
    val flags = out.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(3))).toMap
    assert(flags((1L, 2L)) == false)
    assert(flags((3L, 4L)) == true)
  }
}
