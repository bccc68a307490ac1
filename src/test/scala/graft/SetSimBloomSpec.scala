package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{BloomPruneOps, SetSimJoinOps}

class SetSimBloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── SetSimJoinOps.jaccardJoin ───────────────────────────────────────

  /** Brute-force reference: all pairs with den·|A∩B| ≥ num·|A∪B|. */
  private def naive(sets: Seq[(Long, Set[String])], tNum: Int, tDen: Int) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet

  test("jaccardJoin finds exactly the naive all-pairs result") {
    // near-dup cluster {1,2,3}, a borderline pair {4,5}, singles 6,7;
    // sets engineered so some pairs share MULTIPLE prefix tokens (the
    // per-pair dedup path) and 6/7 share nothing
    val sets: Seq[(Long, Set[String])] = Seq(
      1L -> Set("a", "b", "c", "d", "e"),
      2L -> Set("a", "b", "c", "d", "f"),
      3L -> Set("a", "b", "c", "d", "e", "g"),
      4L -> Set("x", "y", "z"),
      5L -> Set("x", "y", "w"),
      6L -> Set("p", "q"),
      7L -> Set("r", "s"))
    val df = sets.map { case (id, s) => (id, s.toSeq.sorted) }
      .toDF("id", "toks")
    for ((tn, td) <- Seq((6, 10), (5, 10), (8, 10), (1, 2))) {
      val got = SetSimJoinOps.jaccardJoin(df, tn, td).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == naive(sets, tn, td), s"threshold $tn/$td")
    }
  }

  test("jaccardJoin at t=1 finds only identical sets") {
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")), (3L, Seq("a", "c"))
    ).toDF("id", "toks")
    val got = SetSimJoinOps.jaccardJoin(df, 1, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  // ── BloomPruneOps ───────────────────────────────────────────────────

  test("bloom filter has no false negatives and prunes most non-members") {
    val members = (0L until 100L).map(i => i * 37L + 5L)
    val keys = members.toDF("k")
    val bits = BloomPruneOps.buildBits(keys, col("k"), mBits = 4096, k = 3)
    assert(bits.length == 64)

    // every member passes (no false negatives — the semi-join contract)
    val memberPass = keys
      .filter(BloomPruneOps.mightContain(bits, col("k"), 4096, 3)).count()
    assert(memberPass == 100L)

    // non-members: with n=100, m=4096, k=3 the fp rate is ~0.03% — even
    // a generous bound proves the prune is doing real work
    val nonMembers = (100000L until 101000L).toDF("k")
    val fpCount = nonMembers
      .filter(BloomPruneOps.mightContain(bits, col("k"), 4096, 3)).count()
    assert(fpCount <= 50L, s"false-positive count $fpCount of 1000")
  }

  test("bloom prune + exact join equals the plain semi-join") {
    val facts = (0L until 5000L).map(i => (i % 997L, i)).toDF("key", "v")
    val dim = Seq(3L, 500L, 996L, 123L).toDF("key")
    val bits = BloomPruneOps.buildBits(dim, col("key"), mBits = 4096, k = 3)
    val pruned = facts
      .filter(BloomPruneOps.mightContain(bits, col("key"), 4096, 3))
      .join(dim, Seq("key"), "left_semi")
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    val plain = facts.join(dim, Seq("key"), "left_semi")
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(pruned == plain)
  }
}
