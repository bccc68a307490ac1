package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip contract for the scale-rehearsal generator: a ScaleUp
  * output directory must be loadable through the exact same
  * `Tables.load` path the bench uses (SPARK_GRAFT_SF_DIR swap), with
  * row counts scaled and referential structure intact. Round 5's
  * advisor found the events table violated this (ts written back as
  * TimestampType while the loader unconditionally applied the
  * nanos→µs division) — the first test pins the fix.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val src = SparkTestSession.sfDir

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.run(spark, src, dir, 3)
    dir
  }

  test("events round-trips: scaled dir loads via Tables.load with TimestampType ts") {
    val scaled = Tables.load(spark, out, "events")
    assert(scaled.schema("ts").dataType == TimestampType)
    val base = Tables.load(spark, src, "events")
    assert(scaled.count() == 3 * base.count())
    // the ts VALUES survive the round trip, not just the type: the
    // original µs-truncated instants must appear verbatim in the copy
    val b = base.select("ts").limit(5).collect().map(_.getTimestamp(0)).toSet
    val s = scaled.select("ts").distinct().collect().map(_.getTimestamp(0)).toSet
    assert(b.subsetOf(s))
  }

  test("fact tables scale by factor, dimensions stay fixed") {
    for (t <- Seq("customer", "orders", "lineitem", "documents", "embeddings"))
      assert(Tables.load(spark, out, t).count() ==
        3 * Tables.load(spark, src, t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(Tables.load(spark, out, t).count() ==
        Tables.load(spark, src, t).count(), t)
  }

  test("referential structure preserved: every scaled order joins a scaled customer") {
    val c = Tables.load(spark, out, "customer").select("c_custkey")
    val o = Tables.load(spark, out, "orders").select("o_custkey")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
  }

  test("similarity structure scales linearly: clusters replicate, copies are not mutual dups") {
    import org.apache.spark.sql.functions._
    import graft.ext.DedupOps
    // near-dup candidate pairs must be exactly factor x the base count:
    // each planted cluster re-appears once per copy, and copies of one
    // doc (jaccard ~= 0.25 after marker mutation) never pair up. The
    // round-5 trailing salt failed this — every doc became a
    // factor-clique and pairs grew quadratically (q35: 49x time for
    // 10x data at the sf10 rehearsal).
    def textPairs(dir: String) = DedupOps.minhashCandidatePairs(
      Tables.load(spark, dir, "documents"), col("doc_id"), col("text"))
      .filter(col("est_jaccard") >= 0.5).count()
    assert(textPairs(out) == 3 * textPairs(src))
    // embeddings: the per-copy signed shift is an isometry, so the
    // round-5 disaster mode (every vector a factor-sized cosine-1
    // clique with its own copies) is what must be pinned dead: copies
    // of the SAME vector never pair (measured cross-copy self-cosine
    // tops out ~0.33, below the 0.4 threshold). Rotated UNRELATED
    // vectors may coincidentally land within threshold across blocks —
    // those are true pairs of the scaled dataset, bounded by the exact
    // cosine verify; require them rare relative to corpus size.
    val dim = Tables.load(spark, src, "embeddings")
      .select(size(col("embedding"))).first().getInt(0)
    val vp = DedupOps.embeddingNearDupPairs(
      Tables.load(spark, out, "embeddings"), col("vec_id"), col("embedding"),
      threshold = 0.4, dim = dim, signBits = 6)
    val stride = 10000L
    val sameVecCrossCopy = vp.filter(
      pmod(col("id_a"), lit(stride)) === pmod(col("id_b"), lit(stride)) &&
        floor(col("id_a") / stride) =!= floor(col("id_b") / stride)).count()
    assert(sameVecCrossCopy == 0,
      "copies of one vector paired up — the factor-clique storm is back")
    val crossBlock = vp.filter(
      floor(col("id_a") / stride) =!= floor(col("id_b") / stride)).count()
    val nScaled = Tables.load(spark, out, "embeddings").count()
    assert(crossBlock < nScaled / 10,
      s"$crossBlock cross-block coincidence pairs for $nScaled vectors")
    assert(vp.count() > 0)
  }

  test("a representative events bench query runs against the scaled dir") {
    // q04 is the flagship hourly profile — the exact query family the
    // rehearsal exists for; rows>0 proves the swapped SF dir is usable
    assert(SparkEntry.queries("q04_hourly_profile")(spark, out).count() > 0)
  }
}
