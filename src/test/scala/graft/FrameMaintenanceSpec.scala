package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{FrameMaintenance, FrameStore}
import graft.ext.{DedupOps, ExactSubstrOps}

/** Incremental FrameStore maintenance: a corpus-delta roll-forward
  * publishes frames under the new snapshot that are ROW-IDENTICAL to a
  * full rebuild, while untouched documents are carried by reference
  * from the old stored artifacts (sentinel-pinned). */
class FrameMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 8

  private def tok(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  // 0/1 share a passage; 4/5 share another; the delta deletes doc 1
  // (flips doc 0's grams dup->unique), updates doc 4 (flips doc 5),
  // and inserts doc 10 as a copy of doc 2 (flips doc 2 unique->dup)
  private def oldDocs = Seq(
    (0L, s"${tok(10, "p")} ${tok(4, "a")}"),
    (1L, s"${tok(3, "b")} ${tok(10, "p")}"),
    (2L, tok(14, "c")),
    (3L, tok(12, "d")),
    (4L, s"${tok(9, "q")} ${tok(5, "e")}"),
    (5L, s"${tok(5, "f")} ${tok(9, "q")}"),
    (6L, tok(12, "g")),
    (7L, tok(12, "h")),
    (8L, tok(12, "i")),
    (9L, tok(12, "j"))
  ).toDF("doc_id", "text")

  private def newDocs = oldDocs
    .filter(col("doc_id") =!= 1L)
    .withColumn("text",
      when(col("doc_id") === 4L, lit(tok(14, "z"))).otherwise(col("text")))
    .unionByName(Seq((10L, s"${tok(14, "c")} tail1")).toDF("doc_id", "text"))

  private def storedSession(root: String) = {
    val s = spark.newSession()
    s.conf.set("spark.graft.frameStore.path", root)
    s
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("rolled-forward ExactSubstr frames equal a full rebuild at the new snapshot") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    val published = FrameMaintenance.rollForwardExactSubstr(
      s, "fm-old", "fm-new", oldDocs, newDocs, l = L)
    assert(published.map(_._1).toSet ==
      Set(s"esocc$L", s"escnt$L", s"esdup$L", s"esspans$L"))
    assert(FrameStore.publishedKeys(s, "fm-new").toSet
      == published.map(_._1).toSet)

    val full = ExactSubstrOps.initState(newDocs, col("doc_id"), col("text"), L)
    val read = (k: String) => FrameStore.getOrBuild(s, "fm-new", k)(
      fail(s"$k must be published"): org.apache.spark.sql.DataFrame)
    assert(rows(read(s"esocc$L")) == rows(full.occ))
    assert(rows(read(s"escnt$L")) == rows(full.cnt))
    assert(rows(read(s"esdup$L")) == rows(
      ExactSubstrOps.dupOccurrences(newDocs, col("doc_id"), col("text"),
        l = L, minOccurrences = 2L)))
    assert(rows(read(s"esspans$L")) == rows(
      ExactSubstrOps.mergedSpans(
        ExactSubstrOps.dupOccurrences(newDocs, col("doc_id"), col("text"),
          l = L, minOccurrences = 2L), l = L, mergeGap = 0)))
  }

  test("rolled-forward MinHash frames equal a full rebuild at the new snapshot") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    val published = FrameMaintenance.rollForwardMinhash(
      s, "fm-old", "fm-new", oldDocs, newDocs)
    assert(published.map(_._1) == Seq("mhsigs", "mhpairs"))

    val read = (k: String) => FrameStore.getOrBuild(s, "fm-new", k)(
      fail(s"$k must be published"): org.apache.spark.sql.DataFrame)
    val fullSigs = DedupOps.minhashSignatures(newDocs, col("doc_id"),
      col("text"), shingleSize = 3, numHashes = 32, portable = true)
    assert(rows(read("mhsigs")) == rows(fullSigs))
    assert(rows(read("mhpairs")) == rows(
      DedupOps.candidatePairsFromSignatures(fullSigs)))
  }

  test("untouched documents are carried by reference from the old stored frames") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    // publish DOCTORED old frames first: a sentinel occurrence row for
    // untouched doc 7 and a sentinel signature row for a phantom doc.
    // No tokenizer produces them — they can only survive the roll if
    // untouched rows are carried, not rebuilt.
    val sentinelGkey = 424242424242L
    val occOld = ExactSubstrOps.initState(oldDocs, col("doc_id"),
        col("text"), L).occ
      .unionByName(Seq((sentinelGkey, 7L, 12L, 0))
        .toDF("gkey", "doc_id", "n_tokens", "pos"))
    FrameStore.getOrBuild(s, "fmsent-old", s"esocc$L")(occOld)
    val sigsOld = DedupOps.minhashSignatures(oldDocs, col("doc_id"),
        col("text"), shingleSize = 3, numHashes = 32, portable = true)
      .unionByName(Seq((-999L, Seq.fill(32)(-1L))).toDF("doc_id", "sig"))
    FrameStore.getOrBuild(s, "fmsent-old", "mhsigs")(sigsOld)

    FrameMaintenance.rollForwardExactSubstr(
      s, "fmsent-old", "fmsent-new", oldDocs, newDocs, l = L)
    FrameMaintenance.rollForwardMinhash(
      s, "fmsent-old", "fmsent-new", oldDocs, newDocs)

    val read = (k: String) => FrameStore.getOrBuild(s, "fmsent-new", k)(
      fail(s"$k must be published"): org.apache.spark.sql.DataFrame)
    assert(read(s"esocc$L").filter(col("gkey") === sentinelGkey).count() == 1,
      "untouched doc 7's doctored occurrence must be carried, not rebuilt")
    assert(read("mhsigs").filter(col("doc_id") === -999L).count() == 1,
      "the phantom signature must be carried, not rebuilt")
  }

  test("generic per-document roll-forward equals a full re-derivation") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    val derive = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("doc_id"),
      array_distinct(graft.ext.TextOps.shingles(col("text"), 3)).as("sd"))
    val rolled = FrameMaintenance.rollForwardPerDoc(
      s, "fm-old", "fm-new", "sd3", oldDocs, newDocs)(derive)
    assert(rows(rolled) == rows(derive(newDocs)))
    assert(FrameStore.publishedKeys(s, "fm-new") == Seq("sd3"))
  }

  test("rolled-forward embedding pair frame equals a full rebuild at the new snapshot") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    val base = Tables.load(s, SparkTestSession.sfDir, "embeddings")
      .filter(col("vec_id") < 80).select("vec_id", "embedding")
    // delete 1, re-embed 2 (negate: flips every cosine it takes part
    // in), insert 100000 as an exact copy of 5 (guaranteed cosine-1
    // delta pair in 5's bucket)
    val copyOf5 = base.filter(col("vec_id") === 5L)
      .select(lit(100000L).as("vec_id"), col("embedding"))
    val newVecs = base.filter(col("vec_id") =!= 1L)
      .withColumn("embedding",
        when(col("vec_id") === 2L,
          expr("transform(embedding, x -> -x)")).otherwise(col("embedding")))
      .unionByName(copyOf5)
    val bits = 4
    FrameMaintenance.rollForwardEmbeddingPairs(
      s, "fm-old", "fm-new", base, newVecs, bits = bits)
    val read = FrameStore.getOrBuild(s, "fm-new", s"embpairs$bits")(
      fail("must be published"): org.apache.spark.sql.DataFrame)
    val full = graft.ext.DedupOps.embeddingNearDupPairs(newVecs,
      col("vec_id"), col("embedding"), threshold = 0.4, dim = 64,
      signBits = bits)
    assert(rows(read) == rows(full))
    assert(read.filter(col("id_a") === 5L && col("id_b") === 100000L)
      .count() == 1, "the inserted copy's pair must be found by the delta probe")
  }

  test("IVF inverted file rolls forward under frozen centroids, only touched vectors re-assign") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    val base = Tables.load(s, SparkTestSession.sfDir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val newVecs = base.filter(col("cid") =!= 3L)
      .withColumn("cvec",
        when(col("cid") === 4L,
          expr("transform(cvec, x -> -x)")).otherwise(col("cvec")))
      .unionByName(base.filter(col("cid") === 7L)
        .select(lit(100000L).as("cid"), col("cvec")))
    val published = FrameMaintenance.rollForwardIvfAssigned(
      s, "fm-old", "fm-new", base, newVecs, nlist = 4)
    val rolled = published.toMap.apply("ivf-4-2-assigned")
    // frozen centroids from the OLD fit; rolled file ≡ re-assigning the
    // whole new corpus against them (the contract is maintenance, not
    // re-fit — drift is measured by the tuner, not silently absorbed)
    val model = graft.ext.SimilarityOps.ivfFitCached("fm-old", base, nlist = 4)
    assert(rows(rolled) == rows(
      graft.ext.SimilarityOps.ivfAssign(newVecs, model.centroids)))
    // the centroid table re-published unchanged under the new snapshot
    val centNew = published.toMap.apply("ivf-4-2-centroids")
    val centOld = graft.etl.FrameStore.getOrBuild(s, "fm-old", "ivf-4-2-centroids")(
      fail("old fit must be published"): org.apache.spark.sql.DataFrame)
    assert(rows(centNew) == rows(centOld))
  }

  test("IVF maintenance observes drift AND reacts: drifted corpus re-fits to target, undrifted never re-fits") {
    // Geometry: the OLD corpus is two tight clusters at e1/e2, so the
    // frozen fit's centroids are ~e1/~e2. The DRIFTED corpus is a
    // boundary cloud whose real neighborhood structure runs along z
    // while a ±0.002 y-jitter ALTERNATING with z-order decides which
    // frozen cell each point lands in — true neighbors split across
    // cells, so frozen recall at the deepest probe is ~50% and the
    // observe→react loop must re-fit; after the re-fit k-means splits
    // along z and the same queries hit their full top-5.
    def vecsDF(rows: Seq[(Long, Array[Float])]) =
      rows.toDF("cid", "cvec")
    val old = (0 until 40).map(j => (j.toLong, Array(1f, j * 0.001f, 0f))) ++
      (0 until 40).map(j => ((40 + j).toLong, Array(j * 0.001f, 1f, 0f)))
    val oldDf = vecsDF(old)

    // undrifted: two deletes, same geometry — frozen fit must be kept
    val sU = storedSession(Files.createTempDirectory("framemaint").toString)
    val (framesU, decU) = FrameMaintenance.rollForwardIvfRecallTargeted(
      sU, "ivfdrift-oldu", "ivfdrift-newu", oldDf,
      vecsDF(old.filterNot(r => r._1 == 5L || r._1 == 45L)),
      Seq((0L, Array(1f, 0.01f, 0f)), (1L, Array(0.01f, 1f, 0f)))
        .toDF("qid", "qvec"),
      k = 5, targetRecallFp = 9000L, nlist = 2, iters = 4,
      candidates = Seq(1))
    assert(!decU.refit, s"undrifted corpus must keep the frozen fit: $decU")
    assert(decU.frozenRecallFp >= 9000L
      && decU.finalRecallFp == decU.frozenRecallFp)
    // what published IS the frozen fit's centroid table
    val frozenCents = graft.ext.SimilarityOps
      .ivfFitCached("ivfdrift-oldu", oldDf, nlist = 2, iters = 4).centroids
    val pubCents = framesU.toMap.apply("ivf-2-4-centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).map(_._3)
    assert(pubCents.toSeq == frozenCents.flatten.toSeq)

    // drifted: boundary cloud replaces the corpus entirely
    val drift = (0 until 60).map { i =>
      ((100 + i).toLong,
        Array(1f, if (i % 2 == 0) 1.002f else 0.998f, -0.75f + i * 0.025f))
    }
    val sD = storedSession(Files.createTempDirectory("framemaint").toString)
    val (framesD, decD) = FrameMaintenance.rollForwardIvfRecallTargeted(
      sD, "ivfdrift-oldd", "ivfdrift-newd", oldDf, vecsDF(drift),
      Seq((0L, Array(1f, 1f, 0.55f)), (1L, Array(1f, 1f, -0.55f)))
        .toDF("qid", "qvec"),
      k = 5, targetRecallFp = 9000L, nlist = 2, iters = 4,
      candidates = Seq(1))
    assert(decD.refit, s"drifted corpus must trigger the re-fit: $decD")
    assert(decD.frozenRecallFp < 9000L,
      s"the frozen fit must MEASURE as missing the target: $decD")
    assert(decD.finalRecallFp >= 9000L,
      s"the re-fit must MEET the declared target: $decD")
    // the published inverted file is the re-fit one: each query's true
    // top-5 (contiguous in z) now lives in ONE cell
    val cellOf = framesD.toMap.apply("ivf-2-4-assigned")
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Int]("centroid_id"))
      .toMap
    for (center <- Seq(52, 8)) { // z = 0.55 and z = -0.55
      val top5 = (center - 2 to center + 2).map(i => (100 + i).toLong)
      assert(top5.map(cellOf).distinct.size == 1,
        s"after re-fit the top-5 around i=$center must share a cell")
    }
  }

  test("rolled-forward CMS counters equal a full rebuild — deletes subtract exactly") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    def toksF(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("item"))
      .filter(col("item") =!= "")
      .groupBy("doc_id", "item").agg(count(lit(1)).as("n"))
    // width 4096 ≫ vocabulary: doc 1's b-tokens leave the corpus
    // entirely, so their buckets must VANISH from the rolled table
    // (zero-sum drop), exactly as the rebuild never creates them
    val rolled = FrameMaintenance.rollForwardCms(
      s, "fm-old", "fm-new", "cms2x4096", oldDocs, newDocs,
      depth = 2, width = 4096)(toksF)
    val rebuild = graft.ext.SketchOps.cmsCounters(
      toksF(newDocs), col("item"), col("n"), depth = 2, width = 4096)
    assert(rows(rolled) == rows(rebuild))
    assert(FrameStore.publishedKeys(s, "fm-new").contains("cms2x4096"))
  }

  test("HLL registers: append-only delta merges stored registers; removal rebuilds") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    def itemsF(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(split(col("text"), " ")).as("item"))
    // doctored old registers: bucket 999 is outside b=6's 0..63 range —
    // no rebuild can produce it, so it survives ONLY via the merge path
    val sentinel = Seq((999L, 3L)).toDF("bucket", "mj")
    val oldRegs = graft.ext.SketchOps.hllRegisters(
        itemsF(oldDocs), col("item"), b = 6)
      .unionByName(sentinel)
    FrameStore.getOrBuild(s, "fmhll-old", "hll6")(oldRegs)

    val fresh = Seq((10L, "fresh1 fresh2")).toDF("doc_id", "text")
    val appended = oldDocs.unionByName(fresh)
    val rolledA = FrameMaintenance.rollForwardHllRegisters(
      s, "fmhll-old", "fmhll-newA", "hll6", oldDocs, appended, b = 6)(itemsF)
    assert(rows(rolledA) == rows(
      graft.ext.SketchOps.hllRegisters(itemsF(appended), col("item"), b = 6)
        .unionByName(sentinel)),
      "append-only roll = rebuild ∪ carried sentinel (old registers reused)")

    val shrunk = oldDocs.filter(col("doc_id") =!= 1L)
    val rolledB = FrameMaintenance.rollForwardHllRegisters(
      s, "fmhll-old", "fmhll-newB", "hll6", oldDocs, shrunk, b = 6)(itemsF)
    assert(rows(rolledB) == rows(
      graft.ext.SketchOps.hllRegisters(itemsF(shrunk), col("item"), b = 6)),
      "a delete must force the rebuild arm — registers cannot forget")
  }

  test("maintenance is idempotent: a re-run leaves published frames untouched") {
    val root = Files.createTempDirectory("framemaint").toString
    val s = storedSession(root)
    FrameMaintenance.rollForwardExactSubstr(
      s, "fm-old", "fm-new", oldDocs, newDocs, l = L)
    val before = rows(FrameStore.getOrBuild(s, "fm-new", s"esspans$L")(
      fail("published"): org.apache.spark.sql.DataFrame))
    // second run: getOrBuild semantics — nothing rebuilds or changes
    FrameMaintenance.rollForwardExactSubstr(
      s, "fm-old", "fm-new", oldDocs, newDocs, l = L)
    val after = rows(FrameStore.getOrBuild(s, "fm-new", s"esspans$L")(
      fail("published"): org.apache.spark.sql.DataFrame))
    assert(after == before)
  }
}
