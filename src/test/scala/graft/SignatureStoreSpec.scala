package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{DedupOps, SignatureStore}

class SignatureStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs(maxId: Long) =
    Tables.load(spark, SparkTestSession.sfDir, "documents")
      .filter(col("doc_id") < maxId)
      .select(col("doc_id"), col("text"))

  private def sigMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("update on an empty store equals the direct signature pass") {
    val store = Files.createTempDirectory("sigstore").toString + "/s"
    val c = docs(40)
    val stored = SignatureStore.update(spark, store, c)
    val direct = DedupOps.minhashSignatures(
      c, col("doc_id"), col("text"), 3, 32)
    assert(sigMap(stored) == sigMap(direct))
    assert(SignatureStore.listSegments(spark, store).size == 1)
  }

  test("incremental update computes ONLY the missing docs; idempotent re-run appends nothing") {
    val store = Files.createTempDirectory("sigstore").toString + "/s"
    SignatureStore.update(spark, store, docs(40))
    val all = SignatureStore.update(spark, store, docs(60))
    // the new segment holds exactly the 40..59 ids — the proof that the
    // first 40 were not recomputed
    val newest = SignatureStore.listSegments(spark, store).last
    val newIds = spark.read.parquet(newest._2.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(newIds == docs(60).filter(col("doc_id") >= 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
    // store now equals the direct pass over the full corpus
    assert(sigMap(all) == sigMap(DedupOps.minhashSignatures(
      docs(60), col("doc_id"), col("text"), 3, 32)))
    // steady state: same corpus again → no new segment
    val nSegs = SignatureStore.listSegments(spark, store).size
    SignatureStore.update(spark, store, docs(60))
    assert(SignatureStore.listSegments(spark, store).size == nSegs)
  }

  test("band join over the store equals minhashCandidatePairs over the corpus") {
    val store = Files.createTempDirectory("sigstore").toString + "/s"
    val c = docs(120)
    val sigs = SignatureStore.update(spark, store, c)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val fromStore = DedupOps.candidatePairsFromSignatures(sigs)
      .collect().map(key).toSet
    val direct = DedupOps.minhashCandidatePairs(c, col("doc_id"), col("text"))
      .collect().map(key).toSet
    assert(fromStore == direct)
  }

  test("verified pairs from the store equal minhashVerifiedPairs over the corpus") {
    val store = Files.createTempDirectory("sigstore").toString + "/s"
    val c = docs(120)
    val sigs = SignatureStore.update(spark, store, c)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val fromStore = DedupOps.verifiedPairsFromSignatures(
      sigs, c, col("doc_id"), col("text")).collect().map(key).toSet
    val direct = DedupOps.minhashVerifiedPairs(c, col("doc_id"), col("text"))
      .collect().map(key).toSet
    assert(fromStore == direct)
    assert(fromStore.nonEmpty) // fixture actually exercises the path
  }

  test("orphan data dir and torn marker from a crashed update are ignored; compact folds and sweeps") {
    val store = Files.createTempDirectory("sigstore").toString + "/s"
    SignatureStore.update(spark, store, docs(30))
    // crash between data write and marker create: unreferenced data dir
    val orphan = Paths.get(store, "segdata-stalecrash")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("garbage"), "not parquet")
    // crash between marker create and content write: torn (empty) marker
    Files.writeString(Paths.get(store, "seg-000000000099"), "")
    assert(SignatureStore.read(spark, store).get.count() == docs(30).count(),
      "torn marker and orphan must not surface as segments")
    val all = SignatureStore.update(spark, store, docs(50))
    assert(all.count() == docs(50).count())
    // the burned number 99 pushes the new marker past it
    assert(SignatureStore.listSegments(spark, store).last._1 > "seg-000000000099")
    // compact with a delete predicate: drop ids >= 40, one segment left,
    // orphan swept
    SignatureStore.compact(spark, store, Some(col("doc_id") < 40))
    assert(SignatureStore.listSegments(spark, store).size == 1)
    assert(!Files.exists(orphan), "compact must sweep pre-commit orphans")
    val ids = SignatureStore.read(spark, store).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == docs(40).select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("a file:// Hadoop-FS URI store behaves identically to a bare local path") {
    val local = Files.createTempDirectory("sigstore")
    val store = "file://" + local.toString + "/s"
    val c = docs(40)
    val stored = SignatureStore.update(spark, store, c)
    assert(sigMap(stored) == sigMap(DedupOps.minhashSignatures(
      c, col("doc_id"), col("text"), 3, 32)))
    // steady state through the URI: no second segment
    SignatureStore.update(spark, store, c)
    assert(SignatureStore.listSegments(spark, store).size == 1)
    // the artifact landed under the URI root on the local disk
    assert(Files.isDirectory(Paths.get(local.toString, "s")))
  }
}
