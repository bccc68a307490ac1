package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDrift

/** Drift-monitor semantics: TV fixed points (0 for an identical
  * distribution, ~1 for disjoint vocabulary), novel-term accounting,
  * and stream ≡ batch per micro-batch (the reference is static, so
  * batch boundaries cannot change any value). */
class StreamingDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refDocs = Seq(
    (1L, "alpha beta gamma alpha beta"),
    (2L, "alpha delta epsilon beta")
  ).toDF("doc_id", "text")

  test("identical distribution drifts zero; disjoint vocabulary drifts to one") {
    val ref = StreamingDrift.referenceCounts(refDocs, col("text")).persist()
    val same = StreamingDrift.driftBatch(refDocs, ref, col("text")).head
    assert(same.getAs[Long]("tv_fp") == 0L)
    assert(same.getAs[Long]("novel_terms") == 0L)
    assert(same.getAs[Long]("batch_tokens") == 9L)

    val disjoint = Seq((9L, "zeta eta theta iota")).toDF("doc_id", "text")
    val far = StreamingDrift.driftBatch(disjoint, ref, col("text")).head
    assert(far.getAs[Long]("tv_fp") >= 9990L && far.getAs[Long]("tv_fp") <= 10000L)
    assert(far.getAs[Long]("novel_terms") == 4L)
    ref.unpersist()
  }

  test("streaming drift rows equal batch drift per micro-batch") {
    val ref = StreamingDrift.referenceCounts(refDocs, col("text")).persist()
    val b1 = Seq((10L, "alpha beta beta gamma")).toDF("doc_id", "text")
    val b2 = Seq((11L, "omega beta psi chi alpha")).toDF("doc_id", "text")
    val expected = Seq(b1, b2).map { b =>
      val r = StreamingDrift.driftBatch(b, ref, col("text")).head
      (r.getAs[Long]("batch_tokens"), r.getAs[Long]("batch_terms"),
        r.getAs[Long]("novel_terms"), r.getAs[Long]("tv_fp"))
    }.toSet

    val dir = Files.createTempDirectory("graft_sdrift")
    b1.repartition(1).write.parquet(dir.resolve("in/p1").toString)
    b2.repartition(1).write.parquet(dir.resolve("in/p2").toString)
    val stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("in/*").toString)
    val q = StreamingDrift.start(stream, ref, "text",
      dir.resolve("out").toString, dir.resolve("ckpt").toString)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(dir.resolve("out").toString)
      .collect()
      .map(r => (r.getAs[Long]("batch_tokens"), r.getAs[Long]("batch_terms"),
        r.getAs[Long]("novel_terms"), r.getAs[Long]("tv_fp"))).toSet
    assert(streamed == expected)
    assert(streamed.size == 2)
    ref.unpersist()
  }
}
