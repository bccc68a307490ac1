package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingApply

class StreamingApplySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CDC apply maintains a parquet store across micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_apply")
    val in = root.resolve("in").toString
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    // two files → two micro-batches (maxFilesPerTrigger 1); the seq
    // column makes the outcome order-independent anyway
    Seq((1L, "insert", 10L, 1L), (2L, "insert", 20L, 2L))
      .toDF("k", "change", "v", "seq").coalesce(1).write.parquet(in + "/f1")
    Seq((1L, "update", 11L, 3L), (2L, "delete", 0L, 4L), (3L, "insert", 30L, 5L))
      .toDF("k", "change", "v", "seq").coalesce(1).write.parquet(in + "/f2")
    val stream = spark.readStream
      .schema("k long, change string, v long, seq long")
      .option("maxFilesPerTrigger", 1)
      .parquet(in + "/*")
    val q = StreamingApply.start(stream, "k", "seq", store, ckpt)
    q.awaitTermination()
    val got = spark.read.parquet(store).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(got == Map(1L -> 11L, 3L -> 30L))
  }
}
