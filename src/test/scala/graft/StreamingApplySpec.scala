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

  test("recover restores a base stranded mid-swap and clears stale tmp/bak") {
    import java.nio.file.{Files => F, Paths, StandardCopyOption}
    import spark.implicits._
    val root = Files.createTempDirectory("graft_apply_rec")
    val store = root.resolve("store").toString

    // build a real base (same shape applyBatch writes: payload + seq),
    // then simulate a crash between the two swap moves: base moved to
    // ._apply_bak, tmp never promoted
    Seq((1L, 10L, 0L)).toDF("k", "v", "seq").write.parquet(store)
    F.move(Paths.get(store), Paths.get(store + "._apply_bak"),
      StandardCopyOption.ATOMIC_MOVE)
    F.createDirectories(Paths.get(store + "._apply_tmp"))
    F.writeString(Paths.get(store + "._apply_tmp/garbage"), "partial")

    // next batch: recovery must restore the base BEFORE merging, so the
    // pre-crash row survives alongside the replayed batch row
    val batch = Seq((2L, "insert", 20L, 1L)).toDF("k", "change", "v", "seq")
    StreamingApply.applyBatch(batch, "k", "seq", store)
    val got = spark.read.parquet(store).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L))
    assert(!F.exists(Paths.get(store + "._apply_bak")))
    assert(!F.exists(Paths.get(store + "._apply_tmp")))

    // crash during bak cleanup (swap complete, bak leftover): the next
    // batch must drop the stale bak instead of wedging on Files.move
    F.createDirectories(Paths.get(store + "._apply_bak"))
    F.writeString(Paths.get(store + "._apply_bak/garbage"), "stale")
    StreamingApply.applyBatch(
      Seq((3L, "insert", 30L, 2L)).toDF("k", "change", "v", "seq"),
      "k", "seq", store)
    val got2 = spark.read.parquet(store).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(got2 == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(!F.exists(Paths.get(store + "._apply_bak")))
  }
}
