package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.DedupOps
import graft.streaming.StreamingNearDedup

class StreamingNearDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val tA2 = tA.replace("today", "tonight")
  private val tB = "completely different content about spark query engines and distributed joins"
  private val tB2 = tB.replace("joins", "scans")
  private val tC = "el gato y el perro en la casa es un animal que come y duerme"
  private val tD = "seven red balloons floated calmly above the quiet harbor while gulls circled the masts"
  private val tD2 = tD.replace("masts", "boats")

  test("two-batch stream output equals batch nearDedup on the full corpus") {
    val base = Files.createTempDirectory("graft_sndd")
    val in = base.resolve("in"); Files.createDirectory(in)
    val index = base.resolve("index").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("doc_id", "text").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("doc_id long, text string").parquet(in.toString)
      StreamingNearDedup.start(stream, index, ckpt,
        shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5)
        .awaitTermination()
    }

    // batch 1: {1,2} is a near-dup cluster (min id 1 kept), 3 and 4
    // distinct. batch 2: 5 duplicates the ALREADY-EMITTED 1 (exact),
    // 6 near-duplicates the emitted 3, 8 near-duplicates 7 within the
    // batch. Ids ascend across batches and no doc bridges two emitted
    // clusters — the regime where stream ≡ batch holds exactly.
    val b1 = Seq((1L, tA), (2L, tA2), (3L, tB), (4L, tC))
    val b2 = Seq((5L, tA), (6L, tB2), (7L, tD), (8L, tD2))

    land("b1", b1)
    runPass()
    val afterB1 = StreamingNearDedup.emitted(spark, index)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterB1 == Set((1L, tA), (3L, tB), (4L, tC)))

    land("b2", b2)
    runPass()
    val streamed = StreamingNearDedup.emitted(spark, index)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val batch = DedupOps.nearDedup((b1 ++ b2).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(streamed == batch)
    assert(streamed == Set((1L, tA), (3L, tB), (4L, tC), (7L, tD)))
  }

  test("segmented index: three batches with maxSegments=2 compact and match batch nearDedup") {
    val base = Files.createTempDirectory("graft_sndd_cmp")
    val in = base.resolve("in"); Files.createDirectory(in)
    val index = base.resolve("index").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("doc_id", "text").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("doc_id long, text string").parquet(in.toString)
      StreamingNearDedup.start(stream, index, ckpt,
        shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5,
        maxSegments = 2).awaitTermination()
    }

    val b1 = Seq((1L, tA), (2L, tA2), (3L, tB))
    val b2 = Seq((4L, tC), (5L, tA))          // 5 dups the emitted 1
    val b3 = Seq((6L, tB2), (7L, tD), (8L, tD2)) // 6 dups emitted 3; 8 dups 7 in-batch

    land("b1", b1); runPass()
    land("b2", b2); runPass()
    // two batches → two segments at the cap; the third must compact
    assert(StreamingNearDedup.listSegments(index).size == 2)
    land("b3", b3); runPass()
    val segs = StreamingNearDedup.listSegments(index)
    assert(segs.size == 1 && segs.head.getFileName.toString.endsWith("-c"))

    val streamed = StreamingNearDedup.emitted(spark, index)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = DedupOps.nearDedup((b1 ++ b2 ++ b3).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, tA), (3L, tB), (4L, tC), (7L, tD)))
  }

  test("a replayed batchId short-circuits, even for unshingleable docs") {
    val base = Files.createTempDirectory("graft_sndd_bid")
    val index = base.resolve("index").toString
    // "xy" is too short to shingle → null sig → never an LSH candidate;
    // without the batchId marker a replay would re-admit it
    val b = Seq((1L, tA), (2L, "xy")).toDF("doc_id", "text")
    StreamingNearDedup.processBatch(b, index, 3, 32, 16, 0.5, batchId = 0L)
    val once = StreamingNearDedup.emitted(spark, index)
      .collect().map(_.getLong(0)).toSeq.sorted
    StreamingNearDedup.processBatch(b, index, 3, 32, 16, 0.5, batchId = 0L)
    val twice = StreamingNearDedup.emitted(spark, index)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(once == Seq(1L, 2L) && twice == once)
  }

  test("a replayed batch re-derives the same index (no duplicate survivors)") {
    val base = Files.createTempDirectory("graft_sndd_rp")
    val index = base.resolve("index").toString
    val b = Seq((1L, tA), (2L, tA2), (3L, tB)).toDF("doc_id", "text")
    // foreachBatch replay after a checkpoint-less crash: the same batch
    // applied twice must not re-admit its docs as cross-batch survivors
    StreamingNearDedup.processBatch(b, index, 3, 32, 16, 0.5)
    val once = StreamingNearDedup.emitted(spark, index)
      .collect().map(_.getLong(0)).toSet
    StreamingNearDedup.processBatch(b, index, 3, 32, 16, 0.5)
    val twice = StreamingNearDedup.emitted(spark, index)
      .collect().map(_.getLong(0)).toSet
    assert(once == Set(1L, 3L) && twice == once)
  }
}
