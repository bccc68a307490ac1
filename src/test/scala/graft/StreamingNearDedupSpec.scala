package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  test("tiered maintenance: small segments fold together; the large one is never rewritten") {
    val base = Files.createTempDirectory("graft_sndd_lsm")
    val index = base.resolve("index").toString

    def inodes(seg: java.nio.file.Path): Set[Long] =
      Files.walk(seg).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(Files.getAttribute(_, "unix:ino").asInstanceOf[Long]).toSet

    // batch 0: 400 mutually-distinct docs → one LARGE segment whose
    // size class sits far above any later tiny batch's
    val big = (1L to 400L).map(i =>
      (i, s"unique document number $i with entirely distinct words ${i * 7} ${i * 13} ${i * 31}"))
    StreamingNearDedup.processBatch(big.toDF("doc_id", "text"), index,
      3, 32, 16, 0.9, batchId = 0L, mergeFactor = 2)
    val bigSeg = StreamingNearDedup.listSegments(index).head
    val bigInodes = inodes(bigSeg)
    assert(bigInodes.nonEmpty)

    // batches 1..6: three distinct docs each; with mergeFactor=2 the
    // tiny same-class segments fold among themselves (cascading), but
    // their merged total stays classes below the large segment
    for (i <- 1 to 6) {
      val tiny = (1 to 3).map { j =>
        (1000L * i + j, f"completely distinct tiny content $i%03d $j%03d alpha beta gamma")
      }
      StreamingNearDedup.processBatch(tiny.toDF("doc_id", "text"), index,
        3, 32, 16, 0.9, batchId = i.toLong, mergeFactor = 2)
    }

    val segs = StreamingNearDedup.listSegments(index)
    // 7 appends net far fewer segments: the tiered fold is running
    assert(segs.size <= 4, s"expected tiered merging, got ${segs.map(_.getFileName)}")
    // the large segment survives BY HARD LINK: same name, same inodes —
    // its bytes were never rewritten by any tiny-segment fold
    val bigAfter = segs.find(_.getFileName == bigSeg.getFileName)
    assert(bigAfter.isDefined && inodes(bigAfter.get) == bigInodes)
    // nothing lost or duplicated across 7 appends and every fold
    val ids = StreamingNearDedup.emitted(spark, index)
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == 400 + 18 && ids.distinct.length == ids.length)

    // replay of the NEWEST batch short-circuits even though its plain
    // segment may have been folded: any merge group containing the
    // max-named segment names the result seg-<batchId>-c
    StreamingNearDedup.processBatch(
      (1 to 3).map(j => (6000L + j, f"completely distinct tiny content 006 $j%03d alpha beta gamma"))
        .toDF("doc_id", "text"),
      index, 3, 32, 16, 0.9, batchId = 6L, mergeFactor = 2)
    assert(StreamingNearDedup.emitted(spark, index).count() == 418)
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
