package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MetricTransformers
import graft.streaming.FileIngest

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val blockSchema = StructType(Seq(
    StructField("jobID", StringType), StructField("node", StringType),
    StructField("device", StringType), StructField("timestamp", StringType),
    StructField("rd_sectors", StringType), StructField("wr_sectors", StringType)))

  test("file ingest: csv lands, transformer applies, exactly-once across restarts") {
    val base = Files.createTempDirectory("graft_stream")
    val inDir = base.resolve("in"); Files.createDirectory(inDir)
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    Files.writeString(inDir.resolve("block1.csv"),
      """jobID,node,device,timestamp,rd_sectors,wr_sectors
        |j1,n1,sda,01/15/2024 10:00:00,0,0
        |j1,n1,sda,01/15/2024 10:00:10,2048,0
        |""".stripMargin)

    val q1 = FileIngest.csvToParquet(spark, inDir.toString, outDir, ckpt,
      blockSchema, MetricTransformers.block)
    FileIngest.runOnce(q1)
    val first = spark.read.parquet(outDir)
    assert(first.count() == 2)
    assert(first.filter(col("Event") === "block").count() == 2)

    // second pass with a NEW file: only the new file is processed
    Files.writeString(inDir.resolve("block2.csv"),
      """jobID,node,device,timestamp,rd_sectors,wr_sectors
        |j2,n2,sda,01/15/2024 11:00:00,0,0
        |""".stripMargin)
    val q2 = FileIngest.csvToParquet(spark, inDir.toString, outDir, ckpt,
      blockSchema, MetricTransformers.block)
    FileIngest.runOnce(q2)
    val second = spark.read.parquet(outDir)
    assert(second.count() == 3) // 2 + 1, block1.csv not reprocessed

    // forced REPLAY of the last epoch (drop its commit record + crc):
    // the batchId-deterministic overwrite must not duplicate rows
    import scala.jdk.CollectionConverters._
    val last = Files.list(Paths.get(ckpt, "commits")).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(last)
    Files.deleteIfExists(
      last.resolveSibling("." + last.getFileName.toString + ".crc"))
    val q3 = FileIngest.csvToParquet(spark, inDir.toString, outDir, ckpt,
      blockSchema, MetricTransformers.block)
    FileIngest.runOnce(q3)
    assert(spark.read.parquet(outDir).count() == 3,
      "a replayed epoch must overwrite its own output, not append to it")
  }

  test("jsonl ingest: clean rows land as parquet, corrupt lines quarantine, exactly-once") {
    val base = Files.createTempDirectory("graft_jsonl_stream")
    val inDir = base.resolve("in"); Files.createDirectory(inDir)
    val outDir = base.resolve("out").toString
    val quarDir = base.resolve("quar").toString
    val ckpt = base.resolve("ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    Files.writeString(inDir.resolve("d1.jsonl"),
      """{"doc_id":1,"text":"alpha"}
        |{"doc_id":2,"text":"beta"}
        |{broken line
        |""".stripMargin)
    val q1 = FileIngest.jsonlToParquet(spark, inDir.toString, outDir, quarDir,
      ckpt, schema, b => b.withColumn("n", length(col("text"))))
    FileIngest.runOnce(q1)
    val first = spark.read.parquet(outDir)
    assert(first.count() == 2)
    assert(first.filter(col("n") === 5).count() == 1)
    assert(spark.read.text(quarDir).count() == 1)

    // second pass: only the NEW file processes; quarantine appends
    Files.writeString(inDir.resolve("d2.jsonl"),
      """{"doc_id":3,"text":"gamma"}
        |also not json
        |""".stripMargin)
    val q2 = FileIngest.jsonlToParquet(spark, inDir.toString, outDir, quarDir,
      ckpt, schema, b => b.withColumn("n", length(col("text"))))
    FileIngest.runOnce(q2)
    assert(spark.read.parquet(outDir).count() == 3)
    assert(spark.read.text(quarDir).count() == 2)

    // forced REPLAY of the last epoch: drop its commit record so the
    // restarted query re-runs batch 1 from the offsets log (same file
    // list, same batchId). The batchId-deterministic overwrite makes
    // BOTH non-atomic writes idempotent — no duplicate parquet rows,
    // no duplicate quarantine lines.
    import scala.jdk.CollectionConverters._
    val last = Files.list(Paths.get(ckpt, "commits")).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(last)
    // the local checkpoint manager keeps a checksum sidecar; a stale
    // one would read as a concurrent writer on the re-committed epoch
    Files.deleteIfExists(
      last.resolveSibling("." + last.getFileName.toString + ".crc"))
    val q3 = FileIngest.jsonlToParquet(spark, inDir.toString, outDir, quarDir,
      ckpt, schema, b => b.withColumn("n", length(col("text"))))
    FileIngest.runOnce(q3)
    assert(spark.read.parquet(outDir).count() == 3,
      "a replayed epoch must overwrite its own output, not append to it")
    assert(spark.read.text(quarDir).count() == 2,
      "a replayed epoch must not duplicate quarantine lines")
  }

  test("media fingerprints at INGEST: streaming equals batch across micro-batch boundaries") {
    import graft.ext.MultimodalOps
    import org.apache.spark.sql.Row
    // mixed media: two images (one a pixel-twin of the other), one
    // audio clip, one garbage payload, one video (stubbed kind)
    val rows = Seq(
      Row(1L, "image", MultimodalOps.renderPatternImage(0x0123456789abcdefL)),
      Row(2L, "image", MultimodalOps.renderPatternImage(0x0123456789abcdefL)),
      Row(3L, "audio", MultimodalOps.renderToneWav(0x0fedcba987654321L)),
      Row(4L, "image", Array.fill[Byte](16)(42)), // undecodable
      Row(5L, "video", Array.fill[Byte](16)(1)))  // no fingerprint path
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    def fps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("media_id") ->
        (if (r.isNullAt(r.fieldIndex("fingerprint"))) None
         else Some(r.getAs[Long]("fingerprint")))).toMap
    val batchFps = fps(graft.ext.MultimodalOps.mediaFingerprints(media))
    assert(batchFps(1L).isDefined && batchFps(1L) == batchFps(2L),
      "pixel-identical images must fingerprint identically")
    assert(batchFps(3L).isDefined)
    assert(batchFps(4L).isEmpty && batchFps(5L).isEmpty,
      "undecodable/unfingerprintable rows keep an auditable null")

    val dir = Files.createTempDirectory("graft_smedia")
    media.filter(col("media_id") <= 2).repartition(1)
      .write.parquet(dir.resolve("in/p1").toString)
    media.filter(col("media_id") > 2).repartition(1)
      .write.parquet(dir.resolve("in/p2").toString)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("in/*").toString)
    val q = graft.streaming.StreamingPrep.fingerprintMedia(stream)
      .writeStream.format("parquet")
      .option("path", dir.resolve("out").toString)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(fps(spark.read.parquet(dir.resolve("out").toString)) == batchFps,
      "the stateless fingerprint stage must be boundary-independent")
  }
}
