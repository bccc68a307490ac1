package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps
import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.Event

class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming rolling z-score equals the batch operator across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sanom")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    // key 1: drifting series then a spike; key 2: short series that
    // never reaches minPrev in batch 1 but does after batch 2
    val batch1 = Seq(
      Event(1L, 10L, 1L, 10.0), Event(1L, 20L, 2L, 11.0),
      Event(1L, 30L, 3L, 10.5), Event(1L, 40L, 4L, 12.0),
      Event(1L, 50L, 5L, 11.5),
      Event(2L, 10L, 6L, 5.0), Event(2L, 20L, 7L, 6.0))
    val batch2 = Seq(
      Event(1L, 60L, 8L, 99.0), Event(1L, 70L, 9L, 11.0),
      Event(2L, 30L, 10L, 5.5), Event(2L, 40L, 11L, 7.0))

    def land(name: String, rows: Seq[Event]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDS().repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("key long, tss long, tie long, value double")
        .parquet(in.toString).as[Event]
      val q = StreamingAnomaly.rollingZScore(stream, lookback = 4,
          minPrev = 3, scale = 100L)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    land("b1", batch1); runPass()
    land("b2", batch2); runPass()

    val streaming = spark.read.parquet(out)
      .select("key", "tie", "zscore").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap

    val batchDf = (batch1 ++ batch2).toDS().toDF()
    val batch = EventOps.rollingZScore(batchDf, col("key"), col("tss"),
        col("tie"), col("value"), lookback = 4, minPrev = 3, scale = 100L)
      .select("key", "tie", "zscore").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap

    assert(streaming == batch)           // bit-identical scores, not approx
    assert(streaming((1L, 8L)).exists(_ > 5.0))  // the spike fires
    assert(streaming((2L, 7L)).isEmpty)  // below minPrev in batch 1
    assert(streaming((2L, 11L)).isDefined) // crosses minPrev in batch 2
  }
}
