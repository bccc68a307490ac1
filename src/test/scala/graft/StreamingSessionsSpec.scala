package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps
import graft.streaming.{StreamingEnrich, StreamingSessions}

class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stream-static broadcast enrichment: stateless left join per batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_senrich")
    val in = dir.resolve("in")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("user_id", "value")
      .write.parquet(in.toString)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val stream = spark.readStream
      .schema("user_id long, value double").parquet(in.toString)
    val q = StreamingEnrich.enrich(stream, dim, "user_id")
      .writeStream.format("memory").queryName("senrich")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("senrich").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("segment"))).toMap
    assert(rows == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("streaming session_window equals batch sessionize on the same events") {
    import spark.implicits._
    // same fixture family as EventOpsSpec: the event exactly 100 s
    // after its predecessor still extends the session, the one 101 s
    // later starts a new one; user 2 has an equal-ts tie
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 150L, 3.0), (1L, 251L, 4.0),
      (2L, 10L, 5.0), (2L, 10L, 6.0), (2L, 60L, 7.0))
    val batchDf = rows.toDF("user_id", "tss", "value")
      .withColumn("ts", timestamp_seconds(col("tss")))

    val dir = Files.createTempDirectory("graft_ssess")
    val in = dir.resolve("in")
    batchDf.write.parquet(in.toString)

    val stream = spark.readStream
      .schema("user_id long, tss long, value double, ts timestamp")
      .parquet(in.toString)
    val q = StreamingSessions.sessionSummaries(stream, "ts", "user_id",
        "value", gap = "100 seconds", lateness = "1 second")
      .writeStream.format("memory").queryName("ssess")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streaming = spark.table("ssess")
      .select(col("user_id"), unix_timestamp(col("s_start")).as("s_start"),
        unix_timestamp(col("s_end")).as("s_end"), col("n_events"),
        col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val batch = EventOps.sessionIntervals(batchDf, col("user_id"),
        col("tss"), col("tss"), col("value"), gapSec = 100L)
      .select("user_id", "s_start", "s_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(streaming == batch)
    assert(batch.size == 3) // (1, first), (1, second), (2, only)
  }
}
