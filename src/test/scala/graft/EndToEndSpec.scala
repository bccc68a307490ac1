package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.TimeSeriesOps
import graft.etl.{MetricTransformers, ParquetSink, RawReaders}
import graft.planner.TimeBoundedScan
import graft.schema.Schemas

/** The reference's full data path, end to end (SURVEY §3.3 → §3.1):
  * raw CSV → transformer → hour-partitioned parquet → pruned
  * time-bounded scan → hourly profile. */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("raw block CSV -> events -> partitioned store -> pruned hourly profile") {
    val dir = Files.createTempDirectory("graft_e2e")
    // 3 hours of samples, 1/minute, monotonically growing counters
    val lines = new StringBuilder("jobID,node,device,timestamp,rd_sectors,wr_sectors\n")
    for (h <- 10 to 12; m <- 0 until 60) {
      val sectors = ((h - 10) * 60 + m) * 2048L
      lines.append(f"jobID7,node1,sda,01/15/2024 $h%02d:$m%02d:00,$sectors%d,0\n")
    }
    Files.writeString(dir.resolve("block.csv"), lines.toString)

    // ETL: encoding-fallback read → block transformer → event schema
    val raw = RawReaders.csvWithEncodingFallback(
      spark, dir.resolve("block.csv").toString, Schemas.blockCsv)
    val events = MetricTransformers.block(raw)
    assert(events.schema.fieldNames.toSeq == Schemas.event.fieldNames.toSeq)

    // sink: hour-partitioned layout
    val store = dir.resolve("store").toString
    ParquetSink.writeHourPartitioned(events, "Timestamp", store)

    // query: time-bounded scan of ONE hour + hourly profile (A3)
    val hour = TimeBoundedScan.scan(spark, store,
      "2024-01-15 11:00:00", "2024-01-15 11:59:59", tsCol = "Timestamp")
    val profile = TimeSeriesOps.timeBucketAgg(
      hour.withColumnRenamed("Timestamp", "ts"), col("ts"), col("Value"))
    val rows = profile.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == java.time.Instant.parse("2024-01-15T11:00:00Z").getEpochSecond)
    assert(r.getLong(4) == 60L) // one sample per minute
    // steady counter: 2048 sectors / 60 s -> constant rate, avg == max
    assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12)
    val expectedRate = 2048.0 * 512 / (1024.0 * 1024 * 1024) / 60
    assert(math.abs(r.getDouble(1) - expectedRate) < 1e-12)
  }
}
