package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingJoin

class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream interval join: matches only inside [ts, ts+window]") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssjoin")
    val cdir = dir.resolve("clicks").toString
    val pdir = dir.resolve("purchases").toString
    Seq((1L, ts(100), 11L), (2L, ts(100), 12L))
      .toDF("user_id", "cts", "click_id").write.parquet(cdir)
    // u1@150 inside; u1@300 outside the 100 s window; u2@200 exactly on
    // the inclusive boundary; u3 has no click
    Seq((1L, ts(150), 21L), (1L, ts(300), 22L), (2L, ts(200), 24L),
      (3L, ts(150), 23L))
      .toDF("user_id", "pts", "purchase_id").write.parquet(pdir)
    val clicks = spark.readStream
      .schema("user_id long, cts timestamp, click_id long").parquet(cdir)
    val purchases = spark.readStream
      .schema("user_id long, pts timestamp, purchase_id long").parquet(pdir)
    val q = StreamingJoin.intervalJoin(clicks, purchases, "user_id",
        "cts", "pts", windowSec = 100L)
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjoin").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"))).toSet
    assert(got == Set((1L, 11L, 21L), (2L, 12L, 24L)))
  }

  test("left-outer variant emits unmatched clicks once the watermark proves them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssjoin_outer")
    val cdir = dir.resolve("clicks").toString
    val pdir = dir.resolve("purchases").toString
    // u5 never converts; the t=100000 pair on both sides pushes the
    // watermark (lateness 0) far past u5's click+window so the outer
    // row is provably final and must emit in the trailing no-data batch
    Seq((5L, ts(100), 15L), (8L, ts(100000), 18L))
      .toDF("user_id", "cts", "click_id").write.parquet(cdir)
    Seq((8L, ts(100000), 28L))
      .toDF("user_id", "pts", "purchase_id").write.parquet(pdir)
    val clicks = spark.readStream
      .schema("user_id long, cts timestamp, click_id long").parquet(cdir)
    val purchases = spark.readStream
      .schema("user_id long, pts timestamp, purchase_id long").parquet(pdir)
    val q = StreamingJoin.intervalJoin(clicks, purchases, "user_id",
        "cts", "pts", windowSec = 100L, lateness = "0 seconds",
        leftOuter = true)
      .writeStream.format("memory").queryName("ssjoin_outer")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjoin_outer").collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong))).toSet
    assert(got.contains(15L -> None), s"unmatched click missing from $got")
    assert(got.contains(18L -> Some(28L)))
  }
}
