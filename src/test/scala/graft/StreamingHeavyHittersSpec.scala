package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHeavyHitters

class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("exact regime: two-batch stream equals the batch counts per key; state carries") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shh")
    val in = dir.resolve("in").toString
    // key 'a' accumulates across both micro-batches; 'b' appears once
    val b1 = (1 to 60).map(i => ("a", s"w${i % 6}")) // w0..w5, 10 each
    val b2 = (1 to 40).map(i => ("a", s"w${i % 4}")) ++ // w0..w3, +10 each
      (1 to 30).map(i => ("b", s"v${i % 3}"))
    b1.toDF("k", "item").coalesce(1).write.parquet(in + "/f1")
    b2.toDF("k", "item").coalesce(1).write.parquet(in + "/f2")
    val stream = spark.readStream.schema("k string, item string")
      .option("maxFilesPerTrigger", 1).parquet(in + "/*")
    val q = StreamingHeavyHitters
      .runningHeavyHitters(stream, "k", "item", k = 64, topN = 10)
      .writeStream.format("memory").queryName("shh")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emissions = spark.table("shh").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(emissions.forall(_._4 == 0L), "domain fits in k: exact regime")
    // final emission per key = the one with the largest n_total
    val finalA = emissions.filter(e => e._1 == "a" && e._5 == 100L)
      .map(e => e._2 -> e._3).toMap
    val truthA = (b1 ++ b2).filter(_._1 == "a")
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(finalA == truthA, s"state must carry across batches: $finalA vs $truthA")
    val finalB = emissions.filter(_._1 == "b").map(e => e._2 -> e._3).toMap
    assert(finalB == Map("v0" -> 10L, "v1" -> 10L, "v2" -> 10L))
    // the first batch emitted the intermediate counts for 'a'
    val midA = emissions.filter(e => e._1 == "a" && e._5 == 60L)
      .map(e => e._2 -> e._3).toMap
    assert(midA == b1.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
  }

  test("approximate regime: bounds hold at every emission; state stays capped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shh2")
    val in = dir.resolve("in").toString
    // heavy head + 800-unique tail per batch, k = 16: forces decrements
    def batch(tag: String) =
      (1 to 200).map(i => ("a", "hot")) ++
        (1 to 800).map(i => ("a", s"$tag$i"))
    batch("x").toDF("k", "item").coalesce(1).write.parquet(in + "/f1")
    batch("y").toDF("k", "item").coalesce(1).write.parquet(in + "/f2")
    val stream = spark.readStream.schema("k string, item string")
      .option("maxFilesPerTrigger", 1).parquet(in + "/*")
    val q = StreamingHeavyHitters
      .runningHeavyHitters(stream, "k", "item", k = 16, topN = 16)
      .writeStream.format("memory").queryName("shh2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emissions = spark.table("shh2").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per emitted batch (n_total identifies it): <= k rows, err within
    // the MG bound, and the heavy item survives with a sane estimate
    for ((n, rows) <- emissions.groupBy(_._4)) {
      assert(rows.length <= 16)
      val err = rows.head._3
      assert(err > 0L && err <= n / 17 + 16, s"err $err exceeds ~N/(k+1) at n=$n")
      val hot = rows.find(_._1 == "hot")
      val hotTrue = 200L * n / 1000L
      assert(hot.isDefined, s"hot (true=$hotTrue) must survive: err $err")
      assert(hot.get._2 <= hotTrue && hotTrue <= hot.get._2 + err)
    }
  }
}
