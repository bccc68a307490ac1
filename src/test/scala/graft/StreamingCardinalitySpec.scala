package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SketchOps
import graft.streaming.StreamingCardinality

class StreamingCardinalitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming HLL state converges to the batch registers bit-identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_scard")
    val in = dir.resolve("in").toString
    // key 'a' accumulates across two micro-batches; 'b' appears once
    (1 to 100).map(i => ("a", s"item$i"))
      .toDF("k", "item").coalesce(1).write.parquet(in + "/f1")
    ((101 to 300).map(i => ("a", s"item$i")) ++
      (1 to 50).map(i => ("b", s"other$i")))
      .toDF("k", "item").coalesce(1).write.parquet(in + "/f2")
    val stream = spark.readStream.schema("k string, item string")
      .option("maxFilesPerTrigger", 1).parquet(in + "/*")
    val q = StreamingCardinality.runningDistinct(stream, "k", "item", b = 8)
      .writeStream.format("memory").queryName("scard")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // batch truth: registers built over the SAME full item sets
    val all = ((1 to 300).map(i => ("a", s"item$i")) ++
      (1 to 50).map(i => ("b", s"other$i"))).toDF("k", "item")
    val batch = SketchOps.hllEstimateBy(
        SketchOps.hllRegistersBy(all, col("k"), col("item"), b = 8), b = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val emissions = spark.table("scard").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    // the final emission per key (max register occupancy) must equal
    // the batch estimate EXACTLY — same hash, same fixed-point sum,
    // same one division
    val finalPerKey = emissions.groupBy(_._1)
      .map { case (k, es) => k -> es.maxBy(_._3)._2 }
    assert(finalPerKey("a") == batch("a"), s"$finalPerKey vs $batch")
    assert(finalPerKey("b") == batch("b"))
    // and key 'a' must have emitted an intermediate (smaller) estimate
    assert(emissions.count(_._1 == "a") == 2)
    assert(emissions.filter(_._1 == "a").map(_._2).min < batch("a"))
  }
}
