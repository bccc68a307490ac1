package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.PortableHash
import graft.streaming.StreamingQuantiles

class StreamingQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Batch truth mirroring the q131 construction at sample size k:
    * bottom-k rows by (portable hash, id), then type-1 quantile over
    * (value, id) order. */
  private def batchQuantiles(rows: Seq[(String, Long, Double)], k: Int) = {
    import spark.implicits._
    val df = rows.toDF("k", "id", "v")
      .withColumn("hv", PortableHash.base(
        concat(col("id").cast("string"), lit(":kq"))))
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
      .groupBy(_._1).map { case (key, g) =>
        val samp = g.sortBy(t => (t._4, t._2)).take(k)
        val vals = samp.sortBy(t => (t._3, t._2)).map(_._3)
        def q(p: Double) = vals(math.ceil(p * vals.size.toDouble).toInt - 1)
        key -> (samp.size.toLong, q(0.5), q(0.9), q(0.99))
      }
  }

  test("two-batch streaming sample quantiles equal the batch bottom-k sketch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_squant")
    val in = dir.resolve("in").toString
    // key 'a': 60 rows over two batches with k=16 → eviction exercised;
    // key 'b': 10 rows (≤ k) → exact quantiles of all its rows
    val b1 = (1 to 30).map(i => ("a", i.toLong, (i * 37 % 100).toDouble))
    val b2 = (31 to 60).map(i => ("a", i.toLong, (i * 37 % 100).toDouble)) ++
      (100 to 109).map(i => ("b", i.toLong, i.toDouble))
    b1.toDF("k", "id", "v").coalesce(1).write.parquet(in + "/f1")
    b2.toDF("k", "id", "v").coalesce(1).write.parquet(in + "/f2")
    val stream = spark.readStream.schema("k string, id long, v double")
      .option("maxFilesPerTrigger", 1).parquet(in + "/*")
    val q = StreamingQuantiles.runningQuantiles(stream, "k", "id", "v", k = 16)
      .writeStream.format("memory").queryName("squant")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val truth = batchQuantiles(b1 ++ b2, k = 16)
    val emissions = spark.table("squant").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // latest emission per key (max n_seen) ≡ batch sketch exactly
    val fin = emissions.groupBy(_._1)
      .map { case (k, es) => k -> es.maxBy(_._2) }
    assert(fin("a")._2 == 60L && fin("a")._3 == 16L) // capped at k
    assert((fin("a")._4, fin("a")._5, fin("a")._6) ==
      (truth("a")._2, truth("a")._3, truth("a")._4))
    assert(fin("b")._2 == 10L && fin("b")._3 == 10L) // ≤ k → exact
    assert((fin("b")._4, fin("b")._5, fin("b")._6) ==
      (truth("b")._2, truth("b")._3, truth("b")._4))
    // key 'a' emitted after each of its two batches, and the mid-stream
    // emission reflects only batch-1 rows
    assert(emissions.count(_._1 == "a") == 2)
    assert(emissions.filter(_._1 == "a").map(_._2).min == 30L)
  }
}
