package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps
import graft.streaming.StreamingDedup

class IvfStreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("IVF top-k: valid ranks, decent recall vs brute force, deterministic") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))

    val ivf = SimilarityOps.ivfTopK(queries, corpus, 10, nlist = 16, nprobe = 4).collect()
    val bf = SimilarityOps.bruteForceTopK(queries, corpus, 10).collect()

    // shape: per-query ranks dense from 1, cosine non-increasing
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val cos = sorted.map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // recall@10 vs brute force: probing 4/16 lists must find a fair
    // share of true neighbors (deterministic given fixed data/seed)
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = ivf.count(r => bfSet.contains((r.getLong(0), r.getLong(1))))
    val recall = hit.toDouble / bfSet.size
    assert(recall >= 0.2, s"recall@10 was $recall")
    // determinism
    val again = SimilarityOps.ivfTopK(queries, corpus, 10, nlist = 16, nprobe = 4).collect()
    assert(again.map(_.toString).sameElements(ivf.map(_.toString)))
  }

  test("streaming dedup: first occurrence emitted once across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sdedup")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("docId", "text").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("docId long, text string").parquet(in.toString)
        .select(md5(col("text")).as("digest"), col("docId"), col("text"))
        .as[StreamingDedup.Doc]
      val q = StreamingDedup.dedup(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    land("b1", Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))) // in-batch dup
    runPass()
    val first = spark.read.parquet(out)
    assert(first.count() == 2)

    land("b2", Seq((4L, "alpha"), (5L, "gamma"))) // cross-batch dup + new
    runPass()
    val all = spark.read.parquet(out)
    assert(all.count() == 3) // alpha NOT re-emitted; gamma added
    assert(all.select("text").distinct().count() == 3)
  }

  test("streaming dedup with TTL: dedups within the horizon, state configured to expire") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sdedup_ttl")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("docId", "text").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    // NOTE on the harness: with ProcessingTimeTimeout the engine always
    // schedules another (empty) micro-batch so timeouts can fire, which
    // makes BOTH Trigger.AvailableNow (never terminates) and
    // processAllAvailable (never settles) hang. The only stable shape
    // is: run with a real trigger interval, POLL the sink for the
    // expected row count, then stop.
    def runPass(ttlMs: Long, expect: Long): Unit = {
      val stream = spark.readStream
        .schema("docId long, text string").parquet(in.toString)
        .select(md5(col("text")).as("digest"), col("docId"), col("text"))
        .as[StreamingDedup.Doc]
      val q = StreamingDedup.dedupWithTtl(stream, ttlMs)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(100))
        .start()
      def countOut(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => -1L }
      val deadline = System.currentTimeMillis() + 60000
      while (countOut() < expect && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      q.stop()
    }

    // within-horizon behavior identical to exact dedup (TTL is long
    // relative to the batch; wall-clock expiry is not racy to assert)
    land("b1", Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
    runPass(ttlMs = 600000L, expect = 2)
    assert(spark.read.parquet(out).count() == 2)
    land("b2", Seq((4L, "alpha"), (5L, "gamma")))
    runPass(ttlMs = 600000L, expect = 3)
    val all = spark.read.parquet(out)
    assert(all.count() == 3) // alpha still suppressed inside the TTL horizon
    assert(all.select("text").distinct().count() == 3)
  }
}
