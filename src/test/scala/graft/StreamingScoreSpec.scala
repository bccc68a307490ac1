package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ClassifierOps
import graft.streaming.StreamingScore

/** Train-offline / score-online parity: a stream scored with the fitted
  * weights must emit the bit-identical probabilities the batch scorer
  * assigns. */
class StreamingScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def features = Seq(
    (1L, "A", 1.0, 1.2, -0.3), (2L, "A", 0.0, -0.9, 0.4),
    (3L, "B", 1.0, -0.7, 1.1), (4L, "B", 0.0, 0.8, -1.2),
    (5L, "A", 1.0, 1.5, 0.1), (6L, "B", 0.0, 0.2, -0.8)
  ).toDF("id", "g", "y", "x1", "x2")

  test("streaming single-model scoring equals batch scoring bit-for-bit") {
    val f = features
    val w = ClassifierOps.fitHardSigmoidLR(f, Seq("x1", "x2"), "y",
      iters = 6, lr = 2.0)
    val batch = StreamingScore.scored(f, w.toSeq, Seq("x1", "x2"))
      .select("id", "p", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

    val dir = Files.createTempDirectory("graft_sscore")
    f.write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("id long, g string, y double, x1 double, x2 double")
      .parquet(dir.resolve("in").toString)
    val q = StreamingScore.scored(stream, w.toSeq, Seq("x1", "x2"))
      .select("id", "p", "keep")
      .writeStream.format("memory").queryName("sscore")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sscore").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(streamed == batch)
    assert(streamed.size == 6)
  }

  test("streaming per-group scoring applies each group's own model") {
    val f = features
    val weights = ClassifierOps.fitGroupedHardSigmoidLR(f, "g",
      Seq("x1", "x2"), "y", iters = 6, lr = 2.0)
    val batch = StreamingScore.scoredByGroup(f, weights, "g", Seq("x1", "x2"))
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val dir = Files.createTempDirectory("graft_sgscore")
    f.write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("id long, g string, y double, x1 double, x2 double")
      .parquet(dir.resolve("in").toString)
    val q = StreamingScore.scoredByGroup(stream, weights, "g", Seq("x1", "x2"))
      .select("id", "p")
      .writeStream.format("memory").queryName("sgscore")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sgscore").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
    // the two groups' models genuinely differ (independent fits)
    val wRows = weights.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wRows("A") != wRows("B"))
  }

  test("streaming topic assignment equals the batch IVF assignment") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"))
    val model = graft.ext.SimilarityOps.ivfFit(corpus, nlist = 4)
    val batch = model.assigned.select("cid", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val dir = Files.createTempDirectory("graft_stopic")
    emb.select(col("vec_id"), col("embedding"))
      .write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("vec_id long, embedding array<float>")
      .parquet(dir.resolve("in").toString)
    val q = StreamingScore.assignedTopics(stream, model.centroids, "embedding")
      .select("vec_id", "centroid_id")
      .writeStream.format("memory").queryName("stopic")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("stopic").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)
    assert(streamed.size == batch.size && batch.size > 0)
    // the stream genuinely spreads over several topics
    assert(streamed.values.toSet.size > 1)
  }
}
