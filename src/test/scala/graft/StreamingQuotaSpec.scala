package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingQuota
import graft.streaming.StreamingQuota.Doc

/** Plan→apply parity: streamed quota admission must equal the batch
  * hard-prefix cumsum gate (the q187 rule) on an in-order replay, with
  * state carrying the running totals across micro-batch boundaries. */
class StreamingQuotaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // group A quota 10: docs 1(4), 2(5) admitted, 3(3) overflows at 12 —
  // and doc 4(1) would fit in the LEFTOVER but hard-prefix cuts it too.
  // group B quota 100: everything admitted.
  private val docs = Seq(
    Doc("A", 1L, 4L), Doc("A", 2L, 5L), Doc("A", 3L, 3L), Doc("A", 4L, 1L),
    Doc("B", 5L, 40L), Doc("B", 6L, 60L))
  private val quotas = Map("A" -> 10L, "B" -> 100L)

  private def batchVerdicts = {
    val w = Window.partitionBy("group").orderBy("docId")
    docs.toDF("group", "docId", "nTokens")
      .withColumn("cum", sum("nTokens").over(w))
      .withColumn("quota",
        coalesce(typedLit(quotas).apply(col("group")), lit(0L)))
      .select(col("group"), col("docId"),
        (col("cum") <= col("quota")).as("admitted"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
  }

  test("hard prefix: leftover budget never re-admits after the first cut") {
    val out = StreamingQuota.admit(docs.toDS(), quotas)
      .collect().map(v => (v.group, v.docId) -> v.admitted).toMap
    assert(out == batchVerdicts)
    assert(out(("A", 2L)) && !out(("A", 3L)))
    assert(!out(("A", 4L)), "doc 4 fits the leftover but must stay cut")
    assert(out(("B", 6L)))
  }

  test("two-batch stream equals the batch gate; state carries across batches") {
    val base = Files.createTempDirectory("graft_squota")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[Doc]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("group", "docId", "nTokens")
        .repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("group string, docId long, nTokens long")
        .parquet(in.toString).as[Doc]
      val q = StreamingQuota.admit(stream, quotas)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    land("b1", docs.take(2)) // A:1,2 — fills A to exactly 9/10
    runPass()
    land("b2", docs.drop(2)) // A:3 overflows, A:4 stays cut, B all in
    runPass()

    val result = spark.read.parquet(out)
    val streamed = result.collect()
      .map(r => (r.getAs[String]("group"), r.getAs[Long]("docId")) ->
        r.getAs[Boolean]("admitted")).toMap
    assert(streamed == batchVerdicts)
    // the batch-1 state (9 tokens seen) decided batch-2's first doc
    val cum3 = result
      .filter(col("group") === "A" && col("docId") === 3L)
      .head.getAs[Long]("cumTokens")
    assert(cum3 == 12L)
  }
}
