package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps
import graft.functions.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topKByScore equals the window row_number idiom, ties and partials included") {
    // deliberate score collisions (i % 50) force the cid tiebreak; 8
    // partitions force real partial-buffer merges through the shuffle
    val df = (0L until 1000L).map(i => (i % 8, i, (i % 50) / 10.0))
      .toDF("qid", "cid", "score").repartition(8)
    val viaAgg = df.groupBy("qid")
      .agg(TopKAgg.topKByScore(col("cid"), col("score"), 7).as("t"))
      .select(col("qid"), posexplode(col("t")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("score"), (col("pos") + 1).as("rank"))
    val viaWindow = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("score"), asc("cid"))))
      .filter(col("rank") <= 7)
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("qid", "cid", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(rows(viaAgg) == rows(viaWindow))
  }

  test("NaN scores rank first, matching Spark's descending double order") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 2.0),
      (1L, 13L, Double.NaN)).toDF("qid", "cid", "score")
    val top = df.groupBy("qid")
      .agg(TopKAgg.topKByScore(col("cid"), col("score"), 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id")).collect().map(_.getLong(0)).toSeq
    // NaN > everything (java.lang.Double.compare); ties → lower cid
    assert(top == Seq(11L, 13L, 12L))
  }

  test("fewer rows than k yields all rows, ranked") {
    val df = Seq((1L, 5L, 0.5), (1L, 4L, 0.9)).toDF("qid", "cid", "score")
    val top = df.groupBy("qid")
      .agg(TopKAgg.topKByScore(col("cid"), col("score"), 10).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id")).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(4L, 5L))
  }

  test("bruteForceTopK plan: bounded-heap aggregate, no full-candidate window sort") {
    val emb = (0L until 200L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val out = SimilarityOps.bruteForceTopK(queries, corpus, 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    // per-query exactly k ranked rows, rank dense 1..k
    val got = out.collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == (1 to 5) })
  }
}
