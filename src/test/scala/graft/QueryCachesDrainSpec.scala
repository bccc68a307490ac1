package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.QueryCaches.Pinned
import graft.functions.PackedIds

/** ADVICE round-6 items: bounded cache lifetime for the registry's
  * inline persists (QueryCaches) and the loud-failure packing guard
  * (PackedIds). */
class QueryCachesDrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pin() persists and drain() releases every tracked frame") {
    QueryCaches.drain() // isolate from any earlier suite
    val before = spark.sparkContext.getPersistentRDDs.size
    val a = Seq(1, 2, 3).toDF("x").pin()
    val b = Seq(4, 5).toDF("y").pin()
    assert(a.count() == 3 && b.count() == 2)
    assert(QueryCaches.trackedCount == 2)
    assert(spark.sparkContext.getPersistentRDDs.size == before + 2)
    QueryCaches.drain()
    assert(QueryCaches.trackedCount == 0)
    // unpersist(blocking = false) is async at the block level but the
    // registry entries are removed synchronously
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("packGridId is the plain packing inside the envelope") {
    val out = Seq((0L, 0L), (7L, 999999L), (123L, 48L))
      .toDF("doc", "chunk")
      .select(PackedIds.packGridId(col("doc"), col("chunk")).as("cid"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 7999999L, 123000048L))
  }

  test("packGridId fails loudly outside the envelope instead of colliding") {
    def pack(doc: Long, chunk: Long): Unit =
      Seq((doc, chunk)).toDF("doc", "chunk")
        .select(PackedIds.packGridId(col("doc"), col("chunk")))
        .collect()
    // chunk position at the stride boundary would alias (doc+1, 0)
    val e1 = intercept[Exception](pack(5L, 1000000L))
    // doc id whose multiply leaves Long
    val e2 = intercept[Exception](pack(Long.MaxValue / 1000000L + 1L, 0L))
    // negative components are equally non-injective
    val e3 = intercept[Exception](pack(-1L, 0L))
    Seq(e1, e2, e3).foreach { e =>
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("packGridId")), e.toString)
    }
  }
}
