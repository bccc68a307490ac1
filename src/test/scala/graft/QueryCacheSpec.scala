package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.interactive.QueryCache

class QueryCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hit within TTL avoids recompute; expiry and cleanup evict") {
    var now = 0L
    val cache = new QueryCache(ttlMillis = 1000, clock = () => now)
    var computes = 0
    def expensive = { computes += 1; Seq(1, 2, 3).toDF("x").agg(sum("x")) }

    val a = cache.getOrCompute("q")(expensive)
    assert(a.head().getLong(0) == 6L && computes == 1)
    // hit: same frame, no recompute
    val b = cache.getOrCompute("q")(expensive)
    assert((b eq a) && computes == 1 && cache.contains("q"))
    // expiry: recompute after TTL
    now = 2000
    assert(!cache.contains("q"))
    cache.getOrCompute("q")(expensive)
    assert(computes == 2 && cache.size == 1)
    // cleanup drops expired entries
    now = 4000
    assert(cache.cleanup() == 1 && cache.size == 0)
    cache.invalidateAll()
  }

  test("distinct keys cached independently") {
    val cache = new QueryCache()
    val a = cache.getOrCompute("a")(Seq(1).toDF("x"))
    val b = cache.getOrCompute("b")(Seq(2).toDF("x"))
    assert(!(a eq b) && cache.size == 2)
    cache.invalidateAll()
    assert(cache.size == 0)
  }

  test("ANALYZE TABLE facade computes stats on a temp table") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").saveAsTable("analyze_me")
    graft.planner.CatalogOps.analyzeTable(spark, "analyze_me", Seq("id"))
    val stats = spark.sql("DESCRIBE EXTENDED analyze_me")
      .filter(col("col_name") === "Statistics").count()
    assert(stats == 1)
    spark.sql("DROP TABLE analyze_me")
  }
}
