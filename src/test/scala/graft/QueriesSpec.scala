package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered driver query runs at sf0.001 and returns rows,
  * and every oracle key maps to a real query. Correctness against DuckDB
  * is checked by scripts/check_oracle.py + the driver gate. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query names") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  Queries.all.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.run(spark, SparkTestSession.sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0)
    }
  }

  test("q26 demo generator matches the reference distribution shape") {
    // schema.ts:286-307 ranges: nhosts 1-10, ncores 1-32, 30-day time
    // window from 2024-01-01, exitcode '0' with p=0.9, cpuuser 0-100,
    // memused 0-16000 — hash-derived randomness here, so assert range
    // AND rough uniformity (every decile of cpuuser populated), not
    // exact values.
    import org.apache.spark.sql.functions._
    val df = Queries.byName("q26_demo_generator").run(spark, SparkTestSession.sfDir)
    val n = df.count()
    assert(df.filter(col("nhosts").between(1, 10)).count() == n)
    assert(df.filter(col("ncores").between(1, 32)).count() == n)
    assert(df.filter(col("value_cpuuser").between(0.0, 100.0)).count() == n)
    assert(df.filter(col("value_memused").between(0.0, 16000.0)).count() == n)
    assert(df.filter(col("time_epoch").between(1704067200L, 1704067200L + 30L * 86400)).count() == n)
    val zeroExit = df.filter(col("exitcode") === "0").count().toDouble / n
    assert(zeroExit > 0.8 && zeroExit < 0.97) // p=0.9 ± sampling noise
    val deciles = df.select(floor(col("value_cpuuser") / 10.0).cast("int").as("d"))
      .groupBy("d").count().collect()
    assert(deciles.length >= 10) // uniform-ish: all deciles populated
  }
}
