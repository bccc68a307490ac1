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
}
