package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's single
    * most-executed shape: a time-bounded hourly metric profile
    * (SURVEY §7.2). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q04_hourly_profile").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (xxhash64-based sketches, heuristic language ID) → driver records a
    * weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
