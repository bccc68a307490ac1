package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-statistics probes (reference: web/src/components/charts/
  * DatabaseQueries.ts:68-114, vgplot.tsx:184-200).
  *
  * All of these are single full-scan aggregations with no grouping key:
  * Spark executes them as a partial (map-side) aggregate per partition
  * followed by a 1-row final aggregate, so they scale linearly with data
  * size and shuffle O(partitions) rows, not O(data).
  */
object StatsOps {

  /** A1 — min/max/count/null-count of a column.
    *
    * The reference computes the null count under a `WHERE c IS NOT NULL`
    * guard, so it is always 0 (DatabaseQueries.ts:74-82 — a reference
    * bug we preserve behind `filterNulls = true`). Pass
    * `filterNulls = false` for a meaningful null count.
    */
  def columnStats(df: DataFrame, c: Column, filterNulls: Boolean = true): DataFrame = {
    val base = if (filterNulls) df.filter(c.isNotNull) else df
    base.agg(
      min(c).as("min_value"),
      max(c).as("max_value"),
      count(lit(1)).as("cnt"),
      count(when(c.isNull, 1)).as("null_cnt"))
  }

  /** A2/P3 — row count under the reference's null/zero guards
    * (DatabaseQueries.ts:93-114). */
  def availabilityCount(df: DataFrame, metric: Column, ts: Column): DataFrame =
    df.filter(metric.isNotNull && metric =!= 0 && ts.isNotNull)
      .agg(count(lit(1)).as("cnt"))

  /** A12 — MIN/MAX time-range probe (histogram.tsx:65-72). Output as
    * epoch seconds (BIGINT) so the result is engine-serialization-proof. */
  def timeRangeProbe(df: DataFrame, ts: Column): DataFrame =
    df.agg(
      unix_timestamp(min(ts)).as("min_epoch"),
      unix_timestamp(max(ts)).as("max_epoch"),
      count(lit(1)).as("cnt"))
}
