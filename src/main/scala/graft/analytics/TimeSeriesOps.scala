package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket aggregation — the reference's line-plot workhorse
  * (DatabaseQueries.ts:119-190, databaseOptimization.ts:138-220).
  *
  * Scale notes:
  *  - Each profile is one hash aggregation keyed by the truncated
  *    timestamp: map-side partial agg + a shuffle of (buckets ×
  *    partitions) pre-aggregated rows. At 100 TB the shuffle volume is
  *    bounded by bucket cardinality, not input rows.
  *  - The percentile/IQR-filtered variants are two passes like the
  *    reference (a global-stats pass, then the filtered agg). The 1-row
  *    stats result is attached with `broadcast` + cross join so the plan
  *    stays fully distributed — no driver collect in the data path.
  */
object TimeSeriesOps {

  /** Per-query timezone knob (SURVEY §1.3: the reference pins sessions
    * to America/New_York; here tz is a parameter, not session state).
    * Buckets are truncated on the LOCAL wall clock of `tz` — day/week
    * boundaries shift with DST — and `bucket_epoch` labels the bucket by
    * its local wall time read as if UTC, the same convention DuckDB's
    * `EXTRACT(EPOCH FROM date_trunc(g, timezone(tz, timezone('UTC',
    * ts))))` produces, so oracles agree without session-TZ games. */
  private def localTs(ts: Column, tz: String): Column =
    if (tz == "UTC") ts else from_utc_timestamp(ts, tz)

  /** A3 — `GROUP BY date_trunc(granularity, ts)` → avg/min/max/count,
    * ordered by bucket (DatabaseQueries.ts:127-139). `bucket_epoch` is
    * epoch seconds of the bucket start (in `tz`'s wall clock, see
    * `localTs`). */
  def timeBucketAgg(df: DataFrame, ts: Column, v: Column,
                    granularity: String = "hour", tz: String = "UTC"): DataFrame =
    df.filter(v.isNotNull)
      .groupBy(unix_timestamp(date_trunc(granularity, localTs(ts, tz))).as("bucket_epoch"))
      .agg(
        avg(v).as("avg_value"),
        min(v).as("min_value"),
        max(v).as("max_value"),
        count(lit(1)).as("cnt"))
      .orderBy("bucket_epoch")

  /** Percentile aggregate selector. `exact = true` uses Spark's exact
    * interpolating `percentile` (same linear interpolation as DuckDB's
    * PERCENTILE_CONT — see SURVEY §7.4.1) — but it is a buffering
    * aggregate: the final reduce materializes every distinct value, so
    * an exact GLOBAL percentile over 100 TB concentrates the column on
    * one reducer. `exact = false` switches to `percentile_approx`
    * (t-digest-style constant-size sketch, mergeable map-side) — the
    * right default at cluster scale; exact is kept for oracle parity and
    * for small/grouped inputs where the group fits a reducer. */
  private def pct(v: Column, p: Double, exact: Boolean): Column =
    if (exact) percentile(v, lit(p))
    else percentile_approx(v, lit(p), lit(10000))

  /** Global [lo, hi] percentile bounds of `v` as a 1-row frame
    * (DatabaseQueries.ts:162-163). */
  def percentileBounds(df: DataFrame, v: Column, lo: Double, hi: Double,
                       exact: Boolean = true): DataFrame =
    df.filter(v.isNotNull)
      .agg(
        pct(v, lo, exact).as("p_low"),
        pct(v, hi, exact).as("p_high"))

  /** J1 — rows of `df` restricted to the global [lo, hi] percentile band
    * of `v` (the reference's scalar-broadcast cross join,
    * DatabaseQueries.ts:171-175). */
  def percentileFiltered(df: DataFrame, v: Column, lo: Double, hi: Double,
                         exact: Boolean = true): DataFrame =
    df.filter(v.isNotNull)
      .crossJoin(broadcast(percentileBounds(df, v, lo, hi, exact)))
      .filter(v.between(col("p_low"), col("p_high")))
      .drop("p_low", "p_high")

  /** A4 — percentile-filtered hourly aggregation
    * (DatabaseQueries.ts:148-190). */
  def percentileFilteredHourly(df: DataFrame, ts: Column, v: Column,
                               lo: Double, hi: Double,
                               exact: Boolean = true): DataFrame =
    timeBucketAgg(percentileFiltered(df, v, lo, hi, exact), ts, v)

  /** A6 — IQR outlier removal: keep rows within
    * [q25 − 1.5·IQR, q75 + 1.5·IQR] (databaseOptimization.ts:196-220). */
  def iqrFiltered(df: DataFrame, v: Column, exact: Boolean = true): DataFrame = {
    val q = df.filter(v.isNotNull).agg(
      pct(v, 0.25, exact).as("q1"),
      pct(v, 0.75, exact).as("q3"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(q))
      .filter(v.between(
        col("q1") - (col("q3") - col("q1")) * 1.5,
        col("q3") + (col("q3") - col("q1")) * 1.5))
      .drop("q1", "q3")
  }

  /** A5 — multi-granularity profile: pre-agg per (bucket, v) is skipped
    * (it only mattered for the reference's row-at-a-time WASM engine);
    * Spark's partial aggregation gives the same two-stage behavior.
    * Emits avg/min/max/stddev/count/quartiles per bucket
    * (databaseOptimization.ts:146-174). */
  def granularProfile(df: DataFrame, ts: Column, v: Column,
                      granularity: String, exact: Boolean = true,
                      tz: String = "UTC"): DataFrame =
    df.filter(v.isNotNull)
      .groupBy(unix_timestamp(date_trunc(granularity, localTs(ts, tz))).as("bucket_epoch"))
      .agg(
        avg(v).as("avg_value"),
        min(v).as("min_value"),
        max(v).as("max_value"),
        stddev(v).as("stddev_value"),
        count(lit(1)).as("cnt"),
        pct(v, 0.25, exact).as("q1"),
        pct(v, 0.5, exact).as("median"),
        pct(v, 0.75, exact).as("q3"))
      .orderBy("bucket_epoch")
}
