package graft.interactive

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.analytics.{DerivedOps, HistogramOps, StatsOps, TimeSeriesOps, TopNOps}

/** The reference dashboard's per-chart operator dispatch (SURVEY §3.2,
  * VgPlot.setupDb — web/src/components/vgplot.tsx:666-746): given a
  * column's stats, pick the percentile-filtered vs standard line plot,
  * the cast/scale/raw histogram path, and the top-N categorical rollup.
  *
  * The stats probe is one tiny aggregate (collected — it is genuinely a
  * scalar decision input, the same two-pass structure the reference
  * uses); the chosen pipeline is a single declarative plan.
  */
object ChartPolicy {

  /** Per-column percentile-filter configs
    * (ChartConstants.ts:75-93, vgplot.tsx:48-66). */
  case class PercentileConfig(lo: Double, hi: Double, threshold: Double)
  val percentileConfigs: Map[String, PercentileConfig] = Map(
    "value_cpuuser" -> PercentileConfig(0.01, 0.99, 1000.0),
    "value_nfs" -> PercentileConfig(0.02, 0.98, 10.0))

  /** BIGINT columns that charts cast to DOUBLE (vgplot.tsx:43). */
  val bigintColumns: Set[String] = Set("nhosts", "ncores")

  /** Percentile path triggers when |min| exceeds the column's threshold
    * (vgplot.tsx:419-431). */
  def needsPercentileFilter(column: String, minVal: Double): Boolean =
    percentileConfigs.get(column).exists(c => math.abs(minVal) > c.threshold)

  /** ×1e6 scale-up when the column is value_block or the whole range is
    * tiny (|min|,|max| < 0.01 — vgplot.tsx:92-96). */
  def needsScaleUp(column: String, minVal: Double, maxVal: Double): Boolean =
    column == "value_block" ||
      (math.abs(minVal) < 0.01 && math.abs(maxVal) < 0.01)

  private def stats(df: DataFrame, c: Column): (Double, Double) = {
    val r: Row = df.filter(c.isNotNull).agg(min(c), max(c)).head()
    def d(i: Int): Double = r.get(i) match {
      case null => 0.0
      case n: Number => n.doubleValue()
    }
    (d(0), d(1))
  }

  /** LinePlot dispatch: A4 percentile-filtered hourly profile when the
    * trigger fires, A3 standard hourly profile otherwise
    * (vgplot.tsx:398-467). */
  def linePlot(df: DataFrame, ts: Column, value: Column,
               columnName: String): DataFrame = {
    val (mn, _) = stats(df, value)
    percentileConfigs.get(columnName) match {
      case Some(c) if math.abs(mn) > c.threshold =>
        TimeSeriesOps.percentileFilteredHourly(df, ts, value, c.lo, c.hi)
      case _ => TimeSeriesOps.timeBucketAgg(df, ts, value)
    }
  }

  /** NumericalHistogram dispatch: BIGINT→DOUBLE cast, ×1e6 scale-up, or
    * raw, then the floor-bucket histogram (vgplot.tsx:470-552). */
  def numericalHistogram(df: DataFrame, value: Column, columnName: String,
                         bins: Int = 50): DataFrame = {
    val projected =
      if (bigintColumns.contains(columnName)) DerivedOps.castDouble(value)
      else {
        val (mn, mx) = stats(df, value)
        if (needsScaleUp(columnName, mn, mx)) DerivedOps.scaleUp(value)
        else value
      }
    HistogramOps.smartHistogram(df, projected, bins)
  }

  /** CategoricalHistogram: top-N + Others rollup, width-adaptive cap
    * max(5, px/100) (vgplot.tsx:607-662, ChartUtils.ts:85-93). */
  def categoricalHistogram(df: DataFrame, category: Column,
                           widthPx: Int = 1000): DataFrame =
    TopNOps.topNWithOthers(df, category, math.max(5, widthPx / 100))
}
