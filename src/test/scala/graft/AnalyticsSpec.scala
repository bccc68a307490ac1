package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics._

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def events = Tables.load(spark, SparkTestSession.sfDir, "events")

  test("A1 column stats: min <= max, null_cnt 0 under the reference's guard") {
    val r = StatsOps.columnStats(events, col("value")).head()
    assert(r.getDouble(0) <= r.getDouble(1))
    assert(r.getLong(3) == 0L) // reference bug preserved: filtered nulls
  }

  test("A2 availability count excludes zeros and nulls") {
    val total = events.count()
    val avail = StatsOps.availabilityCount(events, col("value"), col("ts"))
      .head().getLong(0)
    assert(avail <= total && avail > 0)
  }

  test("A3 hourly buckets partition the rows: counts sum to input rows") {
    val agg = TimeSeriesOps.timeBucketAgg(events, col("ts"), col("value"))
    val n = events.filter(col("value").isNotNull).count()
    assert(agg.agg(sum("cnt")).head().getLong(0) == n)
    // buckets strictly increasing
    val buckets = agg.select("bucket_epoch").collect().map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted))
  }

  test("A4 percentile filter keeps ~98% of rows for (0.01, 0.99)") {
    val kept = TimeSeriesOps.percentileFiltered(events, col("value"), 0.01, 0.99).count()
    val n = events.filter(col("value").isNotNull).count()
    assert(kept >= (n * 0.97).toLong && kept <= n)
  }

  test("A6 IQR filter keeps a majority of rows and bounds are respected") {
    val kept = TimeSeriesOps.iqrFiltered(events, col("value"))
    assert(kept.count() > events.count() / 2)
  }

  test("A7 smart histogram: bin counts sum to rows, bins within range") {
    val h = HistogramOps.smartHistogram(events, col("value"), 20)
    val n = events.filter(col("value").isNotNull).count()
    assert(h.agg(sum("cnt")).head().getLong(0) == n)
    val bins = h.select("bin_index").collect().map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b < 20))
  }

  test("A8 series histogram: last bin always present, max excluded") {
    val h = HistogramOps.seriesHistogram(events, col("value"), 20).collect()
    assert(h.map(_.getLong(0)).contains(19L))
    val total = h.map(_.getLong(1)).sum
    val n = events.filter(col("value").isNotNull).count()
    // rows equal to the global max fall outside every bin (quirk)
    val mx = events.agg(max("value")).head().getDouble(0)
    val atMax = events.filter(col("value") === mx).count()
    assert(total == n - atMax)
  }

  test("O4 top-N + Others preserves total count and sorts Others last") {
    val r = TopNOps.topNWithOthers(events, col("event_type"), 3).collect()
    val total = r.map(_.getLong(1)).sum
    assert(total == events.count())
    assert(r.last.getString(0) == "Others" || r.length <= 3)
  }

  test("W1 ranking is deterministic and dense from 1") {
    val r = TopNOps.rankedCounts(events, col("event_type")).collect()
    assert(r.map(_.getInt(2)).toSeq == (1 to r.length))
  }

  test("P6/P7 derived columns: duration and nullif-guarded division") {
    import spark.implicits._
    val df = Seq((10L, 0L), (20L, 2L)).toDF("v", "d")
    val out = df.select(DerivedOps.perUnit(col("v"), col("d")).as("r")).collect()
    assert(out(0).isNullAt(0))         // divide by zero -> null
    assert(out(1).getDouble(0) == 10.0)
  }

  test("P8 missing-column patch adds doubles, keeps existing") {
    import spark.implicits._
    val df = Seq((1, 2.0)).toDF("a", "value_cpuuser")
    val out = DerivedOps.patchMissingColumns(df, Seq("value_cpuuser", "value_gpu"))
    assert(out.columns.contains("value_gpu"))
    assert(out.head().getDouble(2) == 0.0)
    assert(out.head().getDouble(1) == 2.0)
  }

  test("smart histogram width-0 guard: constant column lands in bin 0") {
    import spark.implicits._
    val df = Seq.fill(10)(5.0).toDF("value")
    val h = HistogramOps.smartHistogram(df, col("value"), 20).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L && h.head.getLong(1) == 10L)
  }
}
