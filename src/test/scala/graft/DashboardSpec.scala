package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.DerivedOps
import graft.interactive.{ChartPolicy, Crossfilter}
import graft.schema.Schemas

/** The dashboard load path (SURVEY §3.2): introspect → patch missing
  * metric columns → per-chart dispatch (percentile / scale / cast
  * triggers) → crossfilter. */
class DashboardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // synthetic job table: cpuuser values far beyond the 1000 threshold
  // (trigger A4), block values tiny (trigger ×1e6), gpu column missing
  private def jobData = {
    val base = java.sql.Timestamp.valueOf("2024-01-15 10:00:00").getTime
    (0 until 600).map { i =>
      (new java.sql.Timestamp(base + i * 60000L),
        1500.0 + i % 100,          // value_cpuuser, |min| > 1000
        0.001 * (i % 10) / 10.0,   // value_block, < 0.01
        (i % 4 + 1).toLong,        // nhosts (BIGINT cast path)
        s"queue-${i % 7}")
    }.toDF("time", "value_cpuuser", "value_block", "nhosts", "queue")
  }

  test("missing metric columns are patched before charting") {
    val patched = DerivedOps.patchMissingColumns(jobData, Schemas.metricColumns)
    assert(Schemas.metricColumns.forall(patched.columns.contains))
    assert(patched.select(sum("value_gpu")).head().getDouble(0) == 0.0)
  }

  test("line plot dispatch: cpuuser takes the percentile path, others standard") {
    assert(ChartPolicy.needsPercentileFilter("value_cpuuser", 1500.0))
    assert(!ChartPolicy.needsPercentileFilter("value_cpuuser", 999.0))
    assert(!ChartPolicy.needsPercentileFilter("value_memused", 1e9))
    val profile = ChartPolicy.linePlot(jobData, col("time"), col("value_cpuuser"), "value_cpuuser")
    val all = jobData.count()
    val kept = profile.agg(sum("cnt")).head().getLong(0)
    assert(kept < all)                 // percentile filter dropped tails
    assert(kept >= (all * 0.95).toLong)
  }

  test("histogram dispatch: tiny range scales, bigint casts, counts preserved") {
    assert(ChartPolicy.needsScaleUp("value_block", 0.5, 0.5)) // always
    assert(ChartPolicy.needsScaleUp("value_memused", 0.001, 0.009))
    assert(!ChartPolicy.needsScaleUp("value_memused", 0.001, 5.0))

    val h = ChartPolicy.numericalHistogram(jobData, col("value_block"), "value_block", 20)
    assert(h.agg(sum("cnt")).head().getLong(0) == jobData.count())
    // scaled: bin starts are in the *1e6 domain
    assert(h.agg(max("bin_start")).head().getDouble(0) > 1.0)

    val hb = ChartPolicy.numericalHistogram(jobData, col("nhosts"), "nhosts", 4)
    assert(hb.agg(sum("cnt")).head().getLong(0) == jobData.count())
  }

  test("categorical histogram: width-adaptive top-N with Others") {
    val narrow = ChartPolicy.categoricalHistogram(jobData, col("queue"), widthPx = 500)
    assert(narrow.count() == 6) // max(5, 5) top + Others
    assert(narrow.agg(sum("total")).head().getLong(0) == jobData.count())
    val wide = ChartPolicy.categoricalHistogram(jobData, col("queue"), widthPx = 2000)
    assert(wide.count() == 7)  // all 7 queues fit, no Others row
  }

  test("crossfilter narrows every other chart's aggregate") {
    val cf = Crossfilter.empty
      .withPredicate("menu", col("queue") === "queue-1")
    val profile = ChartPolicy.linePlot(
      cf(jobData, "line"), col("time"), col("value_cpuuser"), "value_cpuuser")
    val kept = profile.agg(sum("cnt")).head().getLong(0)
    assert(kept <= jobData.filter(col("queue") === "queue-1").count())
    assert(kept > 0)
  }
}
