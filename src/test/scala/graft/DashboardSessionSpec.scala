package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.DerivedOps
import graft.etl.ParquetSink
import graft.interactive.{ChartPolicy, Crossfilter}
import graft.planner.{TimeBoundExtensions, UnboundedScanException}
import graft.schema.Schemas

/** The reference's most-executed COMPOSITE path, end-to-end in one spec
  * (SURVEY §3.2 dashboard lifecycle): load under the B3 time-bound
  * guard → patch missing metric columns → crossfilter → per-chart
  * dispatch → CSV export — at sf0.01, with every chart output anchored
  * to a driver-oracled registry query (q04/q07/q24/q25 are DuckDB-
  * value-gated every round, so row-equality here IS an oracle check,
  * not a self-comparison).
  */
class DashboardSessionSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  lazy val base = SparkTestSession.spark

  /** Guarded sibling session: same context, TimeBoundExtensions rule
    * active, events.parquet watched (the reference rejects unbounded
    * fact queries before fetching a single chunk). */
  private def withGuarded[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val guarded = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new TimeBoundExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    guarded.conf.set("spark.graft.timeBound.paths", "events.parquet")
    guarded.conf.set("spark.graft.timeBound.column", "ts")
    try f(guarded)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def oracled(name: String): DataFrame =
    Queries.byName(name).run(base, sfDir)

  test("dashboard session: load→patch→crossfilter→dispatch→export, oracle-anchored") {
    withGuarded { spark =>
      // ── load: the guard rejects the unbounded scan, admits the brush ──
      val ev = Tables.load(spark, sfDir, "events")
      val ex = intercept[Exception](ev.groupBy("event_type").count().collect())
      assert(ex.isInstanceOf[UnboundedScanException] ||
        Option(ex.getCause).exists(_.isInstanceOf[UnboundedScanException]) ||
        ex.getMessage.contains("must be bounded"))
      // the session's full analysis window (bounded, row-preserving):
      val loaded = ev.filter(col("ts") >= lit("1970-01-01 00:00:00"))

      // ── patch: reference's missing-metric-column fill (§7.4.6) ──
      val patched = DerivedOps.patchMissingColumns(loaded, Schemas.metricColumns)
      assert(Schemas.metricColumns.forall(patched.columns.contains))

      // ── crossfilter: three brushes; the line chart sees the others ──
      val cf = Crossfilter.empty
        .withPredicate("hist", col("value") > 50)
        .withPredicate("menu", col("event_type") === "click")
        .withPredicate("brush", Crossfilter.intervalBrush(
          col("ts"), "2024-01-02 00:00:00", "2024-01-10 00:00:00"))
      val lineView = cf(patched, "line")
        .agg(count(lit(1)).as("cnt"),
          (floor(avg(col("value")) * 10000.0 + 0.5) / 10000.0).as("avg_value"))
      assert(rows(lineView) == rows(oracled("q25_crossfilter")))

      // ── per-chart dispatch (ChartPolicy), each anchored to its
      //    driver-oracled registry query ──
      // line plot: events.value min is under every percentile threshold,
      // so the policy must take the standard hourly path == q04
      val line = ChartPolicy.linePlot(loaded, col("ts"), col("value"), "value")
        .select(col("bucket_epoch"),
          (floor(col("avg_value") * 10000.0 + 0.5) / 10000.0).as("avg_value"),
          (floor(col("min_value") * 10000.0 + 0.5) / 10000.0).as("min_value"),
          (floor(col("max_value") * 10000.0 + 0.5) / 10000.0).as("max_value"),
          col("cnt"))
      assert(rows(line) == rows(oracled("q04_hourly_profile")))

      // numerical histogram: raw path (no cast/scale trigger) == q07
      val hist = ChartPolicy.numericalHistogram(loaded, col("value"), "value", bins = 20)
        .select(col("bin_index"), col("cnt"),
          (floor(col("avg_value") * 10000.0 + 0.5) / 10000.0).as("avg_value"),
          (floor(col("bin_start") * 10000.0 + 0.5) / 10000.0).as("bin_start"))
      assert(rows(hist) == rows(oracled("q07_smart_histogram")))

      // categorical menu == q24
      val menu = Crossfilter.distinctMenu(loaded, "event_type")
      assert(rows(menu) == rows(oracled("q24_distinct_menu")))

      // categorical histogram: width-capped top-N + Others; the corpus
      // has few event types, so every type beats the 'Others' rollup
      val cat = ChartPolicy.categoricalHistogram(loaded, col("event_type"), widthPx = 500)
      val catRows = cat.collect()
      assert(catRows.map(_.getAs[Long]("total")).sum == loaded.count())

      // ── export: the chart result leaves as RFC-4180 CSV (S7) ──
      val out = Files.createTempDirectory("graft_dash").resolve("line_csv").toString
      ParquetSink.exportCsv(line.orderBy("bucket_epoch"), out)
      val csv = Files.list(java.nio.file.Paths.get(out)).iterator()
      val files = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
      while (csv.hasNext) { val p = csv.next(); if (p.toString.endsWith(".csv")) files += p }
      assert(files.nonEmpty)
      val lines = files.flatMap(p => Files.readAllLines(p).toArray.map(_.toString))
      assert(lines.head.startsWith("bucket_epoch"))
      assert(lines.size.toLong - files.size == line.count()) // 1 header per file
    }
  }
}
