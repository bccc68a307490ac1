package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ParquetSink
import graft.planner.TimeBoundedScan
import graft.interactive.Crossfilter

class PlannerSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hour-partitioned write + time-bounded scan prunes partitions") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val events = Tables.load(spark, SparkTestSession.sfDir, "events")
    ParquetSink.writeHourPartitioned(events, "ts", tmp)

    val all = spark.read.parquet(tmp)
    val allFiles = all.inputFiles.length
    assert(allFiles > 1)

    val window = TimeBoundedScan.scan(spark, tmp,
      "2024-01-01 02:00:00", "2024-01-01 04:00:00")
    // row-level exactness
    val expected = events.filter(col("ts").between(
      lit("2024-01-01 02:00:00"), lit("2024-01-01 04:00:00"))).count()
    assert(window.count() == expected && expected > 0)
    // partition pruning actually reduced files touched: read the scan
    // node's numFiles metric after executing this exact plan
    val qe = window.queryExecution
    qe.toRdd.count()
    val scanned = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics("numFiles").value
    }.sum
    assert(scanned > 0 && scanned < allFiles)

    val plan = TimeBoundedScan.plan(spark, tmp,
      "2024-01-01 02:00:00", "2024-01-01 04:00:00")
    assert(plan.files == scanned)
    assert(plan.estimatedBytes > 0 && plan.taskPartitions >= 1)
    // footer-derived row count = rows in the pruned hour partitions
    // (partition grain — the reference manifest's recordCount; row-level
    // ts trimming inside the boundary hours happens at scan time)
    val hourRows = events.filter(date_trunc("hour", col("ts")).between(
      lit("2024-01-01 02:00:00"), lit("2024-01-01 04:00:00"))).count()
    assert(plan.rows == hourRows && plan.rows > 0)
  }

  test("unbounded scan is rejected (reference contract B3)") {
    intercept[IllegalArgumentException] {
      TimeBoundedScan.scan(spark, "/nonexistent", "", "2024-01-01")
    }
  }

  test("dynamic partition pruning: a filtered dim prunes the fact scan at runtime") {
    // static pruning (above) handles literal predicates; at 100 TB the
    // other half is DPP — the partition filter is only KNOWN at
    // runtime, derived from the dim side of a join. Spark inserts a
    // dynamicpruning subquery on the partitioned scan; the numFiles
    // metric proves most partitions were never read.
    val tmp = Files.createTempDirectory("graft_dpp").resolve("fact").toString
    (0 until 10).flatMap(p => (1 to 200).map(i => (p, i.toLong)))
      .toDF("pk", "v")
      .write.partitionBy("pk").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val allFiles = fact.inputFiles.length
    assert(allFiles >= 10)

    val dimPath = tmp + "_dim"
    (0 until 10).map(p => (p, if (p == 3) "keep" else "drop"))
      .toDF("d_pk", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("tag") === "keep"),
      col("pk") === col("d_pk"))
    assert(joined.count() == 200)
    val qe = joined.queryExecution
    assert(qe.executedPlan.toString.toLowerCase.contains("dynamicpruning"),
      "expected a dynamicpruning filter on the partitioned scan")
    // AQE wraps executed stages in QueryStageExec leaves, so a plain
    // collect never reaches the scans — descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(qe.executedPlan)
      .map(_.metrics("numFiles").value).max
    assert(scanned < allFiles / 2,
      s"DPP should skip most partitions: scanned $scanned of $allFiles")
  }

  test("empty write refused (parquet_loader.py:31-33 parity)") {
    val tmp = Files.createTempDirectory("graft_empty").toString
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    intercept[ParquetSink.EmptyWriteException] {
      ParquetSink.write(empty, s"$tmp/out")
    }
  }

  test("snappy write + maxRecordsPerFile splits files") {
    val tmp = Files.createTempDirectory("graft_chunk").toString
    val df = spark.range(10000).toDF("id").coalesce(1)
    ParquetSink.write(df, s"$tmp/out", maxRecordsPerFile = 2500)
    val files = spark.read.parquet(s"$tmp/out").inputFiles
    assert(files.length == 4)
  }

  test("csv export: header, null as empty, ISO timestamps") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val df = Seq(
      (1L, Some("a,b"), Some(java.sql.Timestamp.valueOf("2024-01-15 10:00:00"))),
      (2L, None, None)).toDF("id", "s", "t")
    ParquetSink.exportCsv(df, s"$tmp/out")
    val lines = spark.read.textFile(s"$tmp/out").collect().sorted
    assert(lines.exists(_.startsWith("id,")))
    assert(lines.exists(l => l.contains("\"a,b\"") && l.contains("2024-01-15T10:00:00")))
  }

  test("csv export literal mode reproduces the reference bytes, quirks included") {
    val tmp = Files.createTempDirectory("graft_csvlit").toString
    val df = Seq(
      (1L, Some("a,b"), Some(java.sql.Timestamp.valueOf("2024-01-15 10:00:00"))),
      (2L, Some("""say "hi""""), None), // embedded quote: NOT escaped (reference bug kept)
      (3L, None, Some(java.sql.Timestamp.valueOf("2024-06-01 23:59:59")))
    ).toDF("id", "s", "t")
    ParquetSink.exportCsvLiteral(df, s"$tmp/out")
    val lines = spark.read.textFile(s"$tmp/out").collect()
    assert(lines.head == "id,s,t") // single part: header is line 0
    val body = lines.tail.sorted
    assert(body(0) == "1,\"a,b\",2024-01-15T10:00:00.000Z") // quoted ONLY for comma
    assert(body(1) == "2,say \"hi\",")                      // quote NOT escaped, null ts -> empty
    assert(body(2) == "3,,2024-06-01T23:59:59.000Z")        // null string -> empty
  }

  test("jsonl export: sharded, gzip-able, lossless through the quarantining reader") {
    val tmp = Files.createTempDirectory("graft_jsonl_exp").toString
    val df = Seq(
      (1L, "multi\nline\ttext"), (2L, "plain"), (3L, "quote\"s"))
      .toDF("doc_id", "text").coalesce(1)
    ParquetSink.exportJsonl(df, s"$tmp/out", maxRecordsPerFile = 2)
    assert(spark.read.textFile(s"$tmp/out").inputFiles.length == 2,
      "maxRecordsPerFile must shard the export")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, quar) = graft.etl.RawReaders.jsonlQuarantined(
      spark, s"$tmp/out", schema)
    assert(quar.count() == 0)
    assert(clean.orderBy("doc_id").collect().map(_.getString(1)).toSeq ==
      Seq("multi\nline\ttext", "plain", "quote\"s"))

    ParquetSink.exportJsonl(df, s"$tmp/gz", gzip = true)
    val gzFiles = new java.io.File(s"$tmp/gz").listFiles()
      .map(_.getName).filter(_.endsWith(".json.gz"))
    assert(gzFiles.nonEmpty, "gzip export must write .json.gz shards")
    val (cleanGz, _) = graft.etl.RawReaders.jsonlQuarantined(
      spark, s"$tmp/gz", schema)
    assert(cleanGz.count() == 3, "text source must decode the gzip shards")

    intercept[ParquetSink.EmptyWriteException] {
      ParquetSink.exportJsonl(df.limit(0), s"$tmp/empty")
    }
  }

  test("path templating matches the reference pattern") {
    val p = ParquetSink.templatedPath("/out", "conte", "2024-01", "1.0", "20240115")
    assert(p == "/out/FRESCO_conte_ts_2024-01_v1.0_20240115.parquet")
  }

  test("crossfilter: each chart sees every other chart's predicate") {
    val events = Tables.load(spark, SparkTestSession.sfDir, "events")
    val cf = Crossfilter.empty
      .withPredicate("hist", col("value") > 50)
      .withPredicate("line", col("event_type") === "click")
    // hist's view: only the line filter applies
    val histView = cf(events, "hist")
    assert(histView.filter(col("event_type") =!= "click").count() == 0)
    assert(histView.filter(col("value") <= 50).count() > 0)
    // menu backing query
    val menu = Crossfilter.distinctMenu(events, "event_type").collect().map(_.getString(0))
    assert(menu.length == 5 && menu.sameElements(menu.sorted))
  }
}
