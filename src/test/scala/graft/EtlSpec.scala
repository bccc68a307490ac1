package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._

/** Fixtures follow FIXTURES.md §1: cumulative counters per
  * (jobID, node[, device]) with planted edge cases — negative deltas,
  * sub-0.1 s gaps, unparseable values, null ids. */
class EtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val GB = 1024.0 * 1024.0 * 1024.0

  test("block: sector deltas -> GB/s, device rollup, gating") {
    val raw = Seq(
      // normal series: two devices on one node, 10s apart
      ("jobID1", "n1", "sda", "01/15/2024 10:00:00", "1000", "1000"),
      ("jobID1", "n1", "sda", "01/15/2024 10:00:10", "3000", "1000"),
      ("jobID1", "n1", "sdb", "01/15/2024 10:00:00", "0", "0"),
      ("jobID1", "n1", "sdb", "01/15/2024 10:00:10", "1024", "1024"),
      // counter reset (negative delta -> rate 0)
      ("jobID2", "n2", "sda", "01/15/2024 10:00:00", "5000", "0"),
      ("jobID2", "n2", "sda", "01/15/2024 10:00:10", "100", "0"))
      .toDF("jobID", "node", "device", "timestamp", "rd_sectors", "wr_sectors")
    val out = MetricTransformers.block(raw)
    assert(out.columns.toSeq == Seq("Job Id", "Host", "Event", "Value", "Units", "Timestamp"))
    assert(out.select("Event").distinct().head().getString(0) == "block")
    val atT10 = out.filter(col("Job Id") === "JOB1" &&
      col("Timestamp") === to_timestamp(lit("2024-01-15 10:00:10"))).head()
    // sda delta 2000 sectors + sdb delta 2048 sectors, /10s, *512B -> GB/s
    val expected = (2000.0 * 512 / GB / 10) + (2048.0 * 512 / GB / 10)
    assert(math.abs(atT10.getDouble(3) - expected) < 1e-12)
    // reset row gated to 0
    val reset = out.filter(col("Job Id") === "JOB2" &&
      col("Timestamp") === to_timestamp(lit("2024-01-15 10:00:10"))).head()
    assert(reset.getDouble(3) == 0.0)
  }

  test("block: jobID normalization and null id fill") {
    val raw = Seq(
      ("job99", "n1", "sda", "01/15/2024 10:00:00", "0", "0"),
      (null: String, "n1", "sdb", "01/15/2024 10:00:00", "0", "0"))
      .toDF("jobID", "node", "device", "timestamp", "rd_sectors", "wr_sectors")
    val ids = MetricTransformers.block(raw).select("Job Id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("JOB99", "unknown"))
  }

  test("cpu: ratio-of-sums across cores, clipped to [0,100]") {
    // one node, two cores; each core: user+=100, nice+=0, idle+=100 over 10s
    def row(core: String, t: String, u: Long, i: Long) =
      ("j1", "n1", core, t, u.toString, "0", "0", i.toString, "0", "0", "0")
    val raw = Seq(
      row("0", "01/15/2024 10:00:00", 0, 0),
      row("1", "01/15/2024 10:00:00", 0, 0),
      row("0", "01/15/2024 10:00:10", 100, 100),
      row("1", "01/15/2024 10:00:10", 100, 100))
      .toDF("jobID", "node", "device", "timestamp",
        "user", "nice", "system", "idle", "iowait", "irq", "softirq")
    val out = MetricTransformers.cpu(raw)
    // first timestamps dropped (null deltas); one node-level row remains
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getString(2) == "cpuuser" && r.getString(4) == "CPU %")
    // (100+100)/(200+200)*100 = 50%
    assert(math.abs(r.getDouble(3) - 50.0) < 1e-9)
  }

  test("cpu: zero total delta row excluded, never NaN") {
    def row(t: String, u: Long) = ("j1", "n1", "0", t, u.toString, "0", "0", "0", "0", "0", "0")
    val raw = Seq(row("01/15/2024 10:00:00", 0), row("01/15/2024 10:00:10", 0))
      .toDF("jobID", "node", "device", "timestamp",
        "user", "nice", "system", "idle", "iowait", "irq", "softirq")
    val vals = MetricTransformers.cpu(raw).select("Value").collect().map(_.getDouble(0))
    assert(vals.forall(v => !v.isNaN && v >= 0 && v <= 100))
  }

  test("memory: clamp chain and two events per row") {
    val raw = Seq(
      // MemFree > MemTotal (clamped), FilePages > used (clamped)
      ("j1", "n1", "01/15/2024 10:00:00",
        (4 * GB).toLong.toString, (5 * GB).toLong.toString, (1 * GB).toLong.toString),
      ("j1", "n1", "01/15/2024 10:00:10",
        (4 * GB).toLong.toString, (1 * GB).toLong.toString, (1 * GB).toLong.toString))
      .toDF("jobID", "node", "timestamp", "MemTotal", "MemFree", "FilePages")
    val out = MetricTransformers.memory(raw)
    assert(out.count() == 4) // U1: two events per input row
    val byEvent = out.groupBy("Event").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEvent == Map("memused" -> 2L, "memused_minus_diskcache" -> 2L))
    // row 1: free clamped to total -> used 0; minus_diskcache 0
    val used0 = out.filter(col("Event") === "memused" &&
      col("Timestamp") === to_timestamp(lit("2024-01-15 10:00:00"))).head().getDouble(3)
    assert(used0 == 0.0)
    // row 2: used = 3 GB; FilePages 1GB <= used -> minus = 2 GB
    val minus1 = out.filter(col("Event") === "memused_minus_diskcache" &&
      col("Timestamp") === to_timestamp(lit("2024-01-15 10:00:10"))).head().getDouble(3)
    assert(math.abs(minus1 - 2.0) < 1e-9)
  }

  test("nfs: first row per group dropped, MB/s rate") {
    val raw = Seq(
      ("j1", "n1", "01/15/2024 10:00:00", "0", "0"),
      ("j1", "n1", "01/15/2024 10:00:10", (10 * 1024 * 1024).toString, "0"),
      ("j2", "n2", "01/15/2024 10:00:00", "0", "0"))
      .toDF("jobID", "node", "timestamp", "read_bytes", "write_bytes")
    val out = MetricTransformers.nfs(raw)
    assert(out.count() == 1) // both first rows dropped
    val r = out.head()
    assert(r.getString(2) == "nfs" && r.getString(4) == "MB/s")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9) // 10 MB / 10 s
  }

  test("W2/W3: deltas of a cumulative sum recover the original rates") {
    // property: block() on cumsum(counters) with constant dt returns the rates
    val rates = Seq(100L, 200L, 300L, 150L)
    val cum = rates.scanLeft(0L)(_ + _)
    val rows = cum.zipWithIndex.map { case (c, i) =>
      ("j", "n", "d", f"01/15/2024 10:${i}%02d:00", (c * 1024 * 1024 * 2).toString, "0")
    }
    val raw = rows.toDF("jobID", "node", "device", "timestamp", "rd_sectors", "wr_sectors")
    val out = MetricTransformers.block(raw).orderBy("Timestamp")
      .select("Value").collect().map(_.getDouble(0))
    // first row -> 0 (null delta), others = rate GB per 60 s
    assert(out.head == 0.0)
    rates.zip(out.tail).foreach { case (r, v) =>
      assert(math.abs(v - r.toDouble * 1024 * 1024 * 2 * 512 / GB / 60) < 1e-9)
    }
  }

  test("unparseable numerics and timestamps are dropped") {
    val raw = Seq(
      ("j1", "n1", "sda", "01/15/2024 10:00:00", "abc", "0"),
      ("j1", "n1", "sda", "not-a-date", "100", "0"),
      ("j1", "n1", "sda", "01/15/2024 10:00:10", "100", "0"))
      .toDF("jobID", "node", "device", "timestamp", "rd_sectors", "wr_sectors")
    assert(MetricTransformers.block(raw).count() == 1)
  }

  test("generic transforms: suffix, normalize, standardize, reorder") {
    val df = Seq(("id1", "x")).toDF("Job Id", "other")
    val suffixed = GenericTransforms.appendSuffix(df, Seq("Job Id"), "_C")
    assert(suffixed.head().getString(0) == "id1_C")

    val norm = GenericTransforms.normalizePatterns(
      Seq("jobID77").toDF("j"), "j", Seq("jobID" -> "JOB", "job" -> "JOB"))
    assert(norm.head().getString(0) == "JOB77")

    val schema = StructType(Seq(
      StructField("Job Id", StringType), StructField("Value", DoubleType)))
    val std = GenericTransforms.standardizeSchema(Seq(("a")).toDF("Job Id"), schema)
    assert(std.columns.toSeq == Seq("Job Id", "Value"))
    assert(std.head().isNullAt(1))

    val multi = GenericTransforms.parseTimestamp(
      lit("2024-01-15 10:00:00"), Seq("MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss"))
    assert(!Seq(1).toDF("x").select(multi).head().isNullAt(0))
  }
}
