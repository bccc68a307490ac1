package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Grouped Misra–Gries at HIGH group counts — the round-13 measurement
  * probe for the claim q205 rides on: "state is groups × k counters and
  * the exact (group × term) exchange never exists". At the gate's 5
  * languages that is trivially true; this probe derives ~10k groups
  * from the corpus and pins, against the exact two-exchange form
  * (groupBy(group, term).count → top-per-group), the numbers that
  * matter at 100 TB:
  *
  *  - shuffle RECORDS of the MG aggregation ≤ groups × shuffle
  *    partitions (one k-capped partial summary per (partition, group)),
  *    asserted in-process — vs the exact form's (group × term) domain;
  *  - shuffle BYTES of both forms;
  *  - wall time of both forms.
  *
  * Usage: runMain graft.GroupedMgProbe <sfDir> [groups] [k] [outJson]
  * Point sfDir at a ScaleUp directory (e.g. /tmp/sf10) for the ×100
  * rehearsal number recorded in BENCH_mg_groups.json.
  */
object GroupedMgProbe {

  private case class RunMetrics(sec: Double, shuffleBytes: Long,
                                shuffleRecords: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sf10")
    val groups = args.lift(1).map(_.toInt).getOrElse(10000)
    val k = args.lift(2).map(_.toInt).getOrElse(64)
    val outJson = args.lift(3)
    val cores = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val writeBytes = new java.util.concurrent.atomic.AtomicLong()
    val writeRecords = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // the listener bus is async and its waitUntilEmpty is private[spark]:
    // poll until the counters are stable for 500 ms before reading them
    def quiesce(): Unit = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var prev = (writeBytes.get(), writeRecords.get())
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 500L * 1000 * 1000
          && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val cur = (writeBytes.get(), writeRecords.get())
        if (cur != prev) { prev = cur; stableSince = System.nanoTime() }
      }
    }

    def measure(run: () => Unit): RunMetrics = {
      quiesce()
      writeBytes.set(0L); writeRecords.set(0L)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      quiesce()
      RunMetrics(sec, writeBytes.get(), writeRecords.get())
    }

    // ~`groups` groups derived from doc_id (domain-shaped key), full
    // token stream — the same shape as q205 with lang swapped for a
    // high-cardinality group
    val toks = Tables.load(spark, sfDir, "documents")
      .select(pmod(xxhash64(col("doc_id")), lit(groups.toLong)).as("dom"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")

    // warm the scan once so neither arm pays the parquet-footer pass
    toks.agg(count(lit(1))).head()

    val mg = measure { () =>
      val out = toks.groupBy("dom")
        .agg(graft.functions.FreqSketch.mgSummary(col("term"), k).as("mg"))
        .select(sum(size(col("mg.items"))).as("total_items"),
          count(lit(1)).as("n_groups"), max(col("mg.err_bound")).as("max_err"))
        .head()
      System.err.println(s"[mg] groups=${out.getLong(1)} " +
        s"items=${out.getLong(0)} max_err=${out.getLong(2)}")
    }
    val exact = measure { () =>
      val out = toks.groupBy("dom", "term")
        .agg(count(lit(1)).as("n"))
        .groupBy("dom").agg(max(col("n")).as("top_n"), count(lit(1)).as("vocab"))
        .agg(count(lit(1)).as("n_groups"), sum(col("vocab")).as("pairs"))
        .head()
      System.err.println(s"[exact] groups=${out.getLong(0)} " +
        s"group_term_pairs=${out.getLong(1)}")
    }

    // THE claim, asserted: the MG exchange carries at most one k-capped
    // partial per (map partition, group) — never the (group × term)
    // domain. (Records count partials, not counters; each partial holds
    // ≤ k counters.)
    val scanParts = toks.rdd.getNumPartitions.toLong
    // bound = one k-capped partial per (map partition, group) for the
    // MG exchange, PLUS the model-sized second exchange of the summary
    // roll-up (one record per reduce partition per agg column — bounded
    // by a small multiple of the partition count, NOT by the data)
    val mgBound = groups.toLong * (scanParts max cores.toLong) + 64L * cores
    assert(mg.shuffleRecords <= mgBound,
      s"MG shuffle records ${mg.shuffleRecords} exceed groups×partitions $mgBound")
    assert(mg.shuffleBytes < exact.shuffleBytes,
      s"MG exchange (${mg.shuffleBytes} B) must undercut the exact " +
        s"(group × term) exchange (${exact.shuffleBytes} B)")

    val json =
      f"""{"metric":"grouped_mg_probe","sf_dir":"$sfDir","groups":$groups,"k":$k,""" +
        f""""scan_partitions":$scanParts,""" +
        f""""mg":{"sec":${mg.sec}%.2f,"shuffle_bytes":${mg.shuffleBytes},"shuffle_records":${mg.shuffleRecords},"record_bound_groups_x_partitions":$mgBound},""" +
        f""""exact":{"sec":${exact.sec}%.2f,"shuffle_bytes":${exact.shuffleBytes},"shuffle_records":${exact.shuffleRecords}},""" +
        f""""bytes_ratio_exact_over_mg":${exact.shuffleBytes.toDouble / math.max(1L, mg.shuffleBytes)}%.1f}"""
    println(json)
    outJson.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
