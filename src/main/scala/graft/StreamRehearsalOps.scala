package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{StreamingCardinality, StreamingContamination,
  StreamingQuota}

/** Sustained-rate rehearsal of the OTHER stateful streaming paths —
  * the [[StreamRehearsal]] 20-batch flat-latency protocol
  * (`STREAM_REHEARSAL.json` covers [[graft.streaming.StreamingNearDedup]]
  * only) applied to each path with growth risk:
  *
  *  - **quota** ([[StreamingQuota]]): one long per group; 20 × 50k docs
  *    over 200 groups — latency must stay flat as cumulative admitted
  *    tokens grow, state rows pinned at the group count.
  *  - **cardinality** ([[StreamingCardinality]]): one 2^b-byte HLL
  *    register array per key; 20 × 50k items over 100 keys with
  *    ever-new item values — the TRACKED distinct count grows every
  *    batch, the state bytes and latency must not.
  *  - **sessions** (session_window + watermark): event time advances
  *    each batch, so closed sessions must LEAVE state — state rows are
  *    bounded by open sessions (≤ keys × a small constant), not by
  *    stream length.
  *  - **contamination** ([[StreamingContamination]]): stateless by
  *    design (static benchmark side); flat per-batch flag+append time
  *    as the output directory grows is the measurable claim.
  *  - **heavy_hitters** ([[graft.streaming.StreamingHeavyHitters]]):
  *    one k-capped Misra–Gries buffer per key; every batch adds a
  *    never-repeating item tail, so the tracked item domain grows
  *    linearly while state rows stay pinned at the key count and the
  *    per-row buffer at k counters.
  *
  * Per path: per-batch wall seconds, the state-rows trajectory from
  * StreamingQueryProgress (the bounded-state evidence), and
  * flat_ratio = mean(last 5) / mean(batches 1–5) (batch 0 pays JIT).
  *
  * Usage: runMain graft.StreamRehearsalOps [nBatches] [rowsPerBatch]
  * [outJson]. Prints ONE JSON line; writes it to outJson if given. */
object StreamRehearsalOps {

  private case class PathRun(times: Array[Double], stateRows: Array[Long],
                             note: String)

  private def flat(times: Array[Double]): (Double, Double, Double) = {
    val head = times.slice(1, 6).sum / 5
    val tail = times.takeRight(5).sum / 5
    (head, tail, tail / head)
  }

  private def lastStateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).flatMap(p => p.stateOperators.headOption)
      .map(_.numRowsTotal).getOrElse(0L)

  private def runQuota(spark: SparkSession, n: Int, rows: Long): PathRun = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val groups = 200
    val ms = MemoryStream[StreamingQuota.Doc]
    val quotas = (0 until groups).map(g => s"g$g" -> 40000L).toMap
    val ckpt = java.nio.file.Files.createTempDirectory("reh_quota").toString
    val q = StreamingQuota.admit(ms.toDS(), quotas)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      val docs = (0L until rows).map(i => StreamingQuota.Doc(
        s"g${i % groups}", b * rows + i, 10L))
      val t0 = System.nanoTime()
      ms.addData(docs)
      q.processAllAvailable()
      times(b) = (System.nanoTime() - t0) / 1e9
      state(b) = lastStateRows(q)
      System.err.println(f"[quota] batch $b%02d ${times(b)}%.2fs state=${state(b)}")
    }
    q.stop()
    PathRun(times, state, s"state rows must stay = $groups groups")
  }

  private def runCardinality(spark: SparkSession, n: Int, rows: Long): PathRun = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val keys = 100
    val ms = MemoryStream[(String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("reh_card").toString
    val q = StreamingCardinality.runningDistinct(
        ms.toDF().toDF("k", "item"), "k", "item", b = 9)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      // every batch contributes NEW distinct items per key: the tracked
      // cardinality grows linearly while HLL state stays 2^9 B per key
      val batch = (0L until rows).map(i =>
        (s"k${i % keys}", s"item-$b-$i"))
      val t0 = System.nanoTime()
      ms.addData(batch)
      q.processAllAvailable()
      times(b) = (System.nanoTime() - t0) / 1e9
      state(b) = lastStateRows(q)
      System.err.println(f"[card] batch $b%02d ${times(b)}%.2fs state=${state(b)}")
    }
    q.stop()
    PathRun(times, state, s"state rows must stay = $keys HLL registers")
  }

  private def runSessions(spark: SparkSession, n: Int, rows: Long): PathRun = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val users = 100
    val ms = MemoryStream[(Long, String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("reh_sess").toString
    val events = ms.toDF().toDF("sec", "user", "value")
      .select(timestamp_seconds(col("sec")).as("ts"), col("user"), col("value"))
    val q = graft.streaming.StreamingSessions.sessionSummaries(
        events, "ts", "user", "value", gap = "2 minutes",
        lateness = "1 minute")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      // batch b owns minutes [10b, 10b+10): each user gets 2 sessions
      // per batch; the advancing watermark closes them, so state holds
      // only the open tail — NOT every session ever seen
      val base = b.toLong * 600
      val batch = (0L until rows).map { i =>
        val u = i % users
        val slot = i / users
        (base + (slot % 2) * 300 + (slot / 2) % 100, s"u$u", 1L)
      }
      val t0 = System.nanoTime()
      ms.addData(batch)
      q.processAllAvailable()
      times(b) = (System.nanoTime() - t0) / 1e9
      state(b) = lastStateRows(q)
      System.err.println(f"[sess] batch $b%02d ${times(b)}%.2fs state=${state(b)}")
    }
    q.stop()
    PathRun(times, state, "state rows bounded by OPEN sessions (watermark closes the rest)")
  }

  private def runContamination(spark: SparkSession, n: Int, rows: Long): PathRun = {
    // batch-driven like the near-dedup rehearsal: flagBatch is the
    // exact function the foreachBatch sink runs
    val bench = StreamRehearsal.makeBatch(spark, 0, 1000)
    val benchKeys = graft.ext.ExactSubstrOps.benchGramKeys(
        bench, col("doc_id"), col("text"), l = 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    benchKeys.count()
    val outDir = java.nio.file.Files.createTempDirectory("reh_cont").toString + "/out"
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      val batch = StreamRehearsal.makeBatch(spark, b + 1, rows).persist()
      batch.count()
      val t0 = System.nanoTime()
      StreamingContamination.flagBatch(batch, benchKeys, l = 8)
        .write.mode("append").parquet(outDir)
      times(b) = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      state(b) = 0L // stateless by design — that IS the claim
      System.err.println(f"[cont] batch $b%02d ${times(b)}%.2fs")
    }
    PathRun(times, state, "stateless: flat batch time as output dir grows")
  }

  private def runBlocklist(spark: SparkSession, n: Int, rows: Long): PathRun = {
    // The ingest-time Aho–Corasick blocklist stage
    // (StreamingPrep.tagBlocklist): stateless, so the rehearsal claim
    // is THROUGHPUT INDEPENDENCE FROM BLOCKLIST SIZE — the pattern set
    // cycles 10 → 10k across batches; a flat batch-time series IS the
    // O(text + matches) claim (per-pattern contains() would be 1000×
    // slower at the top size). A few hex bigrams guarantee real match
    // emission; the bulk of each set ('blk<i>x') can never match the
    // [0-9a-f] token text.
    def mkPatterns(m: Int): Seq[String] =
      Seq("aa", "bb", "cc", "dd") ++ (0 until m - 4).map(i => s"blk${i}x")
    val sizes = Array(10, 100, 1000, 10000)
    val patternSets = sizes.map(m => m -> mkPatterns(m)).toMap
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    val hitCounts = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      val m = sizes(b % sizes.length)
      val batch = StreamRehearsal.makeBatch(spark, b, rows).persist()
      batch.count()
      val t0 = System.nanoTime()
      hitCounts(b) = graft.streaming.StreamingPrep
        .tagBlocklist(batch, patternSets(m))
        .agg(sum(size(col("blocklist_ids")))).head().getLong(0)
      times(b) = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      state(b) = 0L // stateless by design — that IS the claim
      System.err.println(
        f"[blk] batch $b%02d patterns=$m%5d ${times(b)}%.2fs hits=${hitCounts(b)}")
    }
    val bySize = (0 until n).groupBy(b => sizes(b % sizes.length))
      .toSeq.sortBy(_._1)
      .map { case (m, bs) =>
        f"$m=${bs.map(times).sum / bs.size}%.2fs" }
      .mkString(" ")
    assert(hitCounts.forall(_ > 0), "match emission must be exercised")
    PathRun(times, state,
      s"stateless; pattern set cycles 10->10k per batch; mean sec by size: $bySize")
  }

  private def runHeavyHitters(spark: SparkSession, n: Int, rows: Long): PathRun = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val keys = 100
    val ms = MemoryStream[(String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("reh_hh").toString
    val q = graft.streaming.StreamingHeavyHitters.runningHeavyHitters(
        ms.toDF().toDF("k", "item"), "k", "item", k = 64, topN = 5)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val times = Array.ofDim[Double](n)
    val state = Array.ofDim[Long](n)
    (0 until n).foreach { b =>
      // zipf-ish: a few persistent heavy items per key + a tail of
      // NEVER-REPEATING items — the tracked item domain grows by
      // rows/2 distinct strings every batch while the MG buffer stays
      // k-capped, which is the whole claim. Key derives from i/2 so
      // heavy and tail rows land on the SAME keys (keys=100 is even —
      // keying on i%keys would make i%2 equal key parity and give
      // every key a pure diet, never exercising MG retention under
      // tail churn inside one buffer)
      val batch = (0L until rows).map { i =>
        val key = s"k${(i / 2) % keys}"
        if (i % 2 == 0) (key, s"heavy${(i / 2) % 16}") else (key, s"tail-$b-$i")
      }
      val t0 = System.nanoTime()
      ms.addData(batch)
      q.processAllAvailable()
      times(b) = (System.nanoTime() - t0) / 1e9
      state(b) = lastStateRows(q)
      System.err.println(f"[hh] batch $b%02d ${times(b)}%.2fs state=${state(b)}")
    }
    q.stop()
    PathRun(times, state,
      s"state rows must stay = $keys MG summaries (k=64 counters each)")
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20)
    val rows = args.lift(1).map(_.toLong).getOrElse(50000L)
    val outJson = args.lift(2)
    val cores = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // No explicit state-store config: the stateful operators install
      // the certified RocksDB provider themselves (StreamConf, r12) —
      // this rehearsal now certifies the DEFAULT path a user gets, not
      // a harness-only configuration. History: the Spark built-in
      // HDFS-backed store measured 2.3 s → 7.5 s per batch at FLAT
      // state rows here (delta replay; the 60 s maintenance thread
      // never fires inside a high-rate window).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = Seq(
      "quota" -> runQuota(spark, n, rows),
      "cardinality" -> runCardinality(spark, n, rows),
      "sessions" -> runSessions(spark, n, rows),
      "contamination" -> runContamination(spark, n, rows),
      "heavy_hitters" -> runHeavyHitters(spark, n, rows),
      "blocklist" -> runBlocklist(spark, n, rows))

    val paths = runs.map { case (name, r) =>
      val (head, tail, ratio) = flat(r.times)
      s""""$name":{"batch_sec":[${r.times.map(t => f"$t%.2f").mkString(",")}],""" +
        s""""state_rows":[${r.stateRows.mkString(",")}],""" +
        f""""head_mean_sec":$head%.2f,"tail_mean_sec":$tail%.2f,""" +
        f""""flat_ratio":$ratio%.2f,""" +
        s""""max_state_rows":${r.stateRows.max},"note":"${r.note}"}"""
    }.mkString(",")
    val json = s"""{"metric":"stream_backpressure_ops","batches":$n,""" +
      s""""rows_per_batch":$rows,$paths}"""
    println(json)
    outJson.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
