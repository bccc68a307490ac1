package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for one query: runs it once and prints every
  * completed stage's wall time, task count and shuffle/input volumes,
  * heaviest first — the "which stage eats the time" answer the bench
  * can't give. `runMain graft.Probe <sfDir> <queryName>` */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
          .getOrElse(-1L)
        val m = i.taskMetrics
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(90), wall,
          i.numTasks, m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    // adhoc:embcluster:<signBits> probes q47's operator with a scaled
    // LSH bucket count — the knob the rehearsal showed must grow with
    // the corpus (the pair join is n²/2^signBits per bucket family)
    def build() = name match {
      case s if s.startsWith("adhoc:embcluster:") =>
        import org.apache.spark.sql.functions.{col, size}
        val emb = Tables.load(spark, sfDir, "embeddings")
        val dim = emb.select(size(col("embedding"))).first().getInt(0)
        graft.ext.DedupOps.resolveClusters(
          graft.ext.DedupOps.embeddingNearDupPairs(
            emb, col("vec_id"), col("embedding"), threshold = 0.4,
            dim = dim, signBits = s.split(":").last.toInt)
            .select("id_a", "id_b"))
      // adhoc:sigstore-update:<storeDir> — SignatureStore.update over
      // the corpus: first run = cold signature pass + segment write,
      // second run over the same store = steady-state (anti-join finds
      // nothing, no write). adhoc:sigstore-pairs:<storeDir> — LSH band
      // join STRAIGHT off the stored signatures (the amortized read
      // path; compare against q35's recompute-everything time).
      case s if s.startsWith("adhoc:sigstore-update:") =>
        import org.apache.spark.sql.functions.col
        graft.ext.SignatureStore.update(spark,
          s.stripPrefix("adhoc:sigstore-update:"),
          Tables.load(spark, sfDir, "documents").select("doc_id", "text"))
      // adhoc:ivffit — the PURE cold-fit price over the sfDir embeddings
      // (nlist=16, 2 Lloyd rounds + full assignment), isolated from any
      // query fixture: the number the sampled-fit claim is pinned on.
      case "adhoc:ivffit" =>
        import org.apache.spark.sql.functions.col
        val corpus = Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        graft.ext.SimilarityOps.ivfFit(corpus, nlist = 16).assigned
      case s if s.startsWith("adhoc:sigstore-pairs:") =>
        val sigs = graft.ext.SignatureStore
          .read(spark, s.stripPrefix("adhoc:sigstore-pairs:"))
          .getOrElse(sys.error("empty store"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.ext.DedupOps.candidatePairsFromSignatures(sigs)
          .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.5)
      case _ => SparkEntry.queries(name)(spark, sfDir)
    }
    // SPARK_GRAFT_PROBE_RUNS=N re-runs the query and prints a stage
    // table per run: run 1 is the bench's "cold" (pin materialization
    // included), later runs are the warm shape the bench's min-of-N
    // actually reports — the two attribute very differently for every
    // query that pins a shared frame.
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "1").toInt
    for (r <- 1 to runs) {
      stages.clear()
      val t0 = System.nanoTime()
      val n = build().count()
      val total = (System.nanoTime() - t0) / 1e9
      // give the listener bus a moment to drain before reading
      Thread.sleep(2000)
      println(f"query=$name run=$r rows=$n total=$total%.1fs")
      println(f"${"stage"}%-6s${"wall_ms"}%9s${"tasks"}%7s${"input_mb"}%10s${"shuf_r_mb"}%11s${"shuf_w_mb"}%11s  name")
      stages.sortBy(-_._3).take(25).foreach { case (id, nm, w, t, in, sr, sw) =>
        println(f"$id%-6d$w%9d$t%7d${in / 1e6}%10.1f${sr / 1e6}%11.1f${sw / 1e6}%11.1f  $nm")
      }
    }
    spark.stop()
  }
}
