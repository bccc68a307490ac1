package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Gate-runtime design (the r7 artifact was lost to a ~40-min gate):
  *  - cores default to ALL available (not 4) — the dump is the driver's
  *    hard correctness signal, so it gets the whole box unless
  *    SPARK_GRAFT_CPUS says otherwise;
  *  - queries dump CONCURRENTLY from a small thread pool: Spark's
  *    scheduler interleaves jobs from multiple submitter threads, so
  *    driver-side model iterations (GD/power-iteration collects) overlap
  *    other queries' executor work instead of serializing the sweep;
  *  - no `.coalesce(1)`: it collapses every post-shuffle (or map-only)
  *    stage to ONE task for the write — the DuckDB side globs every
  *    part-file under `<name>/`, so multi-file output costs nothing;
  *  - pinned frames drain once at the end (sf0.01 pins are tiny;
  *    draining mid-sweep would unpersist frames concurrent queries are
  *    using). Shared fit caches (ivfFitCached etc.) are TrieMap-backed
  *    and already thread-safe.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cores = math.min(32, Runtime.getRuntime.availableProcessors())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // DuckDB/Polars-parity null-on-error semantics (SURVEY §2 P9)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY: comma-separated query names (local iteration
    // aid, same knob as Bench; driver leaves it unset → full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
    val poolSize = sys.env.getOrElse("SPARK_GRAFT_VERIFY_POOL", "6").toInt
    val pool = Executors.newFixedThreadPool(poolSize)
    val t0 = System.nanoTime()
    todo.foreach { case (name, fn) =>
      pool.execute { () =>
        val tq = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
          System.err.println(
            f"[verify] $name ok in ${(System.nanoTime() - tq) / 1e9}%.2fs")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, TimeUnit.HOURS)
    QueryCaches.drain()
    System.err.println(
      f"[verify] dump total ${(System.nanoTime() - t0) / 1e9}%.1fs for ${todo.size} queries")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
