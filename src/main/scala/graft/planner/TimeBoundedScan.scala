package graft.planner

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-bounded scan facade — the Spark-native replacement for the
  * reference's Lambda query planner (backend/lambda/lambda_handler.py).
  *
  * The reference hand-rolls: SQL parsing (B1-B4), manifest-driven
  * hour-key partition pruning (B5), and a partition-count heuristic (B6).
  * On Spark every one of those is subsumed: reading a
  * `year=/month=/day=/hour=` layout with a filter on the partition
  * columns prunes directories before any I/O (Hive-style pruning), and
  * `spark.sql.files.maxPartitionBytes` plays the role of the 50 MB
  * split heuristic. What remains worth keeping is the CONTRACT: queries
  * against the big fact table must be time-bounded
  * (lambda_handler.py:290-292 rejects unbounded queries), plus a plan
  * report surfacing what was pruned.
  */
object TimeBoundedScan {

  case class UnboundedQueryException()
    extends IllegalArgumentException(
      "query must include a time range (reference contract: lambda_handler.py:290-292)")

  /** Plan metadata, the Spark analogue of the reference's QueryPlan JSON
    * (lambda_handler.py:89-95): files touched after pruning + estimated
    * bytes + resulting task-partition count + exact row count from
    * parquet footer metadata (`rows` — the reference manifest's
    * per-chunk `recordCount`, lambda_handler.py:80-95; no data scan). */
  case class ScanPlan(files: Long, estimatedBytes: Long, taskPartitions: Int,
                      rows: Long)

  /** Scan an hour-partitioned table (layout written by
    * `ParquetSink.writeHourPartitioned`) restricted to [start, end].
    * Filters on the partition columns so Catalyst prunes directories;
    * the redundant-looking `ts BETWEEN` keeps row-level exactness at the
    * window edges. Timestamps are `yyyy-MM-dd HH:mm:ss` literals. */
  def scan(spark: SparkSession, path: String,
           start: String, end: String, tsCol: String = "ts"): DataFrame = {
    require(start.nonEmpty && end.nonEmpty, throw UnboundedQueryException())
    val df = spark.read.parquet(path)
    val s = to_timestamp(lit(start))
    val e = to_timestamp(lit(end))
    // Partition-granularity bound: hour-floor the window ends, then
    // compare on the partition columns (pruning happens at planning).
    val partTs = make_timestamp(
      col("year"), col("month"), col("day"), col("hour"), lit(0), lit(0))
    df.filter(partTs >= date_trunc("hour", s) && partTs <= e)
      .filter(col(tsCol).between(s, e))
  }

  /** Report what a scan will touch (B7 parity: expose plan metadata).
    *
    * Enumerates the hour keys covering [start, end] exactly like the
    * reference's manifest lookup (get_required_hours,
    * lambda_handler.py:298-373) and lists each existing
    * `year=/month=/day=/hour=` directory. Driver-side work is O(hours in
    * window), never O(data) — the same bound the reference engineered
    * for. Note `DataFrame.inputFiles` can NOT be used here: it reports
    * the unpruned listing. */
  def plan(spark: SparkSession, path: String,
           start: String, end: String): ScanPlan = {
    require(start.nonEmpty && end.nonEmpty, throw UnboundedQueryException())
    val hconf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(hconf)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    var t = java.time.LocalDateTime.parse(start, fmt).truncatedTo(java.time.temporal.ChronoUnit.HOURS)
    val e = java.time.LocalDateTime.parse(end, fmt)
    var files = 0L
    var bytes = 0L
    var rows = 0L
    while (!t.isAfter(e)) {
      val dir = new org.apache.hadoop.fs.Path(base,
        s"year=${t.getYear}/month=${t.getMonthValue}/day=${t.getDayOfMonth}/hour=${t.getHour}")
      if (fs.exists(dir)) {
        fs.listStatus(dir).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .foreach { s =>
            files += 1; bytes += s.getLen
            // row count from the footer (block metadata only — a few KiB
            // read per file, never column data); parquet-hadoop ships in
            // Spark's own classpath
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(s, hconf)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try rows += reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
            finally reader.close()
          }
      }
      t = t.plusHours(1)
    }
    val maxPartitionBytes = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
      .stripSuffix("b").toLong
    val tasks = math.max(1, math.ceil(bytes.toDouble / maxPartitionBytes).toInt)
    ScanPlan(files, bytes, tasks, rows)
  }
}
