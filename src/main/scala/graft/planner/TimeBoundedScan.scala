package graft.planner

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
    * bytes + resulting task-partition count. */
  case class ScanPlan(files: Long, estimatedBytes: Long, taskPartitions: Int)

  /** Scan an hour-partitioned table (layout written by
    * `ParquetSink.writeHourPartitioned`) restricted to [start, end].
    * Filters on the partition columns so Catalyst prunes directories;
    * the redundant-looking `ts BETWEEN` keeps row-level exactness at the
    * window edges. Timestamps are `yyyy-MM-dd HH:mm:ss` literals. */
  def scan(spark: SparkSession, path: String,
           start: String, end: String): DataFrame = {
    require(start.nonEmpty && end.nonEmpty, throw UnboundedQueryException())
    val df = spark.read.parquet(path)
    val s = to_timestamp(lit(start))
    val e = to_timestamp(lit(end))
    // Partition-granularity bound: hour-floor the window ends, then
    // compare on the partition columns (pruning happens at planning).
    val partTs = make_timestamp(
      col("year"), col("month"), col("day"), col("hour"), lit(0), lit(0))
    df.filter(partTs >= date_trunc("hour", s) && partTs <= e)
      .filter(col("ts").between(s, e))
  }

  /** Report what a scan would touch (B7 parity: expose plan metadata). */
  def plan(spark: SparkSession, path: String,
           start: String, end: String): ScanPlan = {
    val df = scan(spark, path, start, end)
    val files = df.inputFiles
    val bytes = {
      val hconf = spark.sparkContext.hadoopConfiguration
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      }.sum
    }
    ScanPlan(files.length, bytes, df.rdd.getNumPartitions)
  }
}
