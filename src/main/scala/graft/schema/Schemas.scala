package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas of the engine (SURVEY §1).
  *
  * - job table: the 22-column analytic table
  *   (web/src/utils/schema.ts:13-47, web/src/util/client.ts:66-90)
  * - event schema: the ETL long/narrow output
  *   (parquet_loader.py:179, conte_hpc.yaml:27-33)
  * - raw CSV schemas: per-metric monitoring inputs (FIXTURES.md §1;
  *   counters arrive as strings and pass through try_cast in the
  *   transformers, so they are declared StringType here)
  */
object Schemas {

  val metricColumns: Seq[String] = Seq(
    "value_cpuuser", "value_gpu", "value_memused",
    "value_memused_minus_diskcache", "value_nfs", "value_block")

  /** Units per metric column (vgplot.tsx:34-41). */
  val metricUnits: Map[String, String] = Map(
    "value_cpuuser" -> "CPU %", "value_gpu" -> "GPU %",
    "value_memused" -> "GB", "value_memused_minus_diskcache" -> "GB",
    "value_nfs" -> "MB/s", "value_block" -> "GB/s")

  /** The 22-column job/metric table (`job_data*` / `s3_fresco`). */
  val jobTable: StructType = StructType(
    Seq("time", "submit_time", "start_time", "end_time")
      .map(StructField(_, TimestampType)) ++
    Seq(StructField("timelimit", DoubleType)) ++
    Seq("nhosts", "ncores").map(StructField(_, LongType)) ++
    Seq("account", "queue", "host", "jid", "unit", "jobname",
      "exitcode", "host_list", "username").map(StructField(_, StringType)) ++
    metricColumns.map(StructField(_, DoubleType)))

  /** ETL output event schema (long/narrow form). */
  val event: StructType = StructType(Seq(
    StructField("Job Id", StringType),
    StructField("Host", StringType),
    StructField("Event", StringType),
    StructField("Value", DoubleType),
    StructField("Units", StringType),
    StructField("Timestamp", TimestampType)))

  // CSV schemas bind POSITIONALLY; column order must match the file
  // layout of FIXTURES.md §1 (ids, [device], timestamp, counters).
  private def raw(ids: Seq[String], counters: Seq[String]): StructType =
    StructType((ids :+ "timestamp") ++: counters map (StructField(_, StringType)))

  /** Raw monitoring CSV schemas (FIXTURES.md §1). */
  val blockCsv: StructType =
    raw(Seq("jobID", "node", "device"), Seq("rd_sectors", "wr_sectors"))
  val cpuCsv: StructType = raw(Seq("jobID", "node", "device"),
    Seq("user", "nice", "system", "idle", "iowait", "irq", "softirq"))
  val memCsv: StructType =
    raw(Seq("jobID", "node"), Seq("MemTotal", "MemFree", "FilePages"))
  val lliteCsv: StructType =
    raw(Seq("jobID", "node"), Seq("read_bytes", "write_bytes"))
}
