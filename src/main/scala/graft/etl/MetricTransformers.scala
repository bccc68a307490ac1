package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** ETL metric transformers: raw per-node monitoring CSVs → the 6-column
  * event schema `(Job Id, Host, Event, Value, Units, Timestamp)`.
  *
  * Semantics follow the reference's Polars pipelines
  * (data-pipeline/.../transformers/hpc_transformers.py):
  *  - block  (:27-99):   cumulative sector counters → GB/s per node
  *  - cpu    (:113-225): cumulative jiffy counters → CPU % per node
  *  - memory (:240-330): instantaneous byte gauges → GB (two events/row)
  *  - nfs    (:352-421): cumulative byte counters → MB/s per node
  *
  * Spark-first design: the reference sorts the whole frame then runs
  * Polars `diff().over(group)` (hpc_transformers.py:64-75). Here each
  * per-group difference is a window `lag` partitioned by
  * (jobID, node[, device]) — Spark shuffles once by group key and sorts
  * only within groups, so the computation parallelizes across the
  * cluster with no global sort. Counter groups are small (one
  * node-device-month), so skew is bounded by design.
  */
object MetricTransformers {

  // Unit conversions (hpc_transformers.py:16-18, 231, 342-343).
  val SectorBytes = 512.0
  val BytesPerGb  = 1024.0 * 1024.0 * 1024.0
  val BytesPerMb  = 1024.0 * 1024.0

  /** Minimum seconds between samples for a valid rate
    * (hpc_transformers.py:80-81). */
  val MinTimeDelta = 0.1

  private val eventCols =
    Seq("Job Id", "Host", "Event", "Value", "Units", "Timestamp")

  /** Shared prep (P9/P10/F4/F6): numeric cast-with-null, null-fill ids to
    * 'unknown', jobID normalization (`jobID`/`job` prefix → `JOB`,
    * hpc_transformers.py:53, conte_hpc.yaml:39-42), strptime
    * `MM/dd/yyyy HH:mm:ss` with invalid → null (non-strict, :54), then
    * drop rows whose timestamp failed to parse. */
  private def prep(df: DataFrame, numericCols: Seq[String], hasDevice: Boolean): DataFrame = {
    // try_cast: unparseable → null like Polars strict=False, independent
    // of the session's ANSI setting (Spark 4 defaults ANSI on).
    val numeric = numericCols.foldLeft(df)((d, c) =>
      d.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)")))
    val idCols = if (hasDevice) Seq("jobID", "node", "device") else Seq("jobID", "node")
    val filled = idCols.foldLeft(numeric)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit("unknown"))))
    filled
      .withColumn("jobID", regexp_replace(regexp_replace(col("jobID"), "^jobID", "JOB"), "^job", "JOB"))
      .withColumn("Timestamp",
        try_to_timestamp(col("timestamp"), lit("MM/dd/yyyy HH:mm:ss")))
      .filter(col("Timestamp").isNotNull)
      .filter(numericCols.map(c => col(c).isNotNull).reduce(_ && _))
  }

  private def groupWindow(hasDevice: Boolean) = {
    val keys = if (hasDevice) Seq("jobID", "node", "device") else Seq("jobID", "node")
    Window.partitionBy(keys.map(col): _*).orderBy("Timestamp")
  }

  /** W2 — per-group ordered difference of a cumulative counter; null on
    * each group's first row, like Polars `diff()`. */
  private def delta(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    c - lag(c, 1).over(w)

  private def timeDelta(w: org.apache.spark.sql.expressions.WindowSpec): Column =
    (unix_timestamp(col("Timestamp")) -
      unix_timestamp(lag(col("Timestamp"), 1).over(w))).cast(DoubleType)

  private def toEvents(df: DataFrame, event: String, unit: String, value: Column): DataFrame =
    df.select(
      col("jobID").as("Job Id"),
      col("node").as("Host"),
      lit(event).as("Event"),
      value.cast(DoubleType).as("Value"),
      lit(unit).as("Units"),
      col("Timestamp"))

  /** Block I/O: sector deltas per device → bytes → GB/s, gated (W3: rate 0
    * unless dt ≥ 0.1 s and delta ≥ 0, hpc_transformers.py:78-87), then
    * device→node rollup by sum (A10, :90-92). */
  def block(raw: DataFrame): DataFrame = {
    val w = groupWindow(hasDevice = true)
    val d = prep(raw, Seq("rd_sectors", "wr_sectors"), hasDevice = true)
      .withColumn("sector_delta",
        delta(col("rd_sectors"), w) + delta(col("wr_sectors"), w))
      .withColumn("dt", timeDelta(w))
      .withColumn("rate",
        when(col("dt") >= MinTimeDelta && col("sector_delta") >= 0,
          col("sector_delta") * SectorBytes / BytesPerGb / col("dt"))
          .otherwise(0.0))
    val rolled = d.groupBy("jobID", "node", "Timestamp")
      .agg(sum("rate").as("node_rate"))
    toEvents(rolled, "block", "GB/s", col("node_rate"))
  }

  /** CPU: per-core jiffy deltas (user, nice, total-of-7) summed to node
    * level (3 sums, hpc_transformers.py:197-201), then ratio-of-sums
    * `(user+nice)/total*100` guarded `total > 0` and clipped to [0,100]
    * (A11, :204-210). Rows with any null delta are excluded (:181-190). */
  def cpu(raw: DataFrame): DataFrame = {
    val jiffies = Seq("user", "nice", "system", "idle", "iowait", "irq", "softirq")
    val w = groupWindow(hasDevice = true)
    val total = jiffies.map(col).reduce(_ + _)
    val d = prep(raw, jiffies, hasDevice = true)
      .withColumn("user_delta", delta(col("user"), w))
      .withColumn("nice_delta", delta(col("nice"), w))
      .withColumn("total_delta", delta(total, w))
      .withColumn("dt", timeDelta(w))
      .filter(
        col("user_delta").isNotNull && col("nice_delta").isNotNull &&
        col("total_delta").isNotNull && col("dt") >= MinTimeDelta)
    val rolled = d.groupBy("jobID", "node", "Timestamp")
      .agg(
        sum("user_delta").as("user_sum"),
        sum("nice_delta").as("nice_sum"),
        sum("total_delta").as("total_sum"))
      .withColumn("cpu_pct",
        when(col("total_sum") > 0,
          least(greatest(
            (col("user_sum") + col("nice_sum")) / col("total_sum") * 100.0,
            lit(0.0)), lit(100.0)))
          .otherwise(0.0))
    toEvents(rolled, "cpuuser", "CPU %", col("cpu_pct"))
  }

  /** Memory: instantaneous gauges; sequential, order-dependent clamps
    * (SURVEY §7.4.7, hpc_transformers.py:278-302):
    * MemFree ≤ MemTotal; used = MemTotal − MemFree (≥ 0);
    * FilePages ≤ min(MemTotal, used); minus_diskcache = used − FilePages
    * (≥ 0). Bytes → GB. Emits TWO events per input row (U1, :310-330). */
  def memory(raw: DataFrame): DataFrame = {
    val d = prep(raw, Seq("MemTotal", "MemFree", "FilePages"), hasDevice = false)
      .withColumn("mem_free", least(col("MemFree"), col("MemTotal")))
      .withColumn("used", greatest(col("MemTotal") - col("mem_free"), lit(0.0)))
      .withColumn("file_pages", least(col("FilePages"), least(col("MemTotal"), col("used"))))
      .withColumn("used_minus_cache", greatest(col("used") - col("file_pages"), lit(0.0)))
    val memused = toEvents(d, "memused", "GB", col("used") / BytesPerGb)
    val minusCache =
      toEvents(d, "memused_minus_diskcache", "GB", col("used_minus_cache") / BytesPerGb)
    memused.unionByName(minusCache)
  }

  /** NFS: cumulative byte deltas per node → MB/s. First row per group is
    * DROPPED (time delta null — the one transformer that drops instead of
    * zeroing, hpc_transformers.py:402-414). */
  def nfs(raw: DataFrame): DataFrame = {
    val w = groupWindow(hasDevice = false)
    val d = prep(raw, Seq("read_bytes", "write_bytes"), hasDevice = false)
      .withColumn("byte_delta",
        delta(col("read_bytes"), w) + delta(col("write_bytes"), w))
      .withColumn("dt", timeDelta(w))
      .filter(col("dt").isNotNull)
      .withColumn("rate",
        when(col("dt") >= MinTimeDelta && col("byte_delta") >= 0,
          col("byte_delta") / BytesPerMb / col("dt"))
          .otherwise(0.0))
    toEvents(d, "nfs", "MB/s", col("rate"))
  }
}
