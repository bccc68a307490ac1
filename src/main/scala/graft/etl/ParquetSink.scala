package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet sinks (reference: parquet_loader.py S5/S6, lambda_handler's
  * hour-partitioned chunk layout, base_loader path templating S8).
  *
  * Scale notes: the reference hand-slices frames into ≤2 GB chunks from a
  * sampled bytes/row estimate (parquet_loader.py:64-136). Spark's
  * `maxRecordsPerFile` + distributed write achieves the same bound with
  * no sampling loop and no single-writer bottleneck. The hour-partitioned
  * layout (`year=/month=/day=/hour=`) replaces the reference's
  * `chunks/YYYY/MM/DD/HH.parquet` + JSON manifest: Spark's partition
  * discovery and Hive-style pruning subsume the manifest entirely
  * (SURVEY §4 row 1).
  */
object ParquetSink {

  /** Refuse to write an empty frame (parquet_loader.py:31-33). */
  case class EmptyWriteException(path: String)
    extends RuntimeException(s"refusing to write empty dataset to $path")

  /** S5 — single-directory snappy write. */
  def write(df: DataFrame, path: String,
            maxRecordsPerFile: Long = 500000): Unit = {
    if (df.isEmpty) throw EmptyWriteException(path)
    df.write
      .mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Hour-partitioned layout: adds year/month/day/hour from `tsCol` and
    * writes `partitionBy` so time-bounded scans prune at the directory
    * level (replaces lambda_handler.py:236-245 + manifest). */
  def writeHourPartitioned(df: DataFrame, tsCol: String, path: String): Unit = {
    if (df.isEmpty) throw EmptyWriteException(path)
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))
      .write
      .mode("overwrite")
      .partitionBy("year", "month", "day", "hour")
      .option("compression", "snappy")
      .parquet(path)
  }

  /** Z-order clustered write (Delta/Iceberg `OPTIMIZE ZORDER` shape):
    * range-partition by the Morton address of (colA, colB) and sort each
    * file by it, so per-file min/max stats stay narrow on BOTH columns
    * and box predicates prune files. `numFiles` sizes the layout (at
    * scale: total bytes / target file size). The dimension ranges are
    * computed in one tiny agg (4 longs to the driver — layout metadata,
    * not data); the write itself is one range exchange + per-partition
    * sort, no global sort. The z column is dropped before writing — the
    * layout is an ORDER, not a schema change. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    numFiles: Int, path: String): Unit = {
    if (df.isEmpty) throw EmptyWriteException(path)
    val r = df.agg(min(colA), max(colA), min(colB), max(colB)).head()
    val z = graft.functions.ZOrder.zAddress(
      col(colA), lit(r.getLong(0)), lit(r.getLong(1)),
      col(colB), lit(r.getLong(2)), lit(r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .option("compression", "snappy")
      .parquet(path)
  }

  /** S8 — output path templating
    * (`FRESCO_{dataset}_ts_{folder}_v{version}_{timestamp}.parquet`,
    * base_loader.py:76-96). */
  def templatedPath(baseDir: String, dataset: String, folder: String,
                    version: String, timestamp: String): String =
    s"$baseDir/FRESCO_${dataset}_ts_${folder}_v${version}_$timestamp.parquet"

  /** S7 — CSV export sink with RFC-4180 quoting, ISO timestamps, empty
    * string for null (export.ts:10-71). This is the SAFE superset of
    * the reference's format (embedded quotes/newlines are escaped
    * correctly); `exportCsvLiteral` reproduces the reference
    * byte-for-byte, quirks included. */
  def exportCsv(df: DataFrame, path: String): Unit = {
    val tsCols = df.schema.fields.filter(_.dataType.typeName == "timestamp").map(_.name)
    val iso = tsCols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_format(col(c), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")))
    iso.na.fill("").write
      .mode("overwrite")
      .option("header", "true")
      .option("emptyValue", "")
      .csv(path)
  }

  /** Sharded JSONL export — the reverse of
    * [[RawReaders.jsonlQuarantined]]: hand a cleaned corpus to trainer
    * tooling in the format it reads. `maxRecordsPerFile` bounds shard
    * size (the S6 chunked-write contract applied to JSONL — trainers
    * want many same-sized shards to parallelize over, not one giant
    * file); embedded newlines stay escaped inside the JSON string, so
    * the export round-trips losslessly through the quarantining reader
    * (spec-pinned). `gzip` trades CPU for the ~5× text shrink —
    * fine for trainers, which stream shards sequentially and never
    * need splittable compression. */
  def exportJsonl(df: DataFrame, path: String,
                  maxRecordsPerFile: Long = 500000,
                  gzip: Boolean = false): Unit = {
    if (df.isEmpty) throw EmptyWriteException(path)
    val w = df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** S7 (literal fidelity) — byte-level reproduction of the reference's
    * hand-rolled CSV writer (export.ts:36-52), quirks preserved:
    *  - STRING values are wrapped in plain double quotes ONLY when they
    *    contain a comma; embedded quotes are NOT escaped (the
    *    reference's own bug — kept for diff parity);
    *  - timestamps render as JS `Date.toISOString()`:
    *    `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'` in UTC;
    *  - null → empty string, everything else via default rendering.
    * Output is a single part file (the reference builds the file in
    * browser memory; an export is interactive-sized by contract —
    * use `exportCsv` for bulk extracts). */
  def exportCsvLiteral(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType.typeName match {
        case "timestamp" =>
          coalesce(date_format(to_utc_timestamp(c,
            df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), lit(""))
        case "string" =>
          coalesce(when(c.contains(","), concat(lit("\""), c, lit("\"")))
            .otherwise(c), lit(""))
        case _ => coalesce(c.cast("string"), lit(""))
      }
    }
    val header = df.schema.fieldNames.mkString(",")
    df.select(concat_ws(",", cols: _*).as("line"))
      .coalesce(1)
      .mapPartitions(it => Iterator(header) ++ it.map(_.getString(0)))(
        org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(path)
  }
}
