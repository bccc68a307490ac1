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

  /** S8 — output path templating
    * (`FRESCO_{dataset}_ts_{folder}_v{version}_{timestamp}.parquet`,
    * base_loader.py:76-96). */
  def templatedPath(baseDir: String, dataset: String, folder: String,
                    version: String, timestamp: String): String =
    s"$baseDir/FRESCO_${dataset}_ts_${folder}_v${version}_$timestamp.parquet"

  /** S7 — CSV export sink with RFC-4180 quoting, ISO timestamps, empty
    * string for null (export.ts:10-71). */
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
}
