package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At cluster scale these would be partitioned directories (or catalog
  * tables); a single `spark.read.parquet(dir)` works identically on a
  * directory of thousands of files, so nothing here is local-only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's
    // TimestampType (µs) rejects outright; read nanos as long and
    // truncate to µs (PARQUET_TYPE_ILLEGAL otherwise). All downstream
    // comparisons use second-or-coarser truncations, so the lost
    // sub-µs digits are never observable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
