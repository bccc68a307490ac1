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
    // events.parquet (driver-generated) carries INT64 TIMESTAMP(NANOS)
    // which Spark's TimestampType (µs) rejects outright; every session
    // builder sets spark.sql.legacy.parquet.nanosAsLong=true so it
    // lands as a long, truncated to µs here. All downstream
    // comparisons use second-or-coarser truncations, so the lost
    // sub-µs digits are never observable. The conversion is
    // schema-gated, not name-gated: a rewritten events table (e.g.
    // ScaleUp output) already carries TimestampType and round-trips
    // untouched.
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // A rewritten events table (ScaleUp output): Spark 4 writes the
      // µs timestamps with isAdjustedToUTC=false, and the reader's NTZ
      // inference then surfaces TimestampNTZType. Every session builder
      // pins spark.sql.session.timeZone=UTC, so the NTZ wall-clock
      // digits ARE the UTC instant — the cast re-attaches the zone
      // without shifting values (ScaleUpSpec pins the round trip).
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
