package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram binning (reference: databaseOptimization.ts:184-270 "smart
  * histogram" and DatabaseQueries.ts:292-354 generate_series histogram).
  *
  * Both variants are implemented as pure column arithmetic + hash
  * aggregation — O(n) with a shuffle bounded by `bins`, instead of the
  * reference's O(n·bins) range theta-join (SURVEY §2.3 J2 explicitly
  * blesses this rewrite). The 1-row min/max frame is broadcast so the
  * plan has no driver-side collect.
  */
object HistogramOps {

  /** A7 — floor-bucket histogram with width-0 guard and max clamped into
    * the last bin (databaseOptimization.ts:244-249). Returns one row per
    * non-empty bin: bin_index, cnt, avg_value, bin_start, bin_end. */
  def smartHistogram(df: DataFrame, v: Column, bins: Int): DataFrame = {
    val stats = df.filter(v.isNotNull).agg(min(v).as("mn"), max(v).as("mx"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(stats))
      .withColumn("bw", (col("mx") - col("mn")) / lit(bins.toDouble))
      .withColumn("bin_index",
        when(col("bw") === 0, lit(0L))
          .otherwise(least(lit(bins - 1L), floor((v - col("mn")) / col("bw")))))
      .groupBy("bin_index")
      .agg(
        count(lit(1)).as("cnt"),
        avg(v).as("avg_value"),
        min(col("mn") + col("bin_index") * col("bw")).as("bin_start"),
        min(col("mn") + (col("bin_index") + 1) * col("bw")).as("bin_end"))
      .orderBy("bin_index")
  }

  /** A8 — generate_series-histogram semantics (DatabaseQueries.ts:292-354)
    * including its two quirks: rows equal to the max fall outside every
    * bin (strict `< bin_end` on the last bin), and the last bin is always
    * present even when empty (the `OR bin_index = bins-1` filter at
    * DatabaseQueries.ts:347). Empty interior bins are dropped, exactly as
    * the reference's `WHERE t.c IS NOT NULL` does.
    */
  def seriesHistogram(df: DataFrame, v: Column, bins: Int): DataFrame = {
    val spark = df.sparkSession
    val stats = df.filter(v.isNotNull).agg(min(v).as("mn"), max(v).as("mx"))
    val counts = df.filter(v.isNotNull)
      .crossJoin(broadcast(stats))
      .filter(v >= col("mn") && v < col("mx"))
      .withColumn("bin_index",
        floor((v - col("mn")) / ((col("mx") - col("mn")) / lit(bins.toDouble))))
      .groupBy("bin_index")
      .agg(count(lit(1)).as("cnt"))
    // Guarantee the last bin survives even when empty (reference quirk).
    val lastBin = spark.range(bins - 1, bins).toDF("bin_index")
      .join(counts, Seq("bin_index"), "left")
      .na.fill(0L, Seq("cnt"))
    counts.filter(col("bin_index") =!= (bins - 1))
      .unionByName(lastBin)
      .orderBy("bin_index")
  }
}
