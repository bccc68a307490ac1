package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for shuffle-free co-located joins.
  *
  * At 100 TB, the fact⋈fact joins that can't broadcast are the ones
  * that hurt: every query re-shuffles both sides on the join key.
  * Writing both tables bucketed (and sorted) by that key moves the
  * shuffle to WRITE time, once — subsequent sort-merge joins read
  * co-located buckets with no exchange (verified by plan inspection in
  * BucketSkewSpec). Bucket counts must match across join sides.
  */
object BucketedStore {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "snappy")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans a sort-merge join with ZERO shuffle
    * exchanges. */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
                  key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
