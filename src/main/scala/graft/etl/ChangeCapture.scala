package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture derivation between two snapshots of a keyed
  * table: one full-outer join on the key (a single shuffle; at 100 TB
  * both sides bucket/partition on the same key so the join co-locates),
  * then null-pattern classification. The non-key columns travel as one
  * struct per side, compared null-safely — adding columns to the
  * snapshot never changes the plan shape.
  *
  * This is the inverse of the latest-wins upsert (q81): upsert APPLIES
  * a change stream to a base; diff RECOVERS the change stream from two
  * bases — together they round-trip a snapshot history.
  */
object ChangeCapture {

  /** Classify every key across two snapshots. Output:
    * (key, change ∈ insert|delete|update|unchanged, old, new) with
    * `old`/`new` the non-key column structs (NULL on the absent side).
    * Both snapshots must share the schema; `key` must be unique per
    * side (enforce upstream — this is a snapshot, not a log). */
  def diff(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val cols = a.columns.filterNot(_ == key).toSeq
    val av = a.select(col(key).as("_ka"), struct(cols.map(col): _*).as("_av"))
    val bv = b.select(col(key).as("_kb"), struct(cols.map(col): _*).as("_bv"))
    av.join(bv, col("_ka") === col("_kb"), "full_outer")
      .withColumn("change",
        when(col("_ka").isNull, lit("insert"))
          .when(col("_kb").isNull, lit("delete"))
          .when(col("_av") <=> col("_bv"), lit("unchanged"))
          .otherwise(lit("update")))
      .select(coalesce(col("_ka"), col("_kb")).as(key), col("change"),
        col("_av").as("old"), col("_bv").as("new"))
  }
}
