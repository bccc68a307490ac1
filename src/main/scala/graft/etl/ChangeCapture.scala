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

  /** Incremental maintenance of a (group → count, sum) materialized
    * aggregate from a [[diff]] change stream: every change row becomes
    * ±contributions (delete/update retract the old row, insert/update
    * add the new one), the deltas aggregate — a change-stream-sized
    * job — and one outer join merges them into the base. The 100 TB
    * point: the base table is never rescanned; the work is O(changes),
    * and groups whose count drops to zero disappear exactly as a
    * recompute would drop them.
    *
    * `baseAgg` columns: (group, n, sumCol); `changes` is [[diff]]
    * output whose old/new structs carry `groupField` and `valueField`. */
  def maintainSumCount(baseAgg: DataFrame, changes: DataFrame,
                       groupField: String, valueField: String): DataFrame = {
    val Seq(g, n, sm) = baseAgg.columns.toSeq
    val retract = changes.filter(col("change").isin("delete", "update"))
      .select(col(s"old.$groupField").as(g),
        lit(-1L).as("dn"), (-col(s"old.$valueField")).as("ds"))
    val add = changes.filter(col("change").isin("insert", "update"))
      .select(col(s"new.$groupField").as(g),
        lit(1L).as("dn"), col(s"new.$valueField").as("ds"))
    val delta = retract.unionByName(add)
      .groupBy(g).agg(sum("dn").as("dn"), sum("ds").as("ds"))
    baseAgg.join(delta, Seq(g), "full_outer")
      .select(col(g),
        (coalesce(col(n), lit(0L)) + coalesce(col("dn"), lit(0L))).as(n),
        (coalesce(col(sm), lit(0L)) + coalesce(col("ds"), lit(0L))).as(sm))
      .filter(col(n) > 0)
  }
}
