package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category counting, ranking and top-N + "Others" rollup (reference:
  * DatabaseQueries.ts:242-287, 369-399; vgplot.tsx:554-603).
  *
  * Scale notes: the raw-row `groupBy(category).count()` is the only
  * full-data pass (map-side combined). The window/rollup steps run over
  * the aggregated category set — cardinality ≤ distinct categories — so
  * the un-partitioned `Window.orderBy` (single task) is safe: it never
  * sees raw rows. The reference's ROW_NUMBER tie order is
  * nondeterministic; we add the category itself as a tiebreaker so
  * results are stable across engines (SURVEY §7.4.5).
  */
object TopNOps {

  /** A9 — `GROUP BY c ORDER BY count DESC` (DatabaseQueries.ts:252-259). */
  def categoryCounts(df: DataFrame, c: Column): DataFrame =
    df.groupBy(c.as("category"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("category"))

  /** W1 — ROW_NUMBER ranking over category counts
    * (DatabaseQueries.ts:261-267), deterministic tiebreak on category. */
  def rankedCounts(df: DataFrame, c: Column): DataFrame =
    df.groupBy(c.as("category"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(desc("cnt"), asc("category"))))
      .orderBy("rnk")

  /** O4 + O3 — top-N categories, remainder rolled into 'Others', with the
    * reference's "Others last" sort (DatabaseQueries.ts:268-283). */
  def topNWithOthers(df: DataFrame, c: Column, n: Int): DataFrame =
    rankedCounts(df, c)
      .withColumn("category",
        when(col("rnk") <= n, col("category")).otherwise(lit("Others")))
      .groupBy("category")
      .agg(sum("cnt").as("total"))
      .orderBy(
        when(col("category") === "Others", 1).otherwise(0),
        desc("total"), asc("category"))
}
