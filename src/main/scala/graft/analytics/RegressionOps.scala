package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Grouped ordinary-least-squares fit (y = a + b·x per group) from the
  * five sufficient statistics n, Σx, Σy, Σxy, Σx² — the classic
  * "regression as aggregation" reduction, which is the ONLY shape that
  * works at 100 TB: one map-side-combined aggregation pass, no per-group
  * matrix solve, no data movement beyond the group shuffle.
  *
  * Inputs must already be integer-valued (fixed-point-scale upstream):
  * sums of longs are exactly associative/commutative, so the closed-form
  * numerators/denominators
  *   slope_num = n·Σxy − Σx·Σy        slope_den = n·Σx² − (Σx)²
  *   icept_num = Σy·Σx² − Σx·Σxy      icept_den = slope_den
  * are bit-identical in any partitioning and any engine — that is what
  * lets the fit hash-gate against a SQL oracle. The single final
  * division to doubles is one fixed IEEE op per group.
  *
  * Caller owns overflow headroom: |slope_num| ≲ n·max|x|·Σ|y|. For
  * corpus-scale magnitudes beyond long range, swap the product columns
  * to DECIMAL(38,0) — the aggregation shape is unchanged.
  */
object RegressionOps {

  /** Per-group OLS fit. Output: group cols + n, slope_num/slope_den,
    * icept_num (shared denominator), and `slope`/`intercept` doubles
    * (NULL when x is constant in the group — slope_den = 0). */
  def groupedOls(df: DataFrame, groupCols: Seq[String],
                 x: Column, y: Column): DataFrame = {
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    sums.select(
      (groupCols.map(col) ++ Seq(
        col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("icept_num"))): _*)
      .withColumn("slope",
        when(col("slope_den") =!= 0L,
          col("slope_num").cast(DoubleType) / col("slope_den").cast(DoubleType)))
      .withColumn("intercept",
        when(col("slope_den") =!= 0L,
          col("icept_num").cast(DoubleType) / col("slope_den").cast(DoubleType)))
  }
}
