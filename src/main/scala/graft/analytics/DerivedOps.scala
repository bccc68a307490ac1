package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Derived-column projections (reference: schema.ts:319-337,
  * DatabaseQueries.ts:195-237, data_analysis.tsx:245-255).
  * All are narrow (no-shuffle) transformations that stay inside
  * whole-stage codegen.
  */
object DerivedOps {

  /** P6 — duration in seconds between two timestamps
    * (`EXTRACT(EPOCH FROM (end_time - start_time))`, schema.ts:319-325). */
  def durationSeconds(start: Column, end: Column): Column =
    unix_timestamp(end) - unix_timestamp(start)

  /** P7 — per-unit utilization with divide-by-zero → null
    * (`value / NULLIF(divisor, 0)`, schema.ts:330-337). */
  def perUnit(value: Column, divisor: Column): Column =
    value / nullif(divisor.cast(DoubleType), lit(0.0))

  /** P4 — BIGINT→DOUBLE cast projection (DatabaseQueries.ts:195-213). */
  def castDouble(c: Column): Column = c.cast(DoubleType)

  /** P5 — ×1e6 scale-up for tiny-magnitude columns
    * (DatabaseQueries.ts:218-237; trigger vgplot.tsx:92-96). */
  def scaleUp(c: Column, factor: Double = 1e6): Column = c * lit(factor)

  /** P8 — patch missing columns with 0.0 (data_analysis.tsx:245-255;
    * type pinned to DOUBLE per SURVEY §7.4.6). */
  def patchMissingColumns(df: DataFrame, expected: Seq[String]): DataFrame =
    expected.filterNot(df.columns.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(0.0).cast(DoubleType)))

  /** F14 — clip to [lo, hi] (hpc_transformers.py:208-209). */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))
}
