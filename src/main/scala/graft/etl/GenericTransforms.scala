package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic (dataset-agnostic) ETL transforms, mirroring the reference's
  * `generic_transformers.py`. All are narrow projections — no shuffle.
  */
object GenericTransforms {

  /** F7 — append a suffix to id columns. The reference uses a Python
    * row-level lambda (generic_transformers.py:43-47); `concat` is the
    * codegen'd equivalent (kills the reference's only row UDF). */
  def appendSuffix(df: DataFrame, columns: Seq[String], suffix: String): DataFrame =
    columns.filter(df.columns.contains).foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c).isNotNull, concat(col(c), lit(suffix)))))

  /** F6 — regex find/replace normalization patterns applied to a column
    * (generic_transformers.py:117-124; conte_hpc.yaml:39-42). */
  def normalizePatterns(df: DataFrame, column: String,
                        patterns: Seq[(String, String)]): DataFrame =
    df.withColumn(column,
      patterns.foldLeft(col(column))((c, p) => regexp_replace(c, p._1, p._2)))

  /** P12 — project to an expected schema in order, adding typed null
    * literals for absent columns (generic_transformers.py:209-243). */
  def standardizeSchema(df: DataFrame, expected: StructType): DataFrame =
    df.select(expected.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  /** Unit-column defaulting: add an empty-string `Units` column when
    * missing (generic_transformers.py:188-206). */
  def ensureUnitColumn(df: DataFrame, name: String = "Units"): DataFrame =
    if (df.columns.contains(name)) df
    else df.withColumn(name, lit(""))

  /** P11 — keep only expected columns, in schema order
    * (generic_transformers.py:60-84). */
  def reorderColumns(df: DataFrame, expected: Seq[String]): DataFrame =
    df.select(expected.filter(df.columns.contains).map(col): _*)

  /** Timestamp normalization with format auto-detection
    * (generic_transformers.py:164): try the configured formats in order,
    * first non-null parse wins; unparseable → null (try_to_timestamp, so
    * the semantics hold under ANSI mode too). */
  def parseTimestamp(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)
}
