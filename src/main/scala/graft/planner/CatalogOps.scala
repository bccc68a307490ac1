package graft.planner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog lifecycle probes (reference: DatabaseQueries.ts:32-43,
  * data_analysis.tsx:84-89/277-301, query_builder.tsx:88-91).
  * All thin wrappers over `spark.catalog` — kept as an explicit surface
  * so callers of the reference's helpers have 1:1 replacements.
  */
object CatalogOps {

  /** S12 — table/view existence probe (sqlite_master query). */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** S13 — schema introspection (`SELECT * FROM t LIMIT 0`). */
  def tableSchema(spark: SparkSession, name: String): StructType =
    spark.table(name).schema

  /** S14 — DROP IF EXISTS lifecycle before rebuild. */
  def dropViewIfExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** S2 — append/insert-select accumulation: register `df` as `name`,
    * or union-append into the existing registered view
    * (client.ts:134-149's INSERT INTO ... SELECT). */
  def appendToView(spark: SparkSession, name: String, df: DataFrame): Unit = {
    val combined =
      if (spark.catalog.tableExists(name)) spark.table(name).unionByName(df)
      else df
    combined.createOrReplaceTempView(name)
  }

  /** Table statistics for CBO — parity with the reference's
    * `ANALYZE <table>` + `PRAGMA table_info`
    * (databaseOptimization.ts:102-123). */
  def analyzeTable(spark: SparkSession, name: String, columns: Seq[String] = Nil): Unit = {
    val forCols =
      if (columns.nonEmpty) s" FOR COLUMNS ${columns.mkString(", ")}" else ""
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS$forCols")
  }

  /** B8 — the reference special-cases `SELECT TIME FROM JOB_DATA` with a
    * precomputed timestamps artifact (lambda_handler.py:493-531). Spark
    * form: cache the single-column projection. */
  def cachedTimeColumn(spark: SparkSession, table: String, tsCol: String): DataFrame = {
    val df = spark.table(table).select(tsCol)
    df.cache()
    df
  }
}
