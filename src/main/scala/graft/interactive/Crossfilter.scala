package graft.interactive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crossfilter predicate composition — the engine-side equivalent of the
  * reference's Mosaic selection model (V2/V3/V4/V5,
  * web/src/pages/data_analysis.tsx:621-631, vgplot.tsx:487-535).
  *
  * Each chart owns a predicate; a chart's view of the data applies every
  * OTHER chart's predicate (crossfilter semantics). The composition is a
  * pure `Column` AND-fold, so downstream aggregates stay one declarative
  * plan and Catalyst pushes the combined filter into the scan.
  */
case class Crossfilter(predicates: Map[String, Column]) {

  def withPredicate(chartId: String, p: Column): Crossfilter =
    copy(predicates = predicates + (chartId -> p))

  def clear(chartId: String): Crossfilter =
    copy(predicates = predicates - chartId)

  /** Predicate seen by `chartId`: AND of all other charts' brushes
    * (vgplot.tsx filterBy semantics). */
  def forChart(chartId: String): Column =
    predicates.view.filterKeys(_ != chartId).values
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Apply the crossfilter for a chart to its source data. */
  def apply(df: DataFrame, chartId: String): DataFrame =
    df.filter(forChart(chartId))
}

object Crossfilter {
  def empty: Crossfilter = Crossfilter(Map.empty)

  /** V5 — distinct-value menu backing query (vgmenu.tsx:41-47). */
  def distinctMenu(df: DataFrame, column: String): DataFrame =
    df.select(col(column)).distinct().orderBy(col(column))

  /** V2 — interval brush → BETWEEN predicate (histogram.tsx:212-218). */
  def intervalBrush(c: Column, lo: Any, hi: Any): Column = c.between(lo, hi)
}
