package graft.planner

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The reference's "query must be time-bounded" contract (B3,
  * lambda_handler.py:290-292 — unbounded queries are rejected before any
  * chunk is fetched) as a Catalyst check rule.
  *
  * This is the one piece of custom Catalyst machinery SURVEY §4 deems
  * worth building: everything else the reference's planner does is free
  * in Spark, but nothing built-in REFUSES a full-table scan. The rule
  * runs after analysis; configuration is session-level:
  *
  *   spark.graft.timeBound.paths  = comma-separated path substrings of
  *                                  fact tables that must be time-bounded
  *   spark.graft.timeBound.column = the time column name (default "ts")
  *
  * A scan of a watched path passes iff some Filter in the plan
  * references that relation's time column or any of its partition
  * columns (year/month/day/hour from the hour-partitioned layout) — the
  * minimal condition under which Catalyst can prune. Injected as an
  * OPTIMIZER rule (validate-only, no transform) rather than a check
  * rule deliberately: check rules fire on the eager analysis of every
  * intermediate DataFrame — i.e. before a caller has had the chance to
  * add the filter — while the optimizer runs once, on execution, over
  * the final plan. Registration:
  *
  *   SparkSession.builder().withExtensions(new TimeBoundExtensions)
  *   // or: spark.sql.extensions=graft.planner.TimeBoundExtensions
  */
class TimeBoundExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(spark => new TimeBoundRule(spark))
}

/** Validate-only optimizer rule wrapping [[TimeBoundCheck]]. */
class TimeBoundRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    TimeBoundCheck(spark)(plan)
    plan
  }
}

case class UnboundedScanException(path: String, column: String)
  extends RuntimeException(
    s"scan of $path must be bounded on '$column' or its time partitions " +
      "(reference contract: lambda_handler.py:290-292); " +
      "add a filter or unset spark.graft.timeBound.paths")

object TimeBoundCheck extends (SparkSession => LogicalPlan => Unit) {
  private val partitionCols = Set("year", "month", "day", "hour")

  override def apply(spark: SparkSession): LogicalPlan => Unit = plan => {
    val watched = spark.conf.get("spark.graft.timeBound.paths", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    if (watched.nonEmpty) {
      val tsCol = spark.conf.get("spark.graft.timeBound.column", "ts")
      // attribute lineage through Project aliases: derived-attr exprId →
      // the exprIds it was computed from (e.g. a rebuilt ts column)
      val aliasSources: Map[Long, Set[Long]] = plan.collect {
        case Project(projectList, _) => projectList.collect {
          case a: Alias => a.exprId.id -> a.child.references.map(_.exprId.id).toSet
        }
      }.flatten.toMap
      def expand(ids: Set[Long]): Set[Long] = {
        val next = ids ++ ids.flatMap(id => aliasSources.getOrElse(id, Set.empty))
        if (next == ids) ids else expand(next)
      }
      // every filter condition's attribute references, traced to sources
      val filteredRefs = expand(
        plan.collect { case Filter(cond, _) => cond.references }
          .foldLeft(Set.empty[Long])((acc, refs) => acc ++ refs.map(_.exprId.id)))
      plan.foreach {
        case lr: LogicalRelation =>
          lr.relation match {
            case hfs: HadoopFsRelation =>
              val paths = hfs.location.rootPaths.map(_.toString)
              val hit = paths.find(p => watched.exists(p.contains))
              hit.foreach { p =>
                val timeAttrs = lr.output.filter(a =>
                  a.name == tsCol || partitionCols.contains(a.name))
                val bounded = timeAttrs.exists(a => filteredRefs.contains(a.exprId.id))
                if (!bounded) throw UnboundedScanException(p, tsCol)
              }
            case _ =>
          }
        case _ =>
      }
    }
  }
}
