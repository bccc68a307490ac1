package graft

import org.apache.spark.sql.SparkSessionExtensions

/** One-stop session extensions for the engine: the time-bound scan
  * contract ([[graft.planner.TimeBoundExtensions]]) plus the custom
  * function surface ([[graft.functions.GraftFunctions]]), so
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * gives a pure-SQL user the whole library: `vec_dot`,
  * `top_k_by_score`, `mat_sign_bucket`, `md5_prefix64`,
  * `interleave_bits`, … resolve to the same Catalyst nodes the
  * DataFrame API builds, and unbounded scans of watched fact paths
  * are refused per the reference's query contract. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    new graft.planner.TimeBoundExtensions()(e)
    graft.functions.GraftFunctions.all.foreach(e.injectFunction)
  }
}
