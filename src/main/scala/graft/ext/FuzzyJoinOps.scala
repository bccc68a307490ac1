package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string join (entity resolution): pairs within a
  * levenshtein edit-distance threshold, found by q-gram blocking
  * instead of the O(|L|·|R|) verify-everything join.
  *
  * Blocking completeness argument: one edit operation destroys at most
  * `q` of a string's distinct q-gram TYPES, so two strings within `k`
  * edits share at least `max(|G(a)|, |G(b)|) - k·q` distinct grams
  * (and their lengths differ by at most `k`). Candidates failing either
  * bound cannot be true matches and are pruned BEFORE the edit-distance
  * verify — the expensive O(len²) levenshtein only runs on survivors.
  * The driver query's oracle is the naive quadratic join, so the
  * hash-match proves the blocked plan finds exactly the same pairs.
  *
  * Strings shorter than `q` have no grams and are exempt from the
  * gram bound (length-block only) — callers with many ultra-short
  * strings should lower `q`.
  *
  * Scale shape: gram explode is a narrow projection; the gram join
  * shuffles (gram, id) pairs — bounded by total gram occurrences, not
  * |L|·|R|; the shared-count aggregation is map-side combined; verify
  * is a projection over surviving candidates.
  */
object FuzzyJoinOps {

  /** Distinct q-grams of column `col` (empty array when len < q);
    * built via expr because the lambda indexes into the string. */
  private def qgramsExpr(col: String, q: Int): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(length($col) - ${q - 1}, 0)), i -> substring($col, i, $q)))")

  /** The PRUNED candidate pairs — shared-gram pairs surviving the
    * length bound and the distinct-gram-count bound, BEFORE the
    * levenshtein verify: (l_id, l_s, r_id, r_s, shared). Exposed so
    * blocking-quality evaluations (q156) can measure the reduction
    * ratio of exactly the pair set the verify stage pays for. */
  def candidatePairs(left: DataFrame, right: DataFrame,
                     maxDist: Int, q: Int): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("s").as("l_s"),
      qgramsExpr("s", q).as("l_g"))
      .withColumn("l_gn", size(col("l_g")))
    val r = right.select(col("id").as("r_id"), col("s").as("r_s"),
      qgramsExpr("s", q).as("r_g"))
      .withColumn("r_gn", size(col("r_g")))
    val lg = l.select(col("l_id"), explode(col("l_g")).as("g"))
    val rg = r.select(col("r_id"), explode(col("r_g")).as("g"))
    lg.join(rg, "g")
      .groupBy("l_id", "r_id").agg(count(lit(1)).as("shared"))
      .join(l.select("l_id", "l_s", "l_gn"), "l_id")
      .join(r.select("r_id", "r_s", "r_gn"), "r_id")
      .filter(abs(length(col("l_s")) - length(col("r_s"))) <= maxDist)
      .filter(col("shared") >= greatest(col("l_gn"), col("r_gn")) - maxDist * q)
      .select(col("l_id"), col("l_s"), col("r_id"), col("r_s"), col("shared"))
  }

  /** Pairs (leftId, rightId, dist) with `levenshtein <= maxDist`. */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
                       maxDist: Int, q: Int): DataFrame =
    candidatePairs(left, right, maxDist, q)
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist").cast("long").as("dist"))
}
