package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew mitigation by key salting.
  *
  * First line of defense is AQE's skew-join splitting (enabled by
  * default); salting is the explicit fallback when a single join/agg
  * key dominates so heavily that one reducer would own it. The hot
  * fact key is spread across `salt` sub-keys; the dim side is
  * replicated `salt`× so every sub-key still finds its match. Results
  * are identical to the unsalted join (asserted in BucketSkewSpec);
  * cost is dim-side replication — use only when the dim side is small
  * relative to the hot key's row count.
  */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /** Equi-join `fact ⋈ dim` on `key` with the fact side salted into
    * `salt` sub-partitions per key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val saltedFact = fact.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val saltedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0L), lit((salt - 1).toLong))))
    saltedFact.join(saltedDim, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Salted two-stage aggregation: per-(key, salt) partial sums, then
    * per-key combine. For Spark's hash aggregates this is usually
    * redundant (map-side partial aggregation already spreads hot keys);
    * provided for HLL-style buffers or non-combinable first stages. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salt: Int): DataFrame =
    df.withColumn(SaltCol,
        pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"sum_$valueCol"))
}
