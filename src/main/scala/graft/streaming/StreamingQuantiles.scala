package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-key quantile estimates over a stream: the keyed state is
  * the same deterministic bottom-k-by-portable-hash sample the batch
  * q131 sketch uses — k (hash, id, value) triples per key, REGARDLESS
  * of stream length, the quantile analogue of
  * [[StreamingCardinality]]'s fixed-register HLL state.
  *
  * Because "keep the k hash-smallest rows" is a commutative/associative
  * fold (a KMV sketch), the state after ANY batch partitioning of the
  * stream equals the sample a one-shot batch build computes over the
  * same rows — so the emitted quantiles converge to the batch answer
  * bit-for-bit (parity spec). Rank error is O(1/√k); keys with ≤ k
  * rows are exact.
  */
object StreamingQuantiles extends Serializable {

  /** JVM-side mirror of PortableHash.base (first 15 md5 hex chars →
    * 60-bit long, mod 2³¹−1) — bit-identical to the batch q131 hash. */
  private def baseHash(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % graft.ext.PortableHash.P
  }

  /** `n_seen` counts every row the key has absorbed (the sample's
    * coverage denominator — and the monotone batch ordinal a consumer
    * needs to pick a key's LATEST emission). */
  case class KeyQuantiles(key: String, n_seen: Long, n_sample: Long,
                          p50: Double, p90: Double, p99: Double)

  /** Type-1 (discrete) quantile at fraction `p` of the sample, ordered
    * by (value, id) — the exact ordering the batch q131 query uses. */
  private def typed1(sample: Seq[(Long, Long, Double)], p: Double): Double = {
    val vals = sample.sortBy { case (_, id, v) => (v, id) }
    vals(math.ceil(p * vals.size.toDouble).toInt - 1)._3
  }

  /** `stream` must expose `keyCol` (string-castable), `idCol` (long,
    * unique per row — the sample's determinism key) and `valueCol`
    * (double). Emits (key, n_sample, p50, p90, p99) after every batch
    * that touches the key. */
  def runningQuantiles(stream: DataFrame, keyCol: String, idCol: String,
                       valueCol: String, k: Int = 256,
                       salt: String = "kq"): Dataset[KeyQuantiles] = {
    val spark = StreamConf.ensureStateStore(stream.sparkSession)
    import spark.implicits._
    val rows = stream
      .select(col(keyCol).cast("string").as("k"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]
    def update(key: String, it: Iterator[(String, Long, Double)],
               state: GroupState[(Long, Seq[(Long, Long, Double)])])
        : Iterator[KeyQuantiles] = {
      val (seen0, sample0) = state.getOption.getOrElse((0L, Seq.empty))
      val fresh = it.map { case (_, id, v) =>
        (baseHash(id.toString + ":" + salt), id, v)
      }.toSeq
      // distinct on (hash, id): replayed rows fold in idempotently
      val merged = (sample0 ++ fresh)
        .distinctBy(t => (t._1, t._2))
        .sortBy(t => (t._1, t._2))
        .take(k)
      val seen = seen0 + fresh.size
      state.update((seen, merged))
      Iterator.single(KeyQuantiles(key, seen, merged.size.toLong,
        typed1(merged, 0.5), typed1(merged, 0.9), typed1(merged, 0.99)))
    }
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
