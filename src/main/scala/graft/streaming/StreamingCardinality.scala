package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running approximate distinct-per-key over a stream: HyperLogLog
  * registers held in keyed state. State per key is EXACTLY m bytes —
  * independent of how many items the key has seen — which is the whole
  * reason to sketch in a stream: exact streaming distinct state grows
  * with the universe, registers never do.
  *
  * The register update uses the SAME md5-derived hash as the batch
  * [[graft.ext.SketchOps]] (verified by the parity spec), so a stream
  * processed in any batch partitioning converges to the identical
  * registers — and therefore the identical estimate — as a one-shot
  * batch build. That parity is the streaming analogue of q110's
  * merge ≡ rebuild proof.
  */
object StreamingCardinality {

  /** JVM-side mirror of PortableHash.long60 (first 15 md5 hex chars →
    * 60-bit long). MessageDigest md5 is the same digest Spark's md5()
    * computes, so values are bit-identical to the batch pipeline. */
  private def long60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  case class KeyEstimate(key: String, est: Double, present: Int)

  /** `stream` must expose string columns `keyCol` and `itemCol`.
    * Emits (key, est, present) after every batch that touches the key. */
  def runningDistinct(stream: DataFrame, keyCol: String, itemCol: String,
                      b: Int, salt: String = "hll"): Dataset[KeyEstimate] = {
    val spark = StreamConf.ensureStateStore(stream.sparkSession)
    import spark.implicits._
    val m = 1 << b
    val w = 60 - b
    val num = graft.ext.SketchOps.hllNumerator(b)
    val pairs = stream
      .select(col(keyCol).cast("string").as("k"),
        col(itemCol).cast("string").as("item"))
      .as[(String, String)]
    def update(key: String, rows: Iterator[(String, String)],
               state: GroupState[Array[Byte]]): Iterator[KeyEstimate] = {
      val reg = state.getOption.getOrElse(new Array[Byte](m))
      rows.foreach { case (_, item) =>
        val h = long60(item + ":" + salt)
        val bucket = (h % m).toInt
        val rem = h / m
        val rho = if (rem == 0L) w + 1
          else w - (63 - java.lang.Long.numberOfLeadingZeros(rem))
        if (rho > reg(bucket)) reg(bucket) = rho.toByte
      }
      state.update(reg)
      var sp = 0L
      var present = 0
      reg.foreach { mj =>
        if (mj > 0) { present += 1; sp += 1L << (54 - mj) }
      }
      val est = num / (sp + (m - present).toLong * (1L << 54)).toDouble
      Iterator.single(KeyEstimate(key, est, present))
    }
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
