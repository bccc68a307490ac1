package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Deterministic Bloom-filter semi-join pruning — an explicit runtime
  * filter for the case Spark's broadcast hash join can't cover: the
  * build side's KEY SET is small enough to summarize in a few KB of
  * bits, but sits at the far end of a join tree (or another engine
  * entirely), so shipping a bitset beats shipping rows.
  *
  * The filter is built DISTRIBUTED (explode k positions per key →
  * map-side-combined bit_or per 64-bit word); only the finished
  * m/64-long bitset is collected — index metadata, not data-path rows
  * (the same driver-collect budget as the IVF centroids). Probe-side
  * `mightContain` is a narrow codegen'd projection: k md5-derived
  * positions per row, no shuffle, no join. False positives are possible
  * (≈(1−e^(−kn/m))^k), false negatives are not — so callers ALWAYS
  * follow with the exact join; the bloom only shrinks what reaches it.
  * The driver query's oracle is the plain semi-join, so the hash-match
  * proves answer preservation.
  *
  * Hashing is [[PortableHash]] (md5-derived universal mixes), so the
  * same filter is reproducible in any engine if the bitset ever needs
  * cross-engine checking.
  */
object BloomPruneOps {

  /** 2^i bit masks (element 64 is the sign bit — still a valid mask). */
  private val pow2: Column =
    typedLit(Array.tabulate(64)(i => 1L << i))

  /** The k bit positions of a key, as columns in [0, mBits). */
  private def positions(key: Column, mBits: Int, k: Int,
                        seed: Long): Seq[Column] =
    PortableHash.coeffs(k, seed).map { case (a, b) =>
      PortableHash.mix(PortableHash.base(key.cast("string")), a, b) % mBits
    }

  /** Build the bitset over the build side's distinct keys. `mBits`
    * must be a multiple of 64. Returns the packed words — a few KB
    * for any practical m. */
  def buildBits(keys: DataFrame, key: Column, mBits: Int, k: Int,
                seed: Long = 42L): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val words = keys
      .select(explode(array(positions(key, mBits, k, seed): _*)).as("pos"))
      .select((col("pos") / 64).cast(LongType).as("w"),
        element_at(pow2, (col("pos") % 64).cast(IntegerType) + 1).as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val out = Array.fill(mBits / 64)(0L)
    words.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Probe predicate: true iff all k positions of `key` are set —
    * a pure projection over the broadcast-literal bitset. */
  def mightContain(bits: Array[Long], key: Column, mBits: Int, k: Int,
                   seed: Long = 42L): Column = {
    val bitsLit = typedLit(bits)
    positions(key, mBits, k, seed).map { p =>
      element_at(bitsLit, (p / 64).cast(IntegerType) + 1)
        .bitwiseAND(element_at(pow2, (p % 64).cast(IntegerType) + 1)) =!= 0L
    }.reduce(_ && _)
  }
}
