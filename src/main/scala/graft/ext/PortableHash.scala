package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable integer hashes for the sketch operators (MinHash,
  * SimHash): the hash is derived from md5 hex, so the EXACT same value
  * is expressible in any SQL engine with `md5()` over strings —
  * DuckDB: `('0x' || substr(md5(s), 1, 15))::BIGINT`. That makes the
  * sketch pipelines oracle-verifiable end to end, where xxhash64
  * signatures could only get rows-only checks.
  *
  * Scale note: md5 is ~2-3× slower per value than xxhash64, but sketch
  * hashing is scan-side CPU (one digest per shingle/token, no shuffle);
  * at 100 TB the shuffles dominate, so the oracle-ability is the better
  * trade for the default. The xxhash64 variants in [[DedupOps]] remain
  * available (`portable = false`) for pure-throughput paths.
  *
  * All mix arithmetic is mod P = 2³¹−1 with coefficients < P, so every
  * intermediate stays below 2⁶² — no overflow in either engine, and
  * safe under Spark's default ANSI mode.
  */
object PortableHash {

  /** Mersenne prime 2³¹−1 — the universal-hash modulus. */
  val P = 2147483647L

  /** First 8 md5 digest bytes as one signed long — every other value
    * here is a bit-slice of it. One codegen'd expression node
    * ([[graft.functions.HashExpressions.Md5Prefix64]]): the
    * `conv(substring(md5(s), ...), 16, 10)` form it replaces paid
    * three string round-trips (hex-encode, substring, parse) per
    * hashed token/shingle — the dominant scan-side cost of the sketch
    * pipelines. Values are BIT-IDENTICAL, so every oracle (which keeps
    * the readable hex-substring SQL) is unchanged. */
  def prefix64(s: Column): Column =
    graft.functions.HashExpressions.md5Prefix64(s)

  /** 60-bit non-negative hash: the first 15 md5 hex chars as an int
    * (= digest bits 63..4). */
  def long60(s: Column): Column = shiftrightunsigned(prefix64(s), 4)

  /** The same 60-bit hash reduced mod P (the MinHash base value). */
  def base(s: Column): Column = long60(s) % P

  /** 32-bit halves of the first 16 md5 hex chars (`half` = 0 or 1) —
    * together a 64-bit pattern, used for SimHash bit extraction. Takes
    * the [[prefix64]] column so the digest is computed ONCE per row. */
  def int32(prefix: Column, half: Int): Column =
    if (half == 0) shiftrightunsigned(prefix, 32)
    else prefix.bitwiseAND(lit(0xffffffffL))

  /** Universal-hash coefficients (aᵢ ∈ [1,P), bᵢ ∈ [0,P)), seeded —
    * deterministic across runs, engines, cluster sizes. */
  def coeffs(n: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((1L + rnd.nextInt((P - 1).toInt).toLong,
                 rnd.nextInt(P.toInt).toLong))
  }

  /** hᵢ = (a·h + b) mod P over an already-reduced base hash column. */
  def mix(h: Column, a: Long, b: Long): Column = (h * a + b) % P

  // ── DuckDB SQL emitters (the oracle side of the same family) ────────

  /** `base` as DuckDB SQL over a string expression. */
  def baseSql(x: String): String =
    s"(('0x' || substr(md5($x), 1, 15))::BIGINT % $P)"

  /** `int32(half)` as DuckDB SQL over a string expression. */
  def int32Sql(x: String, half: Int): String =
    s"(('0x' || substr(md5($x), ${1 + half * 8}, 8))::BIGINT)"

  /** The MinHash signature as a DuckDB list literal: element i =
    * min over the base-hash list `hlVar` of (aᵢ·h + bᵢ) mod P. */
  def sigArraySql(hlVar: String, numHashes: Int, seed: Long = 42L): String =
    coeffs(numHashes, seed)
      .map { case (a, b) =>
        s"list_min(list_transform($hlVar, h -> ((h * ${a}::BIGINT + $b) % $P)))" }
      .mkString("[", ",\n      ", "]")

  /** SimHash-64 per-bit vote sums as DuckDB SQL: 64 aliased `sum(CASE …)`
    * aggregates over per-token 32-bit halves `h1Var`/`h2Var`. */
  def simhashSumsSql(h1Var: String, h2Var: String): String =
    (0 until 64).map { b =>
      val (src, sh) = if (b < 32) (h1Var, b) else (h2Var, b - 32)
      s"sum(CASE WHEN (($src >> $sh) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n      ")

  /** Packs the 64 vote sums into one BIGINT (bit b set iff s_b > 0).
    * Bit 63 adds the Long.MinValue literal — `1::BIGINT << 63` overflows
    * in DuckDB, but adding −2⁶³ sets the sign bit of a two's-complement
    * sum of disjoint lower bits, which is exactly the packed value. */
  def simhashPackSql: String =
    (0 until 64).map { b =>
      val bit = if (b == 63) "(-9223372036854775808)::BIGINT" else s"${1L << b}::BIGINT"
      s"(CASE WHEN s$b > 0 THEN $bit ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
