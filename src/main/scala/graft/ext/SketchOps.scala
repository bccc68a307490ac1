package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-query-processing sketches built on [[PortableHash]]:
  * Count-Min frequency estimation and HyperLogLog cardinality.
  *
  * Both are DETERMINISTIC given the md5-derived hash family — every
  * bucket index, counter, and register is exact integer arithmetic —
  * so unlike the usual RNG-seeded sketch implementations these are
  * reproducible across engines, runs, and cluster sizes, and a DuckDB
  * oracle can hash-gate the full estimate output (the round-1 xxhash
  * sketches could only get rows-only checks).
  *
  * Scale shape: both sketches are MERGEABLE (counters and registers
  * combine by + / max), which is the whole point at 100 TB — partial
  * sketches build map-side per partition and merge in one tiny reduce;
  * memory is fixed (depth×width counters, m registers) regardless of
  * input size.
  */
object SketchOps {

  /** Count-Min counter table (depth × width) over weighted items:
    * row (d, bucket, cnt). Built from a pre-aggregated (item, n) frame
    * — counters are additive, so aggregating first IS the map-side
    * combine. Bucket index: mix_d(base(item ‖ salt)) mod width. */
  def cmsCounters(itemCounts: DataFrame, item: Column, n: Column,
                  depth: Int, width: Int, salt: String = "cms"): DataFrame = {
    val cs = PortableHash.coeffs(depth)
    val h = PortableHash.base(concat(item.cast("string"), lit(":" + salt)))
    itemCounts
      .select(n.as("_n"), h.as("_h"))
      .select(col("_n"), explode(array(cs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("d"),
          (PortableHash.mix(col("_h"), a, b) % width).as("bucket"))
      }: _*)).as("e"))
      .groupBy(col("e.d").as("d"), col("e.bucket").as("bucket"))
      .agg(sum("_n").as("cnt"))
  }

  /** Point estimates for `queries` (an (item) frame): est = min over
    * depth rows of the addressed counters — the classic CMS upper
    * bound (est ≥ true, overestimate only on collisions). */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, item: Column,
                  depth: Int, width: Int, salt: String = "cms"): DataFrame = {
    val cs = PortableHash.coeffs(depth)
    val h = PortableHash.base(concat(item.cast("string"), lit(":" + salt)))
    queries
      .select(item.as("item"), h.as("_h"))
      .select(col("item"), explode(array(cs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("d"),
          (PortableHash.mix(col("_h"), a, b) % width).as("bucket"))
      }: _*)).as("e"))
      .select(col("item"), col("e.d").as("d"), col("e.bucket").as("bucket"))
      .join(counters, Seq("d", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  /** HyperLogLog registers over an item column: (bucket, mj) with
    * bucket from the low `b` bits of the 60-bit portable hash and
    * mj = max leading-zero rank of the remaining W = 60−b bits.
    * rho needs no log/clz primitive: bin() (both engines render
    * minimal binary strings) gives bit-length, rho = W − bitlen + 1,
    * and the all-zero remainder gets W + 1. */
  def hllRegisters(df: DataFrame, item: Column, b: Int,
                   salt: String = "hll"): DataFrame = {
    val m = 1L << b
    val w = 60 - b
    val h = PortableHash.long60(concat(item.cast("string"), lit(":" + salt)))
    df.select(h.as("_h"))
      .select((col("_h") % m).as("bucket"), expr(s"_h div ${m}L").as("_w"))
      .select(col("bucket"),
        when(col("_w") === 0, lit(w + 1))
          .otherwise(lit(w) - length(bin(col("_w"))) + 1).as("rho"))
      .groupBy("bucket").agg(max("rho").as("mj"))
  }

  /** The raw HLL estimate αm·m²/Σ2^−Mj as ONE row. The harmonic sum
    * runs in fixed point — Σ 2^(54−Mj) over present registers plus
    * 2^54 per absent register — so it is an EXACT long in any
    * accumulation order; the single closing division is IEEE-portable.
    * Raw estimate only (no small-range linear-counting correction,
    * which would need ln): callers pick b so n ≳ 2.5·2^b. */
  /** Merge register sets: max per bucket. Because registers are
    * max-mergeable, merge(build(A), build(B)) ≡ build(A ∪ B) — the
    * property that lets partial sketches build map-side per partition
    * (or per day, per source) and combine in a tiny reduce. q110's
    * oracle builds from the union directly, so the hash-match PROVES
    * the equivalence. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max("mj").as("mj"))

  /** Grouped HLL registers: (group, bucket, mj) — one map-side-combined
    * aggregation; state is m registers PER GROUP, the approximate
    * answer to "distinct per key" that at 100 TB replaces a
    * count(DISTINCT) whose exact form must shuffle every (group, item)
    * pair. */
  def hllRegistersBy(df: DataFrame, group: Column, item: Column, b: Int,
                     salt: String = "hll"): DataFrame = {
    val m = 1L << b
    val w = 60 - b
    val h = PortableHash.long60(concat(item.cast("string"), lit(":" + salt)))
    df.select(group.as("g"), h.as("_h"))
      .select(col("g"), (col("_h") % m).as("bucket"), expr(s"_h div ${m}L").as("_w"))
      .select(col("g"), col("bucket"),
        when(col("_w") === 0, lit(w + 1))
          .otherwise(lit(w) - length(bin(col("_w"))) + 1).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("mj"))
  }

  /** Per-group raw estimates from [[hllRegistersBy]] output — the same
    * exact fixed-point harmonic sum as [[hllEstimate]], one row per
    * group. */
  def hllEstimateBy(registers: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val num = hllNumerator(b)
    registers
      .groupBy("g")
      .agg(sum(expr("shiftleft(1L, cast(54 - mj as int))")).as("_sp"),
        count(lit(1)).as("_present"))
      .select(col("g"),
        (lit(num) / (col("_sp") + (lit(m) - col("_present")) * lit(1L << 54))
          .cast("double")).as("est_raw"),
        (lit(m) - col("_present")).as("v_zero"))
  }

  /** αm·m²·2⁵⁴ — the estimate numerator, exposed so oracle SQL embeds
    * the IDENTICAL double literal (Double.toString round-trips). */
  def hllNumerator(b: Int): Double = {
    val m = 1L << b
    (0.7213 / (1.0 + 1.079 / m)) * m * m * math.pow(2.0, 54)
  }

  def hllEstimate(registers: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val num = hllNumerator(b)
    registers
      .agg(sum(expr("shiftleft(1L, cast(54 - mj as int))")).as("_sp"),
        count(lit(1)).as("_present"))
      .select(
        (lit(num) / (col("_sp") + (lit(m) - col("_present")) * lit(1L << 54))
          .cast("double")).as("est_raw"),
        (lit(m) - col("_present")).as("v_zero"))
  }

  /** Misra–Gries heavy hitters over an item column:
    * `(item, est_n, err_bound, n_total)`, one row per summary counter,
    * `est_n ≤ true ≤ est_n + err_bound` and every item with
    * `true > err_bound` guaranteed present (see
    * [[graft.functions.FreqSketch]]). ONE narrow aggregation — k
    * counters per partition map-side, k-sized partials through the
    * shuffle — where the exact idiom `groupBy(item).count` must
    * exchange the full item domain; that asymmetry is the whole
    * operator at a 100 TB n-gram table. `err_bound == 0` marks the
    * exact regime (domain fit in k everywhere), which is also the
    * deterministic one. */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame =
    df.agg(graft.functions.FreqSketch.mgSummary(item, k).as("mg"))
      .select(col("mg.n_total").as("n_total"),
        col("mg.err_bound").as("err_bound"),
        explode(col("mg.items")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est_n"),
        col("err_bound"), col("n_total"))
}
