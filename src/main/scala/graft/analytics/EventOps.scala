package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-stream operators over a (key, time, value) shaped table:
  * gap-based sessionization, as-of (point-in-time) join, and
  * interval-overlap join. These are the classic operators a telemetry /
  * clickstream engine needs that have no single built-in Spark
  * equivalent; each is composed from shuffle-minimal primitives rather
  * than a naive O(n^2) formulation.
  *
  * Scale notes (the 100 TB shapes):
  *  - sessionize: ONE shuffle on the key; the session aggregation reuses
  *    the window's hash partitioning (grouping keys are a superset of
  *    the partitioning key, so EnsureRequirements adds no exchange).
  *  - asOfJoin: union + ordered window, ONE shuffle on the key — never
  *    a per-row range scan of the right side. The right side is expected
  *    pre-deduplicated to one row per (key, time).
  *  - overlapCounts: bucket-decomposed self-join — candidate pairs are
  *    bounded by co-bucket occupancy, not |intervals|^2, and each pair
  *    is emitted exactly once (first-shared-bucket trick) so no
  *    distinct-dedup shuffle is needed.
  */
object EventOps {

  /** Assign gap-based session sequence numbers per key.
    *
    * A new session starts when the gap from the previous event STRICTLY
    * exceeds `gapSec` — an event exactly `gapSec` later still extends
    * the session. This is the same boundary Spark's built-in
    * `session_window` uses (verified by StreamingSessionsSpec's parity
    * test), and integer-second timestamps keep it exact and
    * engine-portable. Adds `session_seq` (1-based per key).
    *
    * One shuffle: both window functions share the (key, order) frame.
    */
  def sessionize(df: DataFrame, key: Column, tss: Column, tie: Column,
                 gapSec: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tss, tie)
    df.withColumn("_prev_tss", lag(tss, 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_tss").isNull || tss - col("_prev_tss") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(w))
      .drop("_prev_tss", "_new_session")
  }

  /** Per-session interval summary: start/end/count/sum over the value.
    * The groupBy keys include the sessionize partition key, so the
    * aggregation reuses the window's partitioning (no second exchange).
    */
  def sessionIntervals(df: DataFrame, key: Column, tss: Column, tie: Column,
                       value: Column, gapSec: Long): DataFrame =
    sessionize(df, key, tss, tie, gapSec)
      .groupBy(key, col("session_seq"))
      .agg(min(tss).as("s_start"), max(tss).as("s_end"),
        count(lit(1)).as("n_events"), sum(value).as("sum_value"))

  /** As-of join: for each left row, the `rightValue` of the latest right
    * row with the same key and time <= the left row's time (inclusive).
    *
    * Implemented as union + last(ignoreNulls) over an ordered per-key
    * window — one shuffle on the key, no range-join row amplification.
    * At equal times the right row sorts first (tag 0 < 1), giving the
    * inclusive <= semantics of a SQL ASOF JOIN; equal-time right rows
    * order by value so "last" is deterministic (the max). The attached
    * column is named `asof_value`; left rows with no prior right row
    * get NULL.
    *
    * The right side should carry exactly (key, time, value) — callers
    * dedup to one row per (key, time) first if the source can repeat.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tss: String,
               rightValue: String): DataFrame = {
    val rvType = right.schema(rightValue).dataType
    val taggedLeft = left
      .withColumn("_tag", lit(1))
      .withColumn("_rv", lit(null).cast(rvType))
    val rightAsLeft = left.columns.toSeq.map {
      case c if c == key => col(key)
      case c if c == tss => col(tss)
      case c             => lit(null).cast(left.schema(c).dataType).as(c)
    }
    val taggedRight = right.select(
      rightAsLeft :+ lit(0).as("_tag") :+ col(rightValue).as("_rv"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tss), col("_tag"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("asof_value", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_rv")
  }

  /** Rolling z-score anomaly signal: each event scored against the
    * trailing window of the SAME key's previous `lookback` values
    * (current row excluded — the baseline is "what came before").
    *
    * The window sums run over fixed-point longs (`value * scale`
    * rounded), so sum and sum-of-squares are exact integers in any
    * partition/accumulation order; mean/variance then derive in double
    * with one explicitly-ordered formula — the same IEEE ops an oracle
    * SQL engine runs, making the score engine-portable (a plain
    * double-window stddev is summation-order-dependent and cannot be
    * hash-gated). Rows with fewer than `minPrev` prior events get NULL.
    *
    * One shuffle on the key; per-row state is the bounded lookback
    * frame, so the plan scales with events, not history.
    */
  def rollingZScore(df: DataFrame, key: Column, tss: Column, tie: Column,
                    value: Column, lookback: Int, minPrev: Int,
                    scale: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tss, tie)
      .rowsBetween(-lookback, -1)
    val v = floor(value * scale + 0.5).cast(LongType)
    val n = count(v).over(w)
    val s = sum(v).over(w)
    val s2 = sum(v * v).over(w)
    // exact integer sums -> one fixed double formula, identical in any
    // engine: mean = s/n, var = (s2 - s*s/n) / (n - 1)
    val nd = n.cast("double")
    val mean = s.cast("double") / nd
    val variance = (s2.cast("double") - s.cast("double") * s.cast("double") / nd) /
      (nd - lit(1.0))
    df.withColumn("_n", n)
      .withColumn("zscore",
        when(col("_n") >= minPrev && variance > 0,
          (v.cast("double") - mean) / sqrt(variance)))
      .drop("_n")
  }

  /** Sweep-line concurrency profile: how many intervals are open after
    * each boundary event, per group. Intervals must be self-contained in
    * their group (e.g. daily sessions swept per day) so each group's
    * sweep is independent — that is what keeps the running sum a
    * group-partitioned window instead of a global single-partition sort.
    *
    * End-EXCLUSIVE: an interval contributes +1 at `s_start` and -1 at
    * `s_end`, so a zero-length interval is never counted as open.
    * Deltas are aggregated to (group, ts) grain first (map-side
    * combinable, one shuffle), which also makes the sweep key unique —
    * the running sum is then order-deterministic in any engine.
    *
    * Output: group cols + `ts` (boundary) + `delta` + `open` (count of
    * open intervals in [ts, next boundary)).
    */
  def concurrencyProfile(intervals: DataFrame,
                         groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val deltas = intervals.select(
      gc :+ explode(array(
        struct(col("s_start").as("ts"), lit(1L).as("d")),
        struct(col("s_end").as("ts"), lit(-1L).as("d")))).as("_e"): _*)
      .select(gc :+ col("_e.ts").as("ts") :+ col("_e.d").as("d"): _*)
    val perTs = deltas.groupBy((groupCols :+ "ts").map(col): _*)
      .agg(sum(col("d")).as("delta"))
    // grouping keys ⊇ window partition key → the window reuses the
    // aggregation's hash partitioning (no second exchange)
    val w = Window.partitionBy(gc: _*).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTs.withColumn("open", sum(col("delta")).over(w))
  }

  /** For each interval, how many OTHER intervals overlap it
    * (`a.start <= b.end && b.start <= a.end`, ids differing).
    *
    * Scale path: each interval explodes into the `bucketSec` buckets it
    * spans, candidates join per bucket, and a pair is evaluated only in
    * the FIRST bucket the two intervals share — every true pair counted
    * exactly once with no distinct. Bucket size trades explosion factor
    * (span/bucketSec rows per interval) against per-bucket candidate
    * density; callers pick it near the typical interval span.
    *
    * Input: (id cols..., s_start, s_end). Output: input keys + n_overlap
    * (0 for intervals overlapping nothing).
    */
  def overlapCounts(intervalsIn: DataFrame, idCols: Seq[String],
                    bucketSec: Long): DataFrame = {
    // this operator references its input three times (both join sides
    // and the zero-count join-back) — materialize once or the whole
    // upstream pipeline (e.g. sessionization) re-executes per branch
    val intervals = intervalsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketed = intervals.withColumn("_b",
      explode(sequence(
        floor(col("s_start") / bucketSec).cast(LongType),
        floor(col("s_end") / bucketSec).cast(LongType))))
    val a = idCols.foldLeft(bucketed) { (d, c) => d.withColumnRenamed(c, s"a_$c") }
      .withColumnRenamed("s_start", "a_start").withColumnRenamed("s_end", "a_end")
    val b = idCols.foldLeft(bucketed) { (d, c) => d.withColumnRenamed(c, s"b_$c") }
      .withColumnRenamed("s_start", "b_start").withColumnRenamed("s_end", "b_end")
    val differentId = idCols.map(c => col(s"a_$c") =!= col(s"b_$c"))
      .reduce(_ || _)
    val pairs = a.join(b,
      a("_b") === b("_b") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end") &&
        // first shared bucket: count each overlapping pair exactly once
        a("_b") === greatest(
          floor(col("a_start") / bucketSec).cast(LongType),
          floor(col("b_start") / bucketSec).cast(LongType)) &&
        differentId)
    val counts = pairs.groupBy(idCols.map(c => col(s"a_$c").as(c)): _*)
      .agg(count(lit(1)).as("n_overlap"))
    intervals.select(idCols.map(col): _*)
      .join(counts, idCols, "left")
      .na.fill(0L, Seq("n_overlap"))
  }
}
