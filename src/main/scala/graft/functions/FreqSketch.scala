package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.{HashMap => JHashMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: at most `k` (item, count)
  * counters, one pass, mergeable — the bounded-state complement to the
  * [[graft.ext.SketchOps]] sketches. Count-Min answers "how often is
  * THIS item?" but needs the query set up front; exact top-N
  * (`groupBy(item).count`) shuffles the full key space. This summary
  * DISCOVERS the heavy items in one narrow pass with `k` counters per
  * partition and a k-sized partial through the shuffle — the shape
  * that matters when the item domain is corpus-n-gram-sized at 100 TB.
  *
  * Guarantees (the classic MG contract, preserved through merges):
  *   - `est ≤ true` for every reported item (counts only ever come
  *     from real arrivals; decrements only subtract);
  *   - `true ≤ est + err` where `err` is the summary's decrement
  *     total, REPORTED alongside the items (absent item ⟹ `true ≤
  *     err`, so every item with `true > err` is present);
  *   - a summary that never decremented (`err == 0`, i.e. the domain
  *     fit in `k` counters in every partial and every merge) is EXACT
  *     — that regime is deterministic regardless of partitioning and
  *     merge order, which is what lets a DuckDB oracle hash-gate the
  *     full pipeline (the approximate regime is order-dependent like
  *     any MG and is pinned by property specs instead).
  *
  * The decrement-all step is O(1) amortized via a floor offset plus a
  * value-bucket index: stored counts are absolute, live value =
  * stored − floor, and a full-map miss bumps the floor and evicts
  * EXACTLY the newly-dead counters (the `stored == floor` bucket) —
  * the classic stream-summary structure, preserving true MG semantics
  * (each bump destroys one unit from all k live counters, so
  * `err ≤ N/(k+1)`). Merge follows Agarwal et al. "Mergeable
  * Summaries": sum live values, subtract the (k+1)-st largest, drop
  * non-positive.
  */
final class MGSummary(val k: Int) {
  // keyed on UTF8String, NOT String: the aggregate's hot path receives
  // a TRANSIENT UTF8String per input row (backed by row memory Spark
  // reuses), and UTF8String's value-based equals/hashCode let the
  // tracked-item lookup run ZERO-COPY — the key is cloned only when it
  // is actually inserted, so the per-row String decode (one allocation
  // + copy per input row) and the eval/serialize re-encode are gone.
  // The remaining per-row cost is the map/bucket maintenance itself,
  // which is the algorithm, not overhead.
  /** Counter cell: carries the OWNED key so the hot hit path never
    * stores the caller's transient key anywhere, and bumps mutate in
    * place (no boxing, no map put). */
  private final class Cnt(val key: UTF8String, var stored: Long)

  private val m = new JHashMap[UTF8String, Cnt](16)
  private val buckets = new JHashMap[java.lang.Long, java.util.HashSet[UTF8String]]()
  private[functions] var total = 0L   // items observed (weight)
  private[functions] var floor = 0L   // cumulative decrement = error bound

  private def bucketAdd(v: Long, item: UTF8String): Unit = {
    var s = buckets.get(v)
    if (s == null) { s = new java.util.HashSet[UTF8String](4); buckets.put(v, s) }
    s.add(item)
  }

  private def bucketRemove(v: Long, item: UTF8String): Unit = {
    val s = buckets.get(v)
    if (s != null) { s.remove(item); if (s.isEmpty) buckets.remove(v) }
  }

  /** `item` must be OWNED by this summary (cloned/fresh). */
  private[functions] def put(item: UTF8String, stored: Long): Unit = {
    m.put(item, new Cnt(item, stored))
    bucketAdd(stored, item)
  }

  def add(item: String): Unit = addUtf8(UTF8String.fromString(item))

  /** Hot-path add: `item` may be TRANSIENT (row-backed memory Spark
    * reuses); the tracked-item lookup is zero-copy via UTF8String's
    * value equality, and the key is cloned ONLY on the insert arm. */
  def addUtf8(item: UTF8String): Unit = {
    total += 1
    val c = m.get(item)
    if (c != null) {
      bucketRemove(c.stored, c.key)
      c.stored += 1L
      bucketAdd(c.stored, c.key)
    } else if (m.size < k) {
      val owned = item.clone()
      put(owned, floor + 1L)
    } else {
      // decrement-all: live values (stored − floor) all drop by one;
      // the stored == floor bucket is exactly the counters that hit 0
      floor += 1
      val dead = buckets.remove(floor)
      if (dead != null) {
        val it = dead.iterator()
        while (it.hasNext) m.remove(it.next())
      }
    }
  }

  /** Tracked-counter count — spec hook. */
  private[functions] def trackedSize: Int = m.size

  /** Live (item, est) pairs, est > 0. */
  private[functions] def live: Iterator[(UTF8String, Long)] =
    m.values().iterator().asScala.collect {
      case c if c.stored > floor => (c.key, c.stored - floor)
    }

  def mergeFrom(o: MGSummary): Unit = {
    val combined = new JHashMap[UTF8String, java.lang.Long](
      trackedSize + o.trackedSize)
    live.foreach { case (it, v) => combined.put(it, v) }
    o.live.foreach { case (it, v) =>
      val prev = combined.get(it)
      combined.put(it, if (prev == null) v else prev.longValue() + v)
    }
    total += o.total
    floor += o.floor
    var cut = 0L
    if (combined.size > k) {
      // (k+1)-st largest live value becomes the merge decrement
      val vs = new Array[Long](combined.size)
      var i = 0
      val vi = combined.values().iterator()
      while (vi.hasNext) { vs(i) = vi.next().longValue(); i += 1 }
      java.util.Arrays.sort(vs)
      cut = vs(vs.length - (k + 1))
      floor += cut
    }
    m.clear()
    buckets.clear()
    val ei = combined.entrySet().iterator()
    while (ei.hasNext) {
      val e = ei.next()
      val v = e.getValue.longValue()
      if (v > cut) put(e.getKey, floor + (v - cut))
    }
  }

  /** Items observed (total weight), across merges. */
  def nTotal: Long = total

  /** Cumulative decrement — the `err` of the summary contract:
    * `est ≤ true ≤ est + errBound`, absent ⟹ `true ≤ errBound`. */
  def errBound: Long = floor

  /** (item, est) pairs sorted est desc, item asc — a total order. The
    * consumer re-sorts relationally anyway; item asc here is plain
    * lexicographic, which coincides with engine binary order on the
    * ASCII tokens this summarizes. */
  def sorted: Array[(String, Long)] =
    sortedUtf8.map { case (it, v) => (it.toString, v) }

  /** [[sorted]] without the String decode — the aggregate's eval path.
    * Tie order is UTF8 binary ascending (identical to String order on
    * the ASCII tokens this summarizes, and to engine sort order). */
  private[functions] def sortedUtf8: Array[(UTF8String, Long)] = {
    val out = live.toArray
    out.sortWith { case ((ia, va), (ib, vb)) =>
      va > vb || (va == vb && ia.compareTo(ib) < 0) }
  }

  def toBytes: Array[Byte] = {
    val items = live.toArray
    var size = 8 + 8 + 4
    val encoded = items.map { case (it, v) => (it.getBytes, v) }
    encoded.foreach { case (b, _) => size += 4 + b.length + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putLong(total); bb.putLong(floor); bb.putInt(encoded.length)
    encoded.foreach { case (b, v) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(v)
    }
    bb.array()
  }
}

object MGSummary {
  def fromBytes(k: Int, bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MGSummary(k)
    s.total = bb.getLong
    s.floor = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      val v = bb.getLong
      s.put(UTF8String.fromBytes(b), s.floor + v)
      i += 1
    }
    s
  }
}

/** `mg_summary(item, k)`: one row of
  * `struct<n_total, err_bound, items: array<struct<item, est>>>` —
  * the Misra–Gries summary of the item column. Runs inside
  * ObjectHashAggregate with map-side partial aggregation: each
  * partition contributes at most k counters, the shuffle carries one
  * k-capped summary per partition, and no corpus-key-sized exchange
  * exists anywhere in the plan. Null items are ignored. */
case class MisraGriesAgg(
    itemExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("n_total", LongType, nullable = false)
    .add("err_bound", LongType, nullable = false)
    .add("items", ArrayType(new StructType()
      .add("item", StringType, nullable = false)
      .add("est", LongType, nullable = false), containsNull = false),
      nullable = false)
  override def prettyName: String = "mg_summary"

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(b: MGSummary, input: InternalRow): MGSummary = {
    val it = itemExpr.eval(input)
    if (it != null) b.addUtf8(it.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = {
    b.mergeFrom(o); b
  }

  override def eval(b: MGSummary): Any = {
    val items = new GenericArrayData(b.sortedUtf8.map { case (it, v) =>
      new GenericInternalRow(Array[Any](it, v))
    })
    new GenericInternalRow(Array[Any](b.total, b.floor, items))
  }

  override def serialize(b: MGSummary): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(itemExpr = c(0))
}

object FreqSketch {
  /** `mg_summary(item, k)` aggregate Column; items cast to string —
    * the aggregate itself is monomorphic like [[TopKAgg]]. */
  def mgSummary(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(
      ColumnBridge.expression(item.cast(StringType)), k).toAggregateExpression())
}
