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
  private[functions] val m = new JHashMap[String, java.lang.Long](16)
  private val buckets = new JHashMap[java.lang.Long, java.util.HashSet[String]]()
  private[functions] var total = 0L   // items observed (weight)
  private[functions] var floor = 0L   // cumulative decrement = error bound

  private def bucketAdd(v: Long, item: String): Unit = {
    var s = buckets.get(v)
    if (s == null) { s = new java.util.HashSet[String](4); buckets.put(v, s) }
    s.add(item)
  }

  private def bucketRemove(v: Long, item: String): Unit = {
    val s = buckets.get(v)
    if (s != null) { s.remove(item); if (s.isEmpty) buckets.remove(v) }
  }

  private[functions] def put(item: String, stored: Long): Unit = {
    m.put(item, stored)
    bucketAdd(stored, item)
  }

  def add(item: String): Unit = {
    total += 1
    val st = m.get(item)
    if (st != null) {
      val v = st.longValue()
      m.put(item, v + 1L)
      bucketRemove(v, item); bucketAdd(v + 1L, item)
    } else if (m.size < k) put(item, floor + 1L)
    else {
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

  /** Live (item, est) pairs, est > 0. */
  private[functions] def live: Iterator[(String, Long)] =
    m.entrySet().iterator().asScala.collect {
      case e if e.getValue.longValue() > floor =>
        (e.getKey, e.getValue.longValue() - floor)
    }

  def mergeFrom(o: MGSummary): Unit = {
    val combined = new JHashMap[String, java.lang.Long](m.size + o.m.size)
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
  def sorted: Array[(String, Long)] = {
    val out = live.toArray
    out.sortWith { case ((ia, va), (ib, vb)) => va > vb || (va == vb && ia < ib) }
  }

  def toBytes: Array[Byte] = {
    val items = live.toArray
    var size = 8 + 8 + 4
    val encoded = items.map { case (it, v) =>
      (it.getBytes(StandardCharsets.UTF_8), v)
    }
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
      s.put(new String(b, StandardCharsets.UTF_8), s.floor + v)
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
    if (it != null) b.add(it.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = {
    b.mergeFrom(o); b
  }

  override def eval(b: MGSummary): Any = {
    val items = new GenericArrayData(b.sorted.map { case (it, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(it), v))
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
