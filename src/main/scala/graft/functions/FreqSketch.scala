package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.{HashMap => JHashMap}

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
  * The decrement-all step is O(1) amortized via a floor offset plus
  * the classic stream-summary bucket layout (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams"): stored
  * counts are absolute, live value = stored − floor, and a full-map
  * miss bumps the floor and evicts EXACTLY the newly-dead counters
  * (the `stored == floor` bucket) — preserving true MG semantics (each
  * bump destroys one unit from all k live counters, so `err ≤
  * N/(k+1)`). Merge follows Agarwal et al. "Mergeable Summaries": sum
  * live values, subtract the (k+1)-st largest, drop non-positive.
  */
final class MGSummary(val k: Int) {
  // keyed on UTF8String, NOT String: the aggregate's hot path receives
  // a TRANSIENT UTF8String per input row (backed by row memory Spark
  // reuses), and UTF8String's value-based equals/hashCode let the
  // tracked-item lookup run ZERO-COPY — the key is cloned only when it
  // is actually inserted, so the per-row String decode (one allocation
  // + copy per input row) and the eval/serialize re-encode are gone.
  //
  // The value index is INTRUSIVE, not a HashMap[Long, HashSet]: cells
  // are threaded through per-value buckets as a doubly-linked list,
  // and the buckets themselves form a doubly-linked list ordered by
  // value ascending. A hit moves its cell to the adjacent bucket (or
  // bumps a sole-occupant bucket in place) with pointer writes only —
  // no boxed-Long allocation, no second hash probe, no HashSet churn.
  // A miss at capacity evicts the minimum bucket's cells directly.
  // Per-arrival cost: one JHashMap probe + O(1) pointer work.
  /** Counter cell: carries the OWNED key so the hot hit path never
    * stores the caller's transient key anywhere. Its live count is its
    * bucket's value; the cell itself holds only list linkage. */
  private final class Cnt(val key: UTF8String) {
    var bucket: Bucket = _
    var prev: Cnt = _
    var next: Cnt = _
  }

  /** One distinct stored-count value and the cells that hold it. */
  private final class Bucket(var value: Long) {
    var head: Cnt = _
    var prev: Bucket = _   // toward smaller values
    var next: Bucket = _   // toward larger values
  }

  private val m = new JHashMap[UTF8String, Cnt](16)
  private var minBucket: Bucket = _
  private var maxBucket: Bucket = _
  private[functions] var total = 0L   // items observed (weight)
  private[functions] var floor = 0L   // cumulative decrement = error bound

  private def attach(c: Cnt, b: Bucket): Unit = {
    c.bucket = b; c.prev = null; c.next = b.head
    if (b.head != null) b.head.prev = c
    b.head = c
  }

  private def detach(c: Cnt): Unit = {
    val b = c.bucket
    if (c.prev != null) c.prev.next = c.next else b.head = c.next
    if (c.next != null) c.next.prev = c.prev
    c.prev = null; c.next = null; c.bucket = null
  }

  private def unlinkBucket(b: Bucket): Unit = {
    if (b.prev != null) b.prev.next = b.next else minBucket = b.next
    if (b.next != null) b.next.prev = b.prev else maxBucket = b.prev
    b.prev = null; b.next = null
  }

  private def insertBucketAfter(b: Bucket, fresh: Bucket): Unit = {
    fresh.prev = b; fresh.next = b.next
    if (b.next != null) b.next.prev = fresh else maxBucket = fresh
    b.next = fresh
  }

  private def insertBucketFront(fresh: Bucket): Unit = {
    fresh.next = minBucket
    if (minBucket != null) minBucket.prev = fresh else maxBucket = fresh
    minBucket = fresh
  }

  /** `item` must be OWNED by this summary (cloned/fresh). General
    * insert walking from the max bucket down — O(1) when callers
    * insert in ascending stored order (merge rebuild, deserialize). */
  private[functions] def put(item: UTF8String, stored: Long): Unit = {
    val cell = new Cnt(item)
    m.put(item, cell)
    var b = maxBucket
    while (b != null && b.value > stored) b = b.prev
    if (b != null && b.value == stored) attach(cell, b)
    else {
      val fresh = new Bucket(stored)
      if (b == null) insertBucketFront(fresh) else insertBucketAfter(b, fresh)
      attach(cell, fresh)
    }
  }

  def add(item: String): Unit = addUtf8(UTF8String.fromString(item))

  /** Hot-path add: `item` may be TRANSIENT (row-backed memory Spark
    * reuses); the tracked-item lookup is zero-copy via UTF8String's
    * value equality, and the key is cloned ONLY on the insert arm. */
  def addUtf8(item: UTF8String): Unit = {
    total += 1
    val c = m.get(item)
    if (c != null) {
      val b = c.bucket
      val nb = b.next
      val target = b.value + 1L
      if (nb != null && nb.value == target) {
        detach(c); attach(c, nb)
        if (b.head == null) unlinkBucket(b)
      } else if (c.prev == null && c.next == null) {
        b.value = target    // sole occupant: bump the bucket in place
      } else {
        val fresh = new Bucket(target)
        insertBucketAfter(b, fresh)
        detach(c); attach(c, fresh)
      }
    } else if (m.size < k) {
      // a fresh counter enters at the minimum live value, floor + 1
      val owned = item.clone()
      val cell = new Cnt(owned)
      m.put(owned, cell)
      if (minBucket != null && minBucket.value == floor + 1L) {
        attach(cell, minBucket)
      } else {
        val fresh = new Bucket(floor + 1L)
        insertBucketFront(fresh)
        attach(cell, fresh)
      }
    } else {
      // decrement-all: live values (stored − floor) all drop by one;
      // the min bucket at stored == floor is exactly the counters that
      // hit 0 (live values are always > floor by construction)
      floor += 1
      val b = minBucket
      if (b != null && b.value == floor) {
        var cell = b.head
        while (cell != null) { m.remove(cell.key); cell = cell.next }
        unlinkBucket(b)
      }
    }
  }

  /** Tracked-counter count — spec hook. */
  private[functions] def trackedSize: Int = m.size

  /** Live (item, est) pairs, est > 0, in ascending-est order (bucket
    * order) — which keeps serialize → deserialize rebuilds O(k). */
  private[functions] def live: Iterator[(UTF8String, Long)] = {
    val buf = new scala.collection.mutable.ArrayBuffer[(UTF8String, Long)](m.size)
    var b = minBucket
    while (b != null) {
      var c = b.head
      while (c != null) { buf += ((c.key, b.value - floor)); c = c.next }
      b = b.next
    }
    buf.iterator
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
    minBucket = null
    maxBucket = null
    // rebuild in ascending-value order: each put() then lands at the
    // tail bucket in O(1), keeping the merge O(k log k)
    val entries = new scala.collection.mutable.ArrayBuffer[(UTF8String, Long)](
      combined.size)
    val ei = combined.entrySet().iterator()
    while (ei.hasNext) {
      val e = ei.next()
      val v = e.getValue.longValue()
      if (v > cut) entries += ((e.getKey, v))
    }
    entries.sortInPlaceBy(_._2)
    entries.foreach { case (key, v) => put(key, floor + (v - cut)) }
  }

  /** Items observed (total weight), across merges. */
  def nTotal: Long = total

  /** Cumulative decrement — the `err` of the summary contract:
    * `est ≤ true ≤ est + errBound`, absent ⟹ `true ≤ errBound`. */
  def errBound: Long = floor

  /** (item, est) pairs sorted est desc, item asc — a total order.
    *
    * ORDERING CONTRACT: the item-ascending tiebreak is UTF-8 BINARY
    * order (Unicode code-point order), not Java String order (UTF-16
    * code-unit order). The two agree on ASCII — the tokens this
    * summarizes — and on most of the BMP, but diverge between
    * U+E000–U+FFFF and supplementary-plane characters (surrogate
    * pairs sort low in UTF-16, high in code-point order). Consumers
    * that need a specific non-ASCII tie order must re-sort; the
    * engine's own relational sort is UTF-8 binary, i.e. this order. */
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
