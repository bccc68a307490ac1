package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.analytics.{DerivedOps, HistogramOps, TopNOps}
import graft.ext.DedupOps

/** ScalaCheck properties over the core operators (SURVEY §5's suggested
  * invariants). Spark round-trips are slow, so each property runs a
  * small number of generated cases — the example-based suites carry the
  * bulk of coverage; these catch shape-level mistakes (lost rows,
  * broken totals, unclipped values) across arbitrary inputs. */
object OperatorProps extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val values = Gen.nonEmptyListOf(Gen.chooseNum(-1e4, 1e4))

  property("histogram bin counts sum to row count") = forAll(values) { vs =>
    val df = vs.toDF("v")
    val h = HistogramOps.smartHistogram(df, col("v"), 10)
    h.agg(sum("cnt")).head().getLong(0) == vs.length.toLong
  }

  property("series histogram: last bin present, total = rows - at-max") =
    forAll(values) { vs =>
      val df = vs.toDF("v")
      val h = HistogramOps.seriesHistogram(df, col("v"), 10).collect()
      val atMax = vs.count(_ == vs.max)
      h.map(_.getLong(0)).contains(9L) &&
        h.map(_.getLong(1)).sum == (vs.length - atMax).toLong
    }

  private val categories =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))

  property("top-N + Others preserves the total count") =
    forAll(categories, Gen.chooseNum(1, 6)) { (cs, n) =>
      val out = TopNOps.topNWithOthers(cs.toDF("c"), col("c"), n).collect()
      out.map(_.getLong(1)).sum == cs.length.toLong &&
        out.count(_.getString(0) == "Others") <= 1
    }

  property("ranking is dense 1..k") = forAll(categories) { cs =>
    val r = TopNOps.rankedCounts(cs.toDF("c"), col("c")).collect()
    r.map(_.getInt(2)).toSeq == (1 to r.length)
  }

  property("clip stays within bounds") =
    forAll(values, Gen.chooseNum(-100.0, 0.0), Gen.chooseNum(0.0, 100.0)) {
      (vs, lo, hi) =>
        val out = vs.toDF("v")
          .select(DerivedOps.clip(col("v"), lo, hi)).collect().map(_.getDouble(0))
        out.forall(v => v >= lo && v <= hi)
    }

  private val texts = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.oneOf("spark", "data", "fast", "row", "the", "join"))
      .map(_.mkString(" ")))

  property("ngram jaccard is 1.0 on identical text, within [0,1] otherwise") =
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val self = df.select(DedupOps.ngramJaccard(col("text"), col("text"), 2))
        .collect().map(_.getDouble(0))
      self.forall(_ == 1.0)
    }

  property("exact dedup: distinct texts survive, copies counted") =
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val deduped = DedupOps.exactDedup(df, col("text")).count()
      val classes = DedupOps.exactDupClasses(df, col("id"), col("text"))
      deduped == ts.distinct.length.toLong &&
        classes.agg(sum("copies")).head().getLong(0) == ts.length.toLong
    }

  // arbitrary small graphs: up to 40 edges over up to 30 node ids
  private val edgeLists: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
    for {
      a <- Gen.chooseNum(0L, 29L)
      b <- Gen.chooseNum(0L, 29L) if a != b
    } yield (a, b)).map(_.take(40))

  /** In-test reference union-find: ground truth for the distributed
    * label propagation (test-side only — the engine never does this). */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("resolveClusters equals union-find on arbitrary graphs") =
    forAll(edgeLists) { edges =>
      val pairs = edges.toDF("id_a", "id_b")
      val got = DedupOps.resolveClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      // same node set, and same MINIMUM label per component
      got == want.map { case (k, _) => k -> want.filter(_._2 == want(k)).keys.min }
    }
}
