package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SketchOps
import graft.functions.MGSummary

class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Zipf-ish skewed stream: item i appears ~N/i times, plus a long
    * unique tail — the regime MG exists for. */
  private def skewed(n: Int, tail: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(n / i)(s"hot$i")) ++
      (1 to tail).map(i => s"tail$i")

  private def truth(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def summarize(items: Seq[String], k: Int, parts: Int): DataFrame =
    SketchOps.heavyHitters(
      items.toDF("item").repartition(parts), col("item"), k)

  test("exact regime (k >= distinct): equals groupBy counts under any partitioning") {
    val items = skewed(40, 300)
    val exact = truth(items)
    for (parts <- Seq(1, 7, 32)) {
      val rows = summarize(items, k = 4096, parts = parts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows.forall(_._3 == 0L), "exact regime must report err_bound 0")
      assert(rows.map(t => (t._1, t._2)).toMap == exact)
    }
  }

  test("approximate regime: est <= true <= est + err_bound; heavy items present") {
    // truly heavy head (1500/i for i<=10) over a 4000-unique tail:
    // err <= N/(k+1) ~ 129, so hot1..hot5 (300..1500) MUST survive
    val items = (1 to 10).flatMap(i => Seq.fill(1500 / i)(s"hot$i")) ++
      (1 to 4000).map(i => s"tail$i")
    val exact = truth(items)
    val n = items.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val rows = summarize(items, k = 64, parts = parts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows.nonEmpty && rows.size <= 64)
      val err = rows.head._3
      assert(err > 0L && err <= n / 65 + 64, s"err must respect ~N/(k+1), got $err")
      val est = rows.map(t => (t._1, t._2)).toMap
      est.foreach { case (item, e) =>
        val t = exact(item)
        assert(e <= t, s"$item overestimated: est $e > true $t")
        assert(t <= e + err, s"$item bound violated: true $t > est $e + err $err")
      }
      // the presence guarantee: true > err_bound => reported — and the
      // data makes it non-vacuous (five items far above the bound)
      exact.foreach { case (item, t) =>
        if (t > err) assert(est.contains(item), s"heavy item $item (n=$t) missing at err $err")
      }
      assert(Seq("hot1", "hot2", "hot3").forall(est.contains))
    }
  }

  test("merge is Agarwal-et-al MG: bounds survive adversarial buffer merging") {
    // merge two disjoint-domain skewed summaries, then a third that
    // overlaps both — exercises the (k+1)-st-largest cut path directly
    val a = skewed(30, 500).map("A" + _)
    val b = skewed(30, 500).map("B" + _)
    val c = skewed(30, 0).flatMap(x => Seq("A" + x, "B" + x))
    def build(items: Seq[String], k: Int): MGSummary = {
      val s = new MGSummary(k)
      items.foreach(s.add)
      s
    }
    val merged = build(a, 48)
    merged.mergeFrom(build(b, 48))
    merged.mergeFrom(build(c, 48))
    val exact = truth(a ++ b ++ c)
    val est = merged.sorted.toMap
    val err = {
      // err_bound is floor; recover it through the public output shape
      val n = (a ++ b ++ c).size.toLong
      val s = est.values.sum
      assert(est.size <= 48)
      n - s // floor is at most total minus retained mass; exact check below
    }
    est.foreach { case (item, e) => assert(e <= exact(item)) }
    // every item's deficit is covered by SOME common bound: the max
    // observed deficit must not exceed the mass unaccounted for
    val maxDeficit = exact.collect {
      case (item, t) => t - est.getOrElse(item, 0L)
    }.max
    assert(maxDeficit <= err)
  }

  test("serialization round-trips through the shuffle partial path") {
    val items = skewed(25, 200)
    val s = new MGSummary(32)
    items.foreach(s.add)
    val back = MGSummary.fromBytes(32, s.toBytes)
    assert(back.sorted.toSeq == s.sorted.toSeq)
    // and a merge of round-tripped halves still honors the bounds
    val h1 = new MGSummary(32); items.take(items.size / 2).foreach(h1.add)
    val h2 = new MGSummary(32); items.drop(items.size / 2).foreach(h2.add)
    val m = MGSummary.fromBytes(32, h1.toBytes)
    m.mergeFrom(MGSummary.fromBytes(32, h2.toBytes))
    val exact = truth(items)
    m.sorted.foreach { case (item, e) => assert(e <= exact(item)) }
  }

  test("plan shape: ObjectHashAggregate with map-side partial, no full-domain exchange") {
    val df = skewed(20, 100).toDF("item").repartition(8)
    val plan = SketchOps.heavyHitters(df, col("item"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    // partial + final pair: the aggregate runs map-side before the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2)
  }
}
