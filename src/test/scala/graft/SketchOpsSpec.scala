package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SketchOps

class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("CMS estimates never underestimate and are exact without collisions") {
    val tf = (1 to 50).map(i => (s"term$i", i.toLong)).toDF("term", "n")
    // width 1024 ≫ 50 items: no collisions → exact counts back
    val wide = SketchOps.cmsCounters(tf, col("term"), col("n"), 4, 1024)
    val estWide = SketchOps.cmsEstimate(wide, tf.select(col("term")),
        col("term"), 4, 1024)
      .join(tf, col("item") === col("term")).collect()
    assert(estWide.forall(r => r.getAs[Long]("est_n") == r.getAs[Long]("n")))
    // width 8 ≪ 50 items: collisions → strictly the upper-bound side
    val narrow = SketchOps.cmsCounters(tf, col("term"), col("n"), 4, 8)
    val estNarrow = SketchOps.cmsEstimate(narrow, tf.select(col("term")),
        col("term"), 4, 8)
      .join(tf, col("item") === col("term")).collect()
    assert(estNarrow.forall(r => r.getAs[Long]("est_n") >= r.getAs[Long]("n")))
    assert(estNarrow.exists(r => r.getAs[Long]("est_n") > r.getAs[Long]("n")))
  }

  test("HLL estimate lands within 2.5σ of a 20k-item cardinality") {
    val items = (1 to 20000).map(_.toLong).toDF("id")
    val est = SketchOps.hllEstimate(
        SketchOps.hllRegisters(items, col("id"), b = 10), b = 10)
      .select("est_raw").as[Double].head()
    // raw-HLL stderr is 1.04/√m ≈ 3.25% at m=1024; allow 2.5σ — the
    // estimate is DETERMINISTIC for this fixture (measured 5.5% low),
    // the bound just documents the accuracy class
    assert(math.abs(est - 20000.0) / 20000.0 < 0.082, s"estimate $est")
  }
}
