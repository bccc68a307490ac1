package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ChangeCapture

class ChangeCaptureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies insert/delete/update/unchanged, null-safely") {
    val a = Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "C", 30L),
      (4L, null.asInstanceOf[String], 40L))
      .toDF("k", "status", "v")
    val b = Seq((2L, "B", 20L),   // unchanged
      (3L, "C", 31L),             // update (value)
      (4L, null.asInstanceOf[String], 40L), // unchanged with NULL field
      (5L, "E", 50L))             // insert; 1 deleted
      .toDF("k", "status", "v")
    val got = ChangeCapture.diff(a, b, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "delete", 2L -> "unchanged", 3L -> "update",
      4L -> "unchanged", 5L -> "insert"))
  }

  test("maintainSumCount applies deltas, drops emptied groups, adds new ones") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 30L))
      .toDF("k", "g", "v")
    // y vanishes (deleted), z appears (insert), one x repriced, one x
    // moved to z (group-changing update)
    val b = Seq((1L, "x", 11L), (2L, "z", 20L), (5L, "z", 50L))
      .toDF("k", "g", "v")
    val baseAgg = a.groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
    val changes = ChangeCapture.diff(a, b, "k")
      .filter(col("change") =!= "unchanged")
    val got = ChangeCapture.maintainSumCount(baseAgg, changes, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute over b: x -> (1, 11), z -> (2, 70); y gone
    assert(got == Map("x" -> (1L, 11L), "z" -> (2L, 70L)))
  }
}
