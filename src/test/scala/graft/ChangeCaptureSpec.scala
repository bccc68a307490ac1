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
}
