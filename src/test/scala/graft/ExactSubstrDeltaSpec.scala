package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ChangeCapture
import graft.ext.ExactSubstrOps

/** Incremental ExactSubstr maintenance: a CDC step over a mutated
  * corpus produces EXACTLY the full-rebuild strip output, while the
  * gram passes run only over touched docs and the restrip only over
  * affected docs — including the unchanged docs whose spans change
  * because a mutation flipped a gram's corpus-wide duplication
  * status (the case a naive restrip-changed-docs misses). */
class ExactSubstrDeltaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 8

  private def tok(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  // 0/1 share a 10-token passage (duplicated); 2 is a unique doc;
  // 3..9 are unique filler docs; 4 and 5 share another passage
  private def baseCorpus = Seq(
    (0L, s"${tok(10, "p")} ${tok(4, "a")}"),
    (1L, s"${tok(3, "b")} ${tok(10, "p")}"),
    (2L, tok(14, "c")),
    (3L, tok(12, "d")),
    (4L, s"${tok(9, "q")} ${tok(5, "e")}"),
    (5L, s"${tok(5, "f")} ${tok(9, "q")}"),
    (6L, tok(12, "g")),
    (7L, tok(12, "h")),
    (8L, tok(12, "i")),
    (9L, tok(12, "j"))
  ).toDF("doc_id", "text")

  private def stripOf(df: org.apache.spark.sql.DataFrame) =
    ExactSubstrOps.stripDupSpans(df, col("doc_id"), col("text"),
        l = L, mergeGap = 0)
      .select("doc_id", "n_tokens", "kept_tokens", "removed_tokens",
        "cleaned_text")
      .collect().map(_.toString).sorted.toSeq

  private def step(oldC: org.apache.spark.sql.DataFrame,
                   newC: org.apache.spark.sql.DataFrame) = {
    val st0 = ExactSubstrOps.initState(oldC, col("doc_id"), col("text"), L)
    val prevStrip = ExactSubstrOps.stripDupSpans(oldC, col("doc_id"),
      col("text"), l = L, mergeGap = 0)
    val changes = ChangeCapture.diff(oldC, newC, "doc_id")
    ExactSubstrOps.applyChanges(st0, prevStrip, changes, newC,
      col("doc_id"), col("text"), l = L, mergeGap = 0)
  }

  private def assertEquivalent(oldC: org.apache.spark.sql.DataFrame,
                               newC: org.apache.spark.sql.DataFrame) = {
    val (stNew, stripNew) = step(oldC, newC)
    assert(stripNew.select("doc_id", "n_tokens", "kept_tokens",
        "removed_tokens", "cleaned_text")
      .collect().map(_.toString).sorted.toSeq == stripOf(newC))
    // maintained state ≡ full rebuild of the state
    val full = ExactSubstrOps.initState(newC, col("doc_id"), col("text"), L)
    assert(stNew.occ.collect().map(_.toString).sorted.toSeq
      == full.occ.collect().map(_.toString).sorted.toSeq)
    assert(stNew.cnt.collect().map(_.toString).sorted.toSeq
      == full.cnt.collect().map(_.toString).sorted.toSeq)
    stNew
  }

  test("delete of one copy restrips the SURVIVING (unchanged) copy: dup->unique flip") {
    // doc 1 deleted: doc 0's passage grams become unique; doc 0 must
    // lose its strip row even though doc 0 itself was not touched
    assertEquivalent(baseCorpus, baseCorpus.filter(col("doc_id") =!= 1L))
  }

  test("insert of a copy restrips the unchanged original: unique->dup flip") {
    val ins = Seq((10L, s"${tok(12, "c")} zz")).toDF("doc_id", "text")
    assertEquivalent(baseCorpus, baseCorpus.unionByName(ins))
  }

  test("update that rewrites a passage; mixed insert+delete+update batch") {
    val mutated = baseCorpus
      .filter(col("doc_id") =!= 3L) // delete filler
      .withColumn("text",
        when(col("doc_id") === 4L, lit(tok(14, "x"))) // update: kills q-passage
          .otherwise(col("text")))
      .unionByName(Seq((11L, s"${tok(3, "y")} ${tok(10, "p")}"))
        .toDF("doc_id", "text")) // insert: third p-copy
    assertEquivalent(baseCorpus, mutated)
  }

  test("no-op diff leaves strip and state unchanged, affected set empty") {
    val (_, stripNew) = step(baseCorpus, baseCorpus)
    assert(stripNew.select("doc_id", "n_tokens", "kept_tokens",
        "removed_tokens", "cleaned_text")
      .collect().map(_.toString).sorted.toSeq == stripOf(baseCorpus))
  }

  test("work is bounded by touched docs: untouched-unaffected docs never re-enter") {
    // touch doc 2 only (no shared grams): affected = {2}; every other
    // doc's strip row must come from prevStrip by REFERENCE (we prove
    // it by handing applyChanges a prevStrip with a sentinel row for an
    // untouched doc and seeing the sentinel survive — a full rebuild
    // would erase it)
    val newC = baseCorpus.withColumn("text",
      when(col("doc_id") === 2L, lit(tok(14, "z"))).otherwise(col("text")))
    val st0 = ExactSubstrOps.initState(baseCorpus, col("doc_id"), col("text"), L)
    val sentinel = Seq((7L, 12L, 12L, 0L, "SENTINEL"))
      .toDF("doc_id", "n_tokens", "kept_tokens", "removed_tokens", "cleaned_text")
    val prevStrip = ExactSubstrOps.stripDupSpans(baseCorpus, col("doc_id"),
        col("text"), l = L, mergeGap = 0)
      .select("doc_id", "n_tokens", "kept_tokens", "removed_tokens", "cleaned_text")
      .unionByName(sentinel)
    val changes = ChangeCapture.diff(baseCorpus, newC, "doc_id")
    val (_, stripNew) = ExactSubstrOps.applyChanges(st0, prevStrip, changes,
      newC, col("doc_id"), col("text"), l = L, mergeGap = 0)
    assert(stripNew.filter(col("cleaned_text") === "SENTINEL").count() == 1)
  }
}
