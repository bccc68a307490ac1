package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextScanExpressions
import graft.functions.TextScanExpressions.AcAutomaton

/** Aho–Corasick multi-pattern scan: automaton results must equal
  * per-pattern contains() on every input — overlaps, shared prefixes,
  * patterns that are suffixes of other patterns (the failure-link
  * cases), and multi-byte UTF-8 included. */
class TextScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }

  test("automaton equals brute-force contains on adversarial fixtures") {
    // "a"/"ab"/"aba"/"ba" force failure-link emission: at text "aba"
    // position 2 the automaton is in state for "aba" whose suffix
    // outputs must include "ba" and "a"
    val pats = Seq("a", "ab", "aba", "ba", "bab", "abab", "c", "ça")
    val ac = AcAutomaton.build(pats)
    val texts = Seq("", "a", "b", "ab", "ba", "aba", "abab", "ababab",
      "xxabayy", "bababab", "ccc", "çaça", "aç", "abc" * 40, "b" * 100)
    texts.foreach { t =>
      assert(ac.matchedIds(t.getBytes("UTF-8")).toSeq == brute(t, pats),
        s"mismatch on '$t'")
    }
  }

  test("automaton equals brute-force on pseudo-random token soup") {
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "ta",
      "table", "val", "value", "part", "ablet", "lue")
    val pats = Seq("table value", "value part", "slow fast", "ta", "lue pa",
      "agg row scan", "never")
    val ac = AcAutomaton.build(pats)
    // deterministic LCG — no RNG seeds from the clock
    var x = 12345L
    (0 until 200).foreach { _ =>
      val words = (0 until 30).map { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        vocab(((x >>> 33) % vocab.length).toInt)
      }
      val t = words.mkString(" ")
      assert(ac.matchedIds(t.getBytes("UTF-8")).toSeq == brute(t, pats),
        s"mismatch on '$t'")
    }
  }

  test("automaton at blocklist scale: 2000 patterns, still brute-force-equal") {
    // deterministic LCG pattern list over a tight alphabet so shared
    // prefixes/suffixes (the failure-link paths) are dense
    var x = 99L
    def nxt(n: Int): Int = { x = x * 6364136223846793005L + 1442695040888963407L; ((x >>> 33) % n).toInt }
    val alpha = "abcd"
    val pats = (0 until 2000).map { _ =>
      val len = 1 + nxt(6)
      (0 until len).map(_ => alpha(nxt(4))).mkString
    }.distinct
    val ac = AcAutomaton.build(pats)
    (0 until 50).foreach { _ =>
      val t = (0 until 60).map(_ => alpha(nxt(4))).mkString
      assert(ac.matchedIds(t.getBytes("UTF-8")).toSeq == brute(t, pats),
        s"mismatch on '$t'")
    }
  }

  test("DataFrame path (codegen) matches the raw automaton") {
    val pats = Seq("alpha", "beta", "alp", "ha be")
    val df = Seq((1L, "alpha beta"), (2L, "the alp"), (3L, "nothing"),
      (4L, "xxalpha bexx")).toDF("id", "text")
    val got = df.select(col("id"),
        TextScanExpressions.multiMatchIds(col("text"), pats).as("ids"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq)
    val ac = AcAutomaton.build(pats)
    val expected = Seq(1L -> Seq(0, 1, 2, 3), 2L -> Seq(2),
      3L -> Seq.empty[Int], 4L -> Seq(0, 2, 3))
    assert(got.toSeq == expected)
    expected.foreach { case (id, ids) =>
      val t = Map(1L -> "alpha beta", 2L -> "the alp", 3L -> "nothing",
        4L -> "xxalpha bexx")(id)
      assert(ac.matchedIds(t.getBytes("UTF-8")).toSeq == ids)
    }
  }

  test("multiMatchAny filters like a per-pattern disjunction") {
    val pats = Seq("bad phrase", "worse")
    val df = Seq("a bad phrase here", "clean", "much worse text")
      .toDF("text")
    val kept = df.filter(TextScanExpressions.multiMatchAny(col("text"), pats))
      .collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("a bad phrase here", "much worse text"))
  }

  test("SQL surface: multi_match_ids resolves to the identical expression") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text")
    df.createOrReplaceTempView("tsc_docs")
    val viaSql = spark.sql(
      "SELECT id, multi_match_ids(text, array('alpha', 'bet')) AS ids " +
      "FROM tsc_docs ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq)
    assert(viaSql.toSeq == Seq(1L -> Seq(0, 1), 2L -> Seq.empty[Int]))
  }
}
