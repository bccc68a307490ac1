package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q150's size-gated min-count prune semantics: above
  * [[QueryHelpers.LmPruneMinDocs]] the trigram model drops singleton
  * trigrams (Brants et al.), and EVERY model table derives from the
  * pruned set — so a pruned trigram scores through backoff exactly as
  * an unseen one, and grams whose only support was singleton trigrams
  * fall through to lower orders or OOV. The fixture exercises all four
  * scoring classes in both arms. */
class LmPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // train (even ids): doc 0 is all singleton trigrams, doc 2 repeats
  // (p q r) so its trigrams survive the prune; score (odd id): doc 1
  private def docs = Seq(
    (0L, "a b c x y z"),
    (2L, "p q r p q r p q r"),
    (1L, "a b c p q r")
  ).toDF("doc_id", "text")

  private def row(pruned: Boolean): Map[String, Long] = {
    val r = QueryHelpers.trigramBackoffLm(docs, pruneSingletons = pruned)
      .collect()
    assert(r.length == 1)
    Seq("n_trigrams", "n_tri_hit", "n_backoff_bi", "n_backoff_uni", "n_oov")
      .map(c => c -> r(0).getAs[Long](c)).toMap
  }

  test("full model: singleton trigrams are hits") {
    val m = row(pruned = false)
    assert(m("n_trigrams") == 4L)
    // (a,b,c) singleton-hit + (p,q,r) hit; (c,p,q) → bigram (p,q);
    // (b,c,p) → unigram p
    assert(m("n_tri_hit") == 2L)
    assert(m("n_backoff_bi") == 1L)
    assert(m("n_backoff_uni") == 1L)
    assert(m("n_oov") == 0L)
  }

  test("pruned model: singleton support falls through to backoff/OOV") {
    val m = row(pruned = true)
    assert(m("n_trigrams") == 4L)
    // (a,b,c) lost its singleton → no (b,c) bigram, no c unigram → OOV;
    // (p,q,r) survives; (c,p,q)/(b,c,p) unchanged (their backoff grams
    // come from doc 2's repeated trigrams)
    assert(m("n_tri_hit") == 1L)
    assert(m("n_backoff_bi") == 1L)
    assert(m("n_backoff_uni") == 1L)
    assert(m("n_oov") == 1L)
  }
}
