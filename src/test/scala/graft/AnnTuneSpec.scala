package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps

/** Recall-targeted ANN auto-tuning: the chosen config's MEASURED recall
  * meets the declared target (or is the exact-fallback deepest arm),
  * and the search entry actually runs at the chosen setting. */
class AnnTuneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def qc = {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    (queries, corpus)
  }

  test("tuneIvfNprobe: exactly one chosen arm; it meets the target or is the deepest") {
    val (queries, corpus) = qc
    val model = SimilarityOps.ivfFitCached("tune-spec", corpus, nlist = 16)
    val board = SimilarityOps.tuneIvfNprobe(queries, corpus, model, 10,
      targetRecallFp = 7000L).collect()
    assert(board.count(_.getAs[Boolean]("chosen")) == 1)
    val chosen = board.find(_.getAs[Boolean]("chosen")).get
    val deepest = board.map(_.getAs[Long]("nprobe")).max
    assert(chosen.getAs[Long]("recall_fp") >= 7000L ||
      chosen.getAs[Long]("nprobe") == deepest)
    // cheapest-meeting-target: no cheaper arm also meets it
    val cheaperMeeting = board.filter(r =>
      r.getAs[Long]("nprobe") < chosen.getAs[Long]("nprobe") &&
        r.getAs[Long]("recall_fp") >= 7000L)
    assert(cheaperMeeting.isEmpty)
    // recall is monotone in probe depth, and the full probe is exact
    val byNp = board.sortBy(_.getAs[Long]("nprobe")).map(_.getAs[Long]("recall_fp"))
    assert(byNp.zip(byNp.tail).forall { case (a, b) => a <= b })
    assert(byNp.last == 10000L)
  }

  test("ivfTopKForRecall: the returned search achieves the target recall") {
    val (queries, corpus) = qc
    val model = SimilarityOps.ivfFitCached("tune-spec", corpus, nlist = 16)
    val exact = SimilarityOps.bruteForceTopK(queries, corpus, 10)
      .select("qid", "cid")
    val tuned = SimilarityOps.ivfTopKForRecall(queries, queries, corpus,
      model, 10, targetRecallFp = 7000L).select("qid", "cid")
    val hits = exact.join(tuned, Seq("qid", "cid"), "left_semi").count()
    val possible = exact.count()
    assert(10000L * hits / possible >= 7000L)
  }

  test("tuneLshTables: one chosen arm, recall monotone in table count") {
    val (queries, corpus) = qc
    val board = SimilarityOps.tuneLshTables(queries, corpus, 10,
      dim = 64, bits = 6, targetRecallFp = 100L, candidates = Seq(1, 2))
      .collect()
    assert(board.count(_.getAs[Boolean]("chosen")) == 1)
    val byT = board.sortBy(_.getAs[Long]("tables")).map(_.getAs[Long]("recall_fp"))
    assert(byT.zip(byT.tail).forall { case (a, b) => a <= b })
  }

  test("an unreachable target falls back to the deepest candidate") {
    val (queries, corpus) = qc
    val model = SimilarityOps.ivfFitCached("tune-spec", corpus, nlist = 16)
    val board = SimilarityOps.tuneIvfNprobe(queries, corpus, model, 10,
      targetRecallFp = 10001L, candidates = Seq(1, 2)).collect()
    val chosen = board.find(_.getAs[Boolean]("chosen")).get
    assert(chosen.getAs[Long]("nprobe") == 2L)
  }
}
