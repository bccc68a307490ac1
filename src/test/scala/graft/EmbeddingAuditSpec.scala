package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 continuation: embedding-side audit reports — IVF cluster
  * quality (q164) and JL sign-projection distortion (q165). Value-level
  * correctness is the DuckDB oracle's job; these pin the promised
  * mathematical properties.
  */
class EmbeddingAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(name: String) =
    Queries.byName(name).run(spark, SparkTestSession.sfDir)

  test("q164 covers the corpus, keeps cosines in range, and orders min ≤ mean") {
    val rows = run("q164_cluster_quality").collect()
    assert(rows.nonEmpty)
    val corpusN = Tables.load(spark, SparkTestSession.sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == corpusN)
    rows.foreach { r =>
      val kid = r.getAs[Int]("cluster_id")
      assert(kid >= 0 && kid < 16)
      val coh = r.getAs[Long]("cohesion_fp")
      assert(coh > 0L && coh <= 1000000L, s"cohesion out of range: $r")
      assert(r.getAs[Long]("min_cos_fp") <= coh)
      assert(math.abs(r.getAs[Long]("nn_sim_fp")) <= 1000000L)
    }
  }

  test("q165 distortion ratios concentrate around 1 (the JL guarantee)") {
    val rows = run("q165_jl_projection").collect()
    // 16 sample vectors → all 120 unordered pairs
    assert(rows.length == 16 * 15 / 2)
    val ratios = rows.map(_.getAs[Long]("ratio_fp"))
    rows.foreach { r =>
      assert(r.getAs[Long]("dq2") > 0L) // distinct sample vectors
      assert(r.getAs[Long]("dy2") >= 0L)
    }
    // every pair within a loose JL band for d'=16, mean tight around 1
    assert(ratios.forall(x => x > 1000L && x < 50000L),
      s"ratio outside band: ${ratios.min}..${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 6000L && mean < 15000L, s"mean ratio $mean")
  }

  test("q168 reports a recall@10 per query with consistent fixed-point scaling") {
    val rows = run("q168_pq_ann").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 10L)
      assert(r.getAs[Long]("recall_fp") == h * 1000L)
    }
    assert(rows.map(_.getAs[Long]("qid")).toSet == (0L until 16L).toSet)
  }

  test("q171 profiles every subspace with sane residuals and utilization") {
    val rows = run("q171_pq_distortion").orderBy("subspace").collect()
    assert(rows.map(_.getAs[Long]("subspace")).toSeq == (0L to 3L))
    val corpusN = Tables.load(spark, SparkTestSession.sfDir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == corpusN)
      assert(r.getAs[Long]("mean_sq_err") >= 0L)
      assert(r.getAs[Long]("mean_sq_err") <= r.getAs[Long]("max_sq_err"))
      val used = r.getAs[Long]("codes_used")
      assert(used >= 1L && used <= 16L)
    }
  }

  test("q173 scores every anchor exactly once with consistent per-class accuracy") {
    val rows = run("q173_knn_label_accuracy").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 64L)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val c = r.getAs[Long]("n_correct")
      assert(c >= 0L && c <= n)
      assert(r.getAs[Long]("acc_fp") == 10000L * c / n)
    }
  }

  test("q172 sweep is monotone in the threshold and counts cohere") {
    val rows = Queries.byName("q172_neardup_threshold_sweep")
      .run(spark, SparkTestSession.sfDir).orderBy("t10").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(lo, hi) => // higher cut ⇒ fewer (or equal) surviving pairs
        assert(hi.getAs[Long]("pairs_ge") <= lo.getAs[Long]("pairs_ge"))
      case _ =>
    }
    rows.foreach { r =>
      val pairs = r.getAs[Long]("pairs_ge")
      val touched = r.getAs[Long]("docs_touched")
      val removed = r.getAs[Long]("docs_removed_greedy")
      assert(removed <= touched && touched <= 2 * pairs)
      assert(removed >= 1L || pairs == 0L)
    }
  }

  test("q154 fit is partition-invariant (treeAggregate fold, no driver-side O(partitions) state)") {
    // The Gram/sum pass folds with treeAggregate; exact long addition is
    // associative, so the fit must be bit-identical under ANY input split.
    // Re-run in a sibling session whose scan splits are forced tiny (many
    // partitions) and shuffle width is coprime to the default — a
    // partition-count-dependent fold would change the collected partials.
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    val base = run("q154_pca_power_iteration").collect().map(key).sorted
    QueryCaches.drain() // force the alt run to recompute, not reuse pins
    val alt = spark.newSession()
    alt.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    alt.conf.set("spark.sql.files.openCostInBytes", "0")
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    val rows = Queries.byName("q154_pca_power_iteration")
      .run(alt, SparkTestSession.sfDir).collect().map(key).sorted
    QueryCaches.drain()
    assert(rows.toSeq == base.toSeq)
  }
}
