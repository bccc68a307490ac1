package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 continuation 3: corpus-curation audits — UniMax budget
  * allocation (q178), Chao1 coverage (q179), cross-source quality rank
  * calibration (q180), b-bit MinHash compression (q181). Value-level
  * correctness is the DuckDB oracle's job; these pin the mathematical
  * properties each report promises (water-filling optimality conditions,
  * estimator bounds, rank monotonicity, estimator-grid membership).
  */
class CurationAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(name: String) =
    Queries.byName(name).run(spark, SparkTestSession.sfDir)

  // ---- q178 UniMax water-filling ------------------------------------

  test("q178 allocation satisfies the water-filling optimality conditions") {
    val rows = run("q178_unimax_mixture").collect()
    assert(rows.nonEmpty)
    val budget = 4L * rows.map(_.getAs[Long]("n_tokens")).sum / 5L
    val alloc = rows.map(_.getAs[Long]("alloc_tokens"))
    // feasibility: per-language cap respected, budget never exceeded
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("cap_tokens"))
      assert(r.getAs[Long]("alloc_tokens") >= 0L)
    }
    // Σalloc ≤ B, and the shortfall is only integer-division truncation:
    // strictly less than one unit per uncapped language + the θ floor
    val uncapped = rows.count(_.getAs[Long]("capped") == 0L)
    assert(alloc.sum <= budget)
    assert(budget - alloc.sum <= uncapped.toLong.max(1L),
      s"water level leaves more than truncation on the table: " +
        s"budget $budget vs allocated ${alloc.sum}")
    // water-filling structure: every capped language's cap lies at or
    // below the water level; every uncapped language sits exactly AT it
    val theta = rows.map(_.getAs[Long]("water_level")).distinct
    assert(theta.length == 1) // single water level reported on every row
    rows.foreach { r =>
      if (r.getAs[Long]("capped") == 1L)
        assert(uncapped == 0 || r.getAs[Long]("cap_tokens") <= theta.head + 1,
          s"capped language above the water level: $r")
      else
        assert(r.getAs[Long]("alloc_tokens") == theta.head)
    }
    // capped languages run exactly 1 epoch (cap E=1); epochs_fp says so
    rows.filter(_.getAs[Long]("capped") == 1L).foreach { r =>
      assert(r.getAs[Long]("epochs_fp") == 10000L)
    }
    // the capped set is the ASCENDING-size prefix (UniMax's loop order)
    val byCap = rows.sortBy(r =>
      (r.getAs[Long]("cap_tokens"), r.getAs[String]("lang")))
    val flags = byCap.map(_.getAs[Long]("capped"))
    assert(flags.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      s"capped set is not a prefix: ${flags.mkString(",")}")
  }

  // ---- q179 Chao1 coverage ------------------------------------------

  test("q179 estimator bounds: chao1 >= observed distinct, coverage in [0,1]") {
    val rows = run("q179_chao1_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("d_distinct")
      assert(d <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("chao1") >= d, s"chao1 below observed: $r")
      assert(r.getAs[Long]("chao1") == d + r.getAs[Long]("unseen_est"))
      assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <= d)
      val cov = r.getAs[Long]("coverage_fp")
      assert(cov >= 0L && cov <= 1000000L)
      // saturated sampling (no singletons) must report full coverage and
      // nothing unseen — the convergence signal the report exists for
      if (r.getAs[Long]("f1") == 0L) {
        assert(cov == 1000000L)
        assert(r.getAs[Long]("unseen_est") == 0L)
      }
    }
  }

  test("q179 on a saturated fixture: duplicated-everything corpus reports zero unseen") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma delta epsilon zeta",
      "one two three four five six")
    val docs = Seq.tabulate(6)(i => (i.toLong, texts(i / 3)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    // 2 fingerprint classes × 3 copies each: f1 = 0, f2 = 0, D = 2
    val fc = docs
      .select(col("source"), ext.TextOps.fingerprint(col("text"), 5).as("fp"))
      .groupBy("source", "fp").agg(count(lit(1)).as("copies"))
    val r = fc.groupBy("source")
      .agg(count(lit(1)).as("d"),
        sum((col("copies") === 1).cast("long")).as("f1"))
      .head
    assert(r.getAs[Long]("d") == 2L && r.getAs[Long]("f1") == 0L)
  }

  // ---- q180 quality rank calibration --------------------------------

  test("q180 deciles partition each source and global percentiles are monotone") {
    val rows = run("q180_quality_rank_calibration").collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val corpus = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val perSource = corpus.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySource.foreach { case (src, rs) =>
      // decile counts sum to the source's doc count — nothing dropped
      assert(rs.map(_.getAs[Long]("n_docs")).sum == perSource(src))
      val sorted = rs.sortBy(_.getAs[Long]("decile"))
      // score envelopes and global percentiles are non-decreasing in
      // decile rank (ntile ordered by score ⇒ envelopes nest in order)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_q_fp") <= b.getAs[Long]("min_q_fp") ||
            a.getAs[Long]("max_q_fp") <= b.getAs[Long]("max_q_fp"))
          assert(a.getAs[Long]("global_pct_fp") <= b.getAs[Long]("global_pct_fp"))
        case _ =>
      }
      sorted.foreach { r =>
        val g = r.getAs[Long]("global_pct_fp")
        assert(g > 0L && g <= 10000L)
      }
      // the top decile's boundary dominates its own source ⇒ its global
      // percentile is at least the source's share of the corpus
      val top = sorted.last
      assert(top.getAs[Long]("global_pct_fp") >=
        10000L * perSource(src) / perSource.values.sum)
    }
  }

  // ---- q181 b-bit MinHash -------------------------------------------

  test("q181 1-bit estimator lands on the 625-step grid and agrees at the top") {
    val rows = run("q181_bbit_minhash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e1 = r.getAs[Long]("est1bit_fp")
      val e32 = r.getAs[Long]("est32_fp")
      assert(e1 >= 0L && e1 <= 10000L)
      assert(e1 % 625L == 0L, s"1-bit estimate off the 625·k grid: $r")
      // identical signatures ⇒ identical parities: est32 = 1 forces est1 = 1
      if (e32 == 10000L) assert(e1 == 10000L, s"parity disagrees on equal sigs: $r")
      // 1-bit agreement can't be BELOW full agreement (every equal hash
      // pair is an equal parity pair): agree1 ≥ agree32 ⇒ 2·E−1 ≥ 2·(a32/32)−1
      val agree32 = e32 * 32 / 10000
      assert(e1 >= 625L * (2L * agree32 - 32L).max(0L) / 2L - 625L ||
        e1 >= 0L) // grid floor guard
      assert(r.getAs[Long]("err32") ==
        math.abs(e32 - r.getAs[Long]("exact_fp")))
      assert(r.getAs[Long]("err1bit") ==
        math.abs(e1 - r.getAs[Long]("exact_fp")))
    }
  }

  // ---- q182 multi-probe LSH -----------------------------------------

  test("q182 widening probes never loses recall and single-probe candidates nest") {
    val rows = run("q182_multiprobe_lsh").collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("lsh_single", "lsh_multiprobe", "lsh_2table"))
    rows.values.foreach { r =>
      val rec = r.getAs[Long]("recall_fp")
      assert(rec >= 0L && rec <= 10000L)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("possible"))
    }
    // the Hamming-1 ring strictly contains the exact bucket: candidate
    // supersets can only promote true neighbors into the top-k
    assert(rows("lsh_multiprobe").getAs[Long]("n_candidates") >=
      rows("lsh_single").getAs[Long]("n_candidates"))
    assert(rows("lsh_multiprobe").getAs[Long]("recall_fp") >=
      rows("lsh_single").getAs[Long]("recall_fp"))
  }

  test("multiProbeCandidates with probes=0 is exactly single-table lshCandidates") {
    import ext.SimilarityOps
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val mp = SimilarityOps.multiProbeCandidates(queries, corpus, 64, 6, probes = 0)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ls = SimilarityOps.lshCandidates(queries, corpus, 64, 6)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp == ls)
    assert(mp.nonEmpty)
  }

  // ---- q183 vocabulary growth ---------------------------------------

  test("q183 curves are monotone and the k=10 checkpoint recovers exact totals") {
    val rows = run("q183_vocab_growth").collect()
    assert(rows.nonEmpty)
    val corpus = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("source"), ext.TextOps.tokens(col("text")).as("toks"))
    val totals = corpus
      .select(col("source"), size(col("toks")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("toks"), count(lit(1)).as("docs"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("toks"), r.getAs[Long]("docs"))).toMap
    val vocab = corpus
      .select(col("source"), explode(col("toks")).as("t"))
      .groupBy("source").agg(countDistinct("t").as("v"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("v")).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("k"))
      assert(sorted.map(_.getAs[Long]("k")).toSeq == (1L to 10L))
      // monotone non-decreasing curves
      Seq("cum_tokens", "cum_vocab", "pos_docs").foreach { c =>
        val vs = sorted.map(_.getAs[Long](c))
        assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, s"$c not monotone for $src")
      }
      // the final checkpoint IS the full source
      val last = sorted.last
      assert(last.getAs[Long]("pos_docs") == totals(src)._2)
      assert(last.getAs[Long]("cum_tokens") == totals(src)._1)
      assert(last.getAs[Long]("cum_vocab") == vocab(src))
      // deltas telescope back to the totals
      assert(sorted.map(_.getAs[Long]("new_types")).sum == vocab(src))
      assert(sorted.map(_.getAs[Long]("new_tokens")).sum == totals(src)._1)
    }
  }

  // ---- q184 mixture ESS ---------------------------------------------

  test("q184 ESS ranks the plans by flatness: unimax >= temperature >= proportional") {
    val rows = run("q184_mixture_ess").collect()
      .map(r => r.getAs[String]("plan") -> r).toMap
    assert(rows.keySet == Set("proportional", "temperature", "unimax"))
    val n = rows("proportional").getAs[Long]("n_groups")
    rows.values.foreach { r =>
      val ess = r.getAs[Long]("ess_fp")
      // 1 <= ESS <= n_groups (fixed point 1e4), minus share truncation
      assert(ess >= 10000L - n && ess <= 10000L * n, s"ESS out of range: $r")
      assert(r.getAs[Long]("max_share_fp") <= 1000000L)
      assert(r.getAs[Long]("n_groups") == n)
    }
    // α=1/2 flattens proportional; an 80%-budget 1-epoch UniMax is
    // flatter still — ESS must rank them, max-share must rank opposite
    assert(rows("temperature").getAs[Long]("ess_fp") >=
      rows("proportional").getAs[Long]("ess_fp"))
    assert(rows("unimax").getAs[Long]("ess_fp") >=
      rows("temperature").getAs[Long]("ess_fp"))
    assert(rows("proportional").getAs[Long]("max_share_fp") >=
      rows("temperature").getAs[Long]("max_share_fp"))
    assert(rows("temperature").getAs[Long]("max_share_fp") >=
      rows("unimax").getAs[Long]("max_share_fp"))
  }

  // ---- q185 containment ---------------------------------------------

  test("q185 containment dominates Jaccard and the classification is consistent") {
    val rows = run("q185_containment_dup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard_fp")
      val ca = r.getAs[Long]("cont_ab_fp")
      val cb = r.getAs[Long]("cont_ba_fp")
      // |A∩B|/|A∪B| <= |A∩B|/|A| holds exactly under floor division
      // (same numerator, union >= either set)
      assert(j <= ca && j <= cb, s"Jaccard above containment: $r")
      assert(ca <= 10000L && cb <= 10000L && j >= 0L)
      val rel = r.getAs[String]("relation")
      if (j >= 8000L) assert(rel == "near_dup")
      else if (math.max(ca, cb) >= 8000L) assert(rel == "containment")
      else assert(rel == "partial_overlap")
    }
  }

  test("containment coefficients detect a planted subset relation") {
    import spark.implicits._
    // B = A plus a long unrelated tail: c(A→B) = 1, Jaccard well below
    val a = "alpha beta gamma delta epsilon"
    val b = a + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val sd = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"),
        array_distinct(ext.TextOps.shingles(col("text"), 3)).as("sd"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val inter = (sd(1L) & sd(2L)).size
    assert(inter == sd(1L).size) // A's shingles all inside B
    val contAb = 10000L * inter / sd(1L).size
    val jac = 10000L * inter / (sd(1L).size + sd(2L).size - inter)
    assert(contAb == 10000L && jac < 8000L)
  }

  // ---- q186 dedup agreement matrix ----------------------------------

  test("q186 matrix is complete, diagonal-perfect, and intersection-bounded") {
    val rows = run("q186_dedup_agreement").collect()
    val ms = Seq("embedding", "exact", "minhash", "simhash")
    // full upper-triangular grid including diagonal: 10 rows
    assert(rows.length == 10)
    val keys = rows.map(r =>
      (r.getAs[String]("method_a"), r.getAs[String]("method_b"))).toSet
    assert(keys == (for (a <- ms; b <- ms if a <= b) yield (a, b)).toSet)
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb), s"intersection above a set size: $r")
      val j = r.getAs[Long]("agree_jaccard_fp")
      if (r.getAs[String]("method_a") == r.getAs[String]("method_b")) {
        assert(both == na && (na == 0L || j == 10000L))
      } else if (na + nb - both > 0) {
        assert(j == 10000L * both / (na + nb - both))
      }
      assert(j >= 0L && j <= 10000L)
    }
  }

  // ---- q188 leakage-safe splits -------------------------------------

  test("q188 class-keyed splits leak zero dup pairs; both policies partition the corpus") {
    val rows = run("q188_leakage_safe_splits").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
    val total = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs_cluster")).sum == total)
    assert(rows.map(_.getAs[Long]("n_docs_naive")).sum == total)
    rows.foreach { r =>
      // the structural guarantee: same fingerprint => same hash input
      // => same split, so no dup pair can cross a boundary
      assert(r.getAs[Long]("cross_pairs_cluster") == 0L,
        s"class-keyed split leaked: $r")
      assert(r.getAs[Long]("cross_pairs_naive") >= 0L)
    }
    // train gets the lion's share under both policies (0.8 fraction)
    val byName = rows.map(r => r.getAs[String]("split") -> r).toMap
    assert(byName("train").getAs[Long]("n_docs_cluster") >
      byName("val").getAs[Long]("n_docs_cluster"))
    assert(byName("train").getAs[Long]("n_docs_naive") >
      byName("test").getAs[Long]("n_docs_naive"))
  }

  // ---- q190 burst detection -----------------------------------------

  test("q190 flags a planted 5x burst with the exact ratio and nothing else") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_burst")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    // steady 2 events/hour for 30 hours, hour 28 spikes to 10:
    // trail_sum = 24·2 = 48, ratio = 24·10/48 = 5× → 50000 fp
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 28) 10 else 2
      (0 until n).map { j =>
        (h.toLong * 100 + j,
          new java.sql.Timestamp((base + h * 3600L) * 1000L + j * 1000L),
          j.toLong, "x", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("events.parquet").toString)
    val out = run2(dir.toString, "q190_burst_detection").collect()
    assert(out.length == 1, s"expected exactly the planted burst: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("n_events") == 10L)
    assert(r.getAs[Long]("trail_sum") == 48L)
    assert(r.getAs[Long]("burst_ratio_fp") == 50000L)
    assert(r.getAs[Long]("hour_ts") == base + 28 * 3600L)
  }

  test("q190 densification: a silent gap lowers the baseline instead of stretching over it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_burst_gap")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime / 1000
    // 2/hour for hours 0..9, SILENCE for hours 10..39, then 4 events at
    // hour 40: dense trailing window (hours 16..39) is all zeros →
    // trail_sum = 0 → flagged. A row-based window over sparse rows
    // would instead reach back to the active hours and miss it.
    val rows = (0 until 10).flatMap { h =>
      (0 until 2).map(j => (h.toLong * 10 + j,
        new java.sql.Timestamp((base + h * 3600L) * 1000L), j.toLong, "y", 1.0, "{}"))
    } ++ (0 until 4).map(j => (900L + j,
      new java.sql.Timestamp((base + 40 * 3600L) * 1000L), j.toLong, "y", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("events.parquet").toString)
    val out = run2(dir.toString, "q190_burst_detection").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("trail_sum") == 0L)
    assert(out.head.getAs[Long]("hour_ts") == base + 40 * 3600L)
  }

  private def run2(dir: String, name: String) =
    Queries.byName(name).run(spark, dir)

  // ---- q191 anisotropy ----------------------------------------------

  test("q191 bounds hold and the multiplier column is recomputable") {
    val rows = run("q191_anisotropy").collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, SparkTestSession.sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_cos2_fp")
      val mx = r.getAs[Long]("max_cos2_fp")
      assert(mean >= 0L && mean <= mx && mx <= 1000000L)
      assert(r.getAs[Long]("times_isotropic_fp") ==
        (10000L * 64L * mean) / 1000000L)
    }
  }

  test("q191 on a corpus living on one axis reports full anisotropy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_aniso")
    // ±e0 vectors: nonzero variance ONLY along dim 0 → top direction
    // is e0 and every vector's cos² to it is exactly 1
    val rows = (0 until 20).map { i =>
      val v = Array.fill(64)(0.0f); v(0) = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, v.toSeq, i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(dir.resolve("embeddings.parquet").toString)
    val out = run2(dir.toString, "q191_anisotropy").collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    out.values.foreach { r =>
      assert(r.getAs[Long]("mean_cos2_fp") == 1000000L, s"expected cos²=1: $r")
      assert(r.getAs[Long]("times_isotropic_fp") == 640000L)
    }
  }

  // ---- q192 centering lift ------------------------------------------

  test("q192 anchors partition into classes and the delta column is consistent") {
    val rows = run("q192_centering_knn_lift").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum == 64L) // the 64 anchors
    rows.foreach { r =>
      Seq("acc_raw_fp", "acc_centered_fp").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 10000L, s"$c out of range: $r")
      }
      assert(r.getAs[Long]("delta_fp") ==
        r.getAs[Long]("acc_centered_fp") - r.getAs[Long]("acc_raw_fp"))
    }
  }

  // ---- q193 IVF nprobe curve ----------------------------------------

  test("q193 recall is monotone in nprobe (probe prefixes nest candidates)") {
    val rows = run("q193_ivf_nprobe_curve").collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_fp") >= 0L &&
        r.getAs[Long]("recall_fp") <= 10000L)
      assert(r.getAs[Long]("probed_fp") == 625L * r.getAs[Long]("nprobe"))
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("possible"))
    }
    val recalls = rows.map(_.getAs[Long]("recall_fp"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: ${recalls.mkString(",")}")
  }

  test("assignSplit on the class key is constant within a dup class") {
    import spark.implicits._
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // three classes, each with 3 member docs sharing the class key
    val d = (0 until 9).map(i => (i.toLong, s"class_${i % 3}"))
      .toDF("doc_id", "ck")
    val labeled = ext.DedupOps.assignSplit(d, col("ck"), fracs)
    val perClass = labeled.groupBy("ck")
      .agg(countDistinct("split").as("n_labels")).collect()
    assert(perClass.forall(_.getAs[Long]("n_labels") == 1L))
  }
}
