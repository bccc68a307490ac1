package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 continuation: mixture-planning reports — per-source drift
  * (q161), temperature-scaled sampling weights (q162), IPF raking
  * (q163). Value-level correctness is the DuckDB oracle's job; these
  * pin the mathematical properties the reports promise (bounds, mass
  * conservation, marginal fits, flattening direction).
  */
class MixturePlanningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(name: String) =
    Queries.byName(name).run(spark, SparkTestSession.sfDir)

  // ---- q161 source drift --------------------------------------------

  test("q161 TV and coverage stay in their fixed-point ranges and token mass is conserved") {
    val rows = run("q161_source_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_fp")
      val cov = r.getAs[Long]("vocab_coverage_fp")
      assert(tv >= 0L && tv <= 10000L, s"TV out of [0,1]: $r")
      assert(cov > 0L && cov <= 10000L, s"coverage out of (0,1]: $r")
      assert(r.getAs[Long]("n_terms") <= r.getAs[Long]("n_tokens"))
    }
    // every source's tokens sum to the corpus total (the grid dropped
    // or double-counted nothing)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .head.getLong(0)
    assert(total == expected)
  }

  // ---- q162 temperature mixture -------------------------------------

  test("q162 weights are a (truncated) probability vector and flatten toward uniform") {
    val rows = run("q162_temperature_mixture")
      .orderBy("source").collect()
    val ws = rows.map(_.getAs[Long]("weight_fp"))
    val ns = rows.map(_.getAs[Long]("n_tokens"))
    // Σw ≤ 1e6 with at most one truncation unit lost per source
    assert(ws.sum <= 1000000L && ws.sum > 1000000L - ws.length)
    // monotone: more tokens never means a smaller weight…
    for (i <- ns.indices; j <- ns.indices if ns(i) > ns(j))
      assert(ws(i) >= ws(j), s"weight not monotone at ${rows(i)} vs ${rows(j)}")
    // …but α=1/2 flattens: the weight ratio never exceeds the size ratio
    for (i <- ns.indices; j <- ns.indices if ns(i) > ns(j))
      assert(ws(i) * ns(j) <= ws(j) * ns(i) + 1000000L,
        s"weights steeper than proportional at ${rows(i)} vs ${rows(j)}")
    // quotas respect the 30% budget
    val budget = 3L * ns.sum / 10L
    assert(rows.map(_.getAs[Long]("quota_tokens")).sum <= budget)
    // epochs_fp is exactly (1e4·quota) div n — recomputable from the row
    rows.foreach { r =>
      assert(r.getAs[Long]("epochs_fp") ==
        10000L * r.getAs[Long]("quota_tokens") / r.getAs[Long]("n_tokens"))
    }
  }

  // ---- q163 IPF raking ----------------------------------------------

  test("q163 raked matrix fits both target marginals within truncation") {
    val rows = run("q163_ipf_raking").collect()
    val cells = rows.map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("obs_fp"), r.getAs[Long]("raked_fp"),
      r.getAs[Long]("weight_fp")))
    val nSources = cells.map(_._1).distinct.length
    val rowT = 1000000000L / nSources
    // column marginal target = observed lang share (1e9 fixed point)
    val total = cells.map(_._3).sum
    val colT = cells.groupBy(_._2).map { case (l, cs) =>
      l -> cs.map(_._3).sum * 1000000000L / total
    }
    // the LAST scaling step is the column fit → column sums match their
    // targets to within one truncation unit per cell in the column
    cells.groupBy(_._2).foreach { case (l, cs) =>
      val got = cs.map(_._5).sum
      assert(math.abs(got - colT(l)) <= cs.length + 1,
        s"column $l: raked sum $got vs target ${colT(l)}")
    }
    // row sums converged to the uniform target within 2% after 3 rounds
    cells.groupBy(_._1).foreach { case (src, cs) =>
      val got = cs.map(_._5).sum
      assert(math.abs(got - rowT) <= rowT / 50,
        s"row $src: raked sum $got vs target $rowT")
    }
    // weight column is exactly the published ratio of its own row
    cells.foreach { case (_, _, _, obs, raked, w) =>
      assert(w == raked * 1000000L / obs)
    }
    // small sources get up-weighted relative to large ones (strict only
    // when the size gap is material — equal-sized sources rake to equal
    // weights by construction)
    val bySrc = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val biggest = bySrc.maxBy(x => (x._2, x._1))._1
    val smallest = bySrc.minBy(x => (x._2, x._1))._1
    val meanW = (src: String) => {
      val cs = cells.filter(_._1 == src)
      cs.map(_._6).sum / cs.length
    }
    if (bySrc(biggest) * 9 > bySrc(smallest) * 10)
      assert(meanW(smallest) > meanW(biggest))
    else assert(meanW(smallest) >= meanW(biggest))
  }

  // ---- q169 rake apply ----------------------------------------------

  test("q169 keeps within cell budgets and publishes self-consistent shares") {
    val rows = run("q169_rake_apply").collect()
    assert(rows.nonEmpty)
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    assert(totalKept > 0L)
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 0L && kept <= r.getAs[Long]("n_docs"))
      // weight ≥ 1 ⇒ down-sampling filter passes every doc in the cell
      if (r.getAs[Long]("weight_fp") >= 1000000L)
        assert(kept == r.getAs[Long]("n_docs"), s"cell dropped docs: $r")
      // achieved share is exactly the published ratio
      assert(r.getAs[Long]("achieved_fp") == kept * 1000000000L / totalKept)
    }
    // achieved shares are a (truncated) partition of unity
    val sumAchieved = rows.map(_.getAs[Long]("achieved_fp")).sum
    assert(sumAchieved <= 1000000000L && sumAchieved > 1000000000L - rows.length)
  }

  // ---- q166 dedup ROI -----------------------------------------------

  test("q166 conserves tokens and prices removals consistently") {
    val rows = run("q166_dedup_roi").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    assert(rows.map(r => r.getAs[Long]("csize") * r.getAs[Long]("n_classes")).sum
      == docs.count())
    val corpusTokens = docs
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("tokens_total")).sum == corpusTokens)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_removed") ==
        r.getAs[Long]("n_classes") * (r.getAs[Long]("csize") - 1))
      assert(r.getAs[Long]("tokens_removed") >= 0L)
      assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("tokens_total"))
      if (r.getAs[Long]("csize") == 1L)
        assert(r.getAs[Long]("tokens_removed") == 0L)
    }
  }

  // ---- q170 source cleanliness --------------------------------------

  test("q170 rates stay in range and exact dups imply fingerprint dups") {
    val rows = run("q170_source_cleanliness").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    rows.foreach { r =>
      // identical text ⇒ identical min-md5-5-gram fingerprint, so the
      // exact-dup population is a subset of the fingerprint-dup one
      assert(r.getAs[Long]("exact_dup_docs") <= r.getAs[Long]("fpdup_docs"))
      Seq("exact_rate_fp", "fpdup_rate_fp", "span_cov_fp").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 10000L, s"$c out of range: $r")
      }
      assert(r.getAs[Long]("span_dup_tokens") <= r.getAs[Long]("n_tokens"))
    }
  }

  // ---- q174 event drift timeline ------------------------------------

  test("q174 TV stays in range and conserves event mass") {
    val rows = run("q174_event_drift_timeline").collect()
    assert(rows.nonEmpty)
    val events = Tables.load(spark, SparkTestSession.sfDir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == events)
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_fp")
      assert(tv >= 0L && tv <= 10000L, s"TV out of range: $r")
    }
  }

  // ---- q175 normalization dedup lift --------------------------------

  test("q175 lift is non-negative (raw dups are a subset of normalized dups)") {
    val rows = run("q175_normalization_dedup_lift").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    rows.foreach { r =>
      assert(r.getAs[Long]("lift_docs") >= 0L, s"negative lift: $r")
      assert(r.getAs[Long]("raw_dup_docs") <= r.getAs[Long]("norm_dup_docs"))
      assert(r.getAs[Long]("norm_dup_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  // ---- q176 LSH band sensitivity ------------------------------------

  test("q176 candidate sets nest as bands grow (contiguous-slice property)") {
    val rows = run("q176_lsh_band_sensitivity").orderBy("bands").collect()
    assert(rows.map(_.getAs[Long]("bands")).toSeq == Seq(4L, 8L, 16L))
    rows.foreach { r =>
      assert(r.getAs[Long]("bands") * r.getAs[Long]("rows_per_band") == 32L)
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_candidates"))
      val p = r.getAs[Long]("precision_fp")
      assert(p >= 0L && p <= 10000L)
    }
    // an equal 2k-row band implies both k-row halves equal, so candidates
    // (and true positives) are monotone non-decreasing in band count
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getAs[Long]("n_candidates") >= lo.getAs[Long]("n_candidates"))
        assert(hi.getAs[Long]("n_true") >= lo.getAs[Long]("n_true"))
      case _ =>
    }
  }

  // ---- q177 dup × quality interaction -------------------------------

  test("q177 partitions each source and publishes exact integer means") {
    val rows = run("q177_dup_quality_interaction").collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(rows.map(r => r.getAs[Long]("n_dup") + r.getAs[Long]("n_uniq")).sum == docs)
    rows.foreach { r =>
      Seq("mean_q_dup_fp", "mean_q_uniq_fp").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c out of range: $r")
      }
      assert(r.getAs[Long]("delta_fp") ==
        r.getAs[Long]("mean_q_uniq_fp") - r.getAs[Long]("mean_q_dup_fp"))
    }
  }

  // ---- q167 curriculum schedule -------------------------------------

  test("q167 deciles partition the corpus best-first with consistent epochs") {
    val rows = run("q167_curriculum_schedule").orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    // decile 1 holds the best scores: each decile's floor ≥ the next's ceiling
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getAs[Long]("min_score_fp") >= lo.getAs[Long]("max_score_fp"))
      case _ =>
    }
    // epoch mapping and cumulative budget
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      val expected = if (d <= 3) 1L else if (d <= 7) 2L else 3L
      assert(r.getAs[Long]("entry_epoch") == expected)
    }
    assert(rows.last.getAs[Long]("cum_tokens") ==
      rows.map(_.getAs[Long]("tokens")).sum)
  }
}
