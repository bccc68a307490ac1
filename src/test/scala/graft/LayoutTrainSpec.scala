package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ParquetSink
import graft.ext.{ClassifierOps, ExactSubstrOps}
import graft.functions.ZOrder

/** Round-7 additions: ExactSubstr span profiling, in-engine classifier
  * training, Z-order clustered layout. */
class LayoutTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- ExactSubstrOps ------------------------------------------------

  private val shared10 = "a b c d e f g h i j" // 10-token shared passage

  test("dupSpanProfile merges overlapping grams into one maximal span") {
    // two docs share a 10-token passage; with l=8 that is 3 duplicated
    // grams per doc (positions 1..3 resp. 0..2), one island each
    val docs = Seq(
      (1L, s"x $shared10 y z w q r s t"),
      (2L, s"$shared10 p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
        l = 8, mergeGap = 0)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    // doc 1: span covers positions 1..10 (10 tokens); doc 2: 0..9
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 10L) // n_spans, dup_tokens
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 10L)
    // coverage: doc 1 has 18 tokens -> (10000*10) div 18 = 5555
    assert(out(0).getLong(4) == 5555L)
  }

  test("dupSpanProfile separates non-contiguous spans and counts within-doc repeats") {
    // one doc containing the same 8-gram twice with a unique gap:
    // both occurrences are duplicated grams (corpus count 2), two islands
    val eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq((7L, s"$eight u1 u2 u3 u4 $eight")).toDF("doc_id", "text")
    val out = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 8, mergeGap = 0).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L)  // two spans
    assert(out(0).getLong(2) == 16L) // 8 + 8 duplicated tokens
  }

  test("dupSpanProfile windows share one exchange and one sort") {
    // the island cumsum consumes the running-max window's output, so
    // the two Window nodes cannot fuse — but they must PIPELINE over a
    // single (doc_id, pos) exchange+sort, never re-partition or re-sort
    // between them (PLANS.md round-7 claim, pinned here)
    val plan = ExactSubstrOps.dupSpanProfile(
        Seq((1L, s"x $shared10 y z"), (2L, s"$shared10 p q"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), l = 8, mergeGap = 0)
      .queryExecution.executedPlan.toString
    val first = plan.indexOf("Window [")
    val second = plan.indexOf("Window [", first + 1)
    assert(first >= 0 && second > first, plan.take(2000))
    val between = plan.substring(first, second)
    assert(!between.contains("Exchange") && !between.contains("Sort ["),
      between)
  }

  test("dupSpanProfile: longer gram floor + span-merge distance (the Lee et al. regime)") {
    // Two docs share a 24-token boilerplate block, but doc 2 has a
    // ONE-token edit in the middle (the paper's motivating case): the
    // duplicated region splits into two ~11-token halves around the
    // edit. Each token appears in both docs, so every l-gram that
    // avoids the edit is corpus-duplicated.
    val half1 = (1 to 11).map(i => s"b$i").mkString(" ")  // 11 tokens
    val half2 = (12 to 23).map(i => s"b$i").mkString(" ") // 12 tokens
    val docA = s"$half1 same $half2"                       // 24 tokens
    val docB = s"$half1 EDIT $half2"                       // 24 tokens
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")

    // l=8, mergeGap=0: two islands per doc (the edit breaks contiguity
    // when the gram can't span it... with l=8, grams within each half)
    val strict = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 8, minOccurrences = 2L, mergeGap = 0)
      .orderBy("doc_id").collect()
    assert(strict.length == 2)
    assert(strict.forall(_.getLong(1) == 2L), // n_spans = 2: split at the edit
      strict.mkString(","))

    // mergeGap=4 absorbs the 2-token hole between the two covers:
    // ONE maximal span per doc, covering the whole 24-token block
    val merged = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 8, minOccurrences = 2L, mergeGap = 4)
      .orderBy("doc_id").collect()
    assert(merged.length == 2)
    assert(merged.forall(_.getLong(1) == 1L), merged.mkString(","))
    assert(merged.forall(_.getLong(2) == 24L)) // dup_tokens spans the block

    // l=20 match floor: an 11/12-token repeat is BELOW the floor on the
    // edited pair — only a doc pair sharing >= 20 verbatim tokens hits
    assert(ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 20, minOccurrences = 2L).isEmpty)
    val verbatim = Seq((1L, docA), (2L, docA + " tail1 tail2")).toDF("doc_id", "text")
    val long = ExactSubstrOps.dupSpanProfile(verbatim, col("doc_id"), col("text"),
      l = 20, minOccurrences = 2L).orderBy("doc_id").collect()
    assert(long.length == 2 && long.forall(_.getLong(2) == 24L))
  }

  test("dupSpanProfile is empty when nothing repeats") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    assert(ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 8, mergeGap = 0).isEmpty)
  }

  test("crossContamination flags only train spans that occur in the " +
    "benchmark slice, and merges them into maximal spans") {
    // bench doc carries the 10-token passage; train doc 2 embeds it
    // (3 duplicated 8-grams -> one 10-token island); train doc 3 is
    // clean; a passage shared ONLY between two train docs (docs 3/4)
    // must NOT count as contamination
    val trainShared = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (1L, true, s"$shared10 bench tail one two"),
      (2L, false, s"x $shared10 y z w"),
      (3L, false, s"$trainShared clean u v w"),
      (4L, false, s"$trainShared other m n o")
    ).toDF("doc_id", "is_bench", "text")
    val out = ExactSubstrOps.crossContamination(docs, col("doc_id"),
      col("text"), col("is_bench")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    val r = out.head
    // n_spans = 1, contam_tokens = 10, n_tokens = 14 -> fp = 7142
    assert(r.getLong(1) == 1L && r.getLong(2) == 10L && r.getLong(3) == 14L)
    assert(r.getLong(4) == 7142L)
  }

  test("stripDupSpans removes the shared passage and keeps the rest verbatim") {
    val docs = Seq(
      (1L, s"x $shared10 y z w q r s t"),
      (2L, s"$shared10 p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = ExactSubstrOps.stripDupSpans(docs, col("doc_id"), col("text"),
        l = 8, mergeGap = 0)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(4) == "x y z w q r s t")
    assert(out(1).getString(4) == "p q r s t u v w")
    assert(out(0).getLong(2) == 8L && out(0).getLong(3) == 10L) // kept, removed
  }

  test("stripDupSpans reports fully duplicated docs as kept 0, empty text") {
    val eight = "d1 d2 d3 d4 d5 d6 d7 d8"
    val docs = Seq((1L, eight), (2L, eight)).toDF("doc_id", "text")
    val out = ExactSubstrOps.stripDupSpans(docs, col("doc_id"), col("text"),
        l = 8, mergeGap = 0)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 8L
      && r.getString(4) == ""))
  }

  test("stripDupSpansKeepOne keeps the canonical copy and strips the rest") {
    // exact-dup pair: keep-one leaves doc 1 (min id) untouched — it is
    // absent from the output — and empties doc 2
    val eight = "d1 d2 d3 d4 d5 d6 d7 d8"
    val pair = Seq((1L, eight), (2L, eight)).toDF("doc_id", "text")
    val out = ExactSubstrOps.stripDupSpansKeepOne(pair, col("doc_id"),
        col("text"), l = 8, mergeGap = 0)
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 2L)
    assert(out(0).getLong(2) == 0L && out(0).getString(4) == "")
    // shared passage: doc 1 keeps it, doc 2 loses only the passage
    val docs = Seq(
      (1L, s"x $shared10 y z w q r s t"),
      (2L, s"$shared10 p q r s t u v w")
    ).toDF("doc_id", "text")
    val out2 = ExactSubstrOps.stripDupSpansKeepOne(docs, col("doc_id"),
        col("text"), l = 8, mergeGap = 0)
      .collect()
    assert(out2.length == 1 && out2(0).getLong(0) == 2L)
    assert(out2(0).getString(4) == "p q r s t u v w")
  }

  test("stripDupSpansKeepOne at mergeGap>0: canonical block survives " +
    "verbatim including its gap token; the near-copy loses its edit too") {
    // Two docs sharing "a b c … d e f" around a one-token edit. At l=3
    // the edit splits the duplicated grams into two islands separated
    // by one clean token — within mergeGap=2, so BOTH the dup spans and
    // the canonical spans gap-merge. Pinned semantics: the canonical
    // doc's merged block survives whole (its gap token X is canonical
    // by the same merge), while the non-canonical doc is stripped
    // across the merged span INCLUDING its edit token Y — a one-token
    // edit inside near-duplicated boilerplate leaves no debris.
    val docs = Seq(
      (1L, "a b c X d e f"),
      (2L, "a b c Y d e f")
    ).toDF("doc_id", "text")
    val merged = ExactSubstrOps.stripDupSpansKeepOne(docs, col("doc_id"),
        col("text"), l = 3, mergeGap = 2)
      .collect()
    assert(merged.length == 1 && merged(0).getLong(0) == 2L)
    assert(merged(0).getLong(2) == 0L && merged(0).getLong(3) == 7L
      && merged(0).getString(4) == "")
    // contrast at mergeGap=0: islands stay separate, so doc 2's edit
    // token is NOT covered and survives as debris
    val unmerged = ExactSubstrOps.stripDupSpansKeepOne(docs, col("doc_id"),
        col("text"), l = 3, mergeGap = 0)
      .collect()
    assert(unmerged.length == 1 && unmerged(0).getLong(0) == 2L)
    assert(unmerged(0).getLong(2) == 1L && unmerged(0).getString(4) == "Y")
  }

  test("ExactSubstr production defaults are the linear operating point (l=20, mergeGap=4)") {
    // The default path must be the regime that stays linear at corpus
    // scale (the ×1000 rehearsal measured 8-grams disk-bound at 19×/10×
    // and l=20+mergeGap at 10.6×/10×): default-arg calls ≡ explicit
    // (l=20, mergeGap=4) on a fixture where the settings disagree —
    // a 24-token verbatim block (above the 20 floor, below 2×8-gram
    // coverage differences) plus an edited copy whose halves fall
    // BELOW the 20 floor but above the 8 floor.
    assert(ExactSubstrOps.DefaultL == 20 && ExactSubstrOps.DefaultMergeGap == 4)
    val block = (1 to 24).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block tail1 tail2"),
      (2L, s"$block other1 other2"),
      (3L, s"${(1 to 11).map(i => s"c$i").mkString(" ")} EDIT tailA tailB")
    ).toDF("doc_id", "text")
    val byDefault = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val explicit20 = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
        l = 20, minOccurrences = 2L, mergeGap = 4)
      .orderBy("doc_id").collect()
    assert(byDefault.toSeq == explicit20.toSeq)
    // doc 3's 11-token prefix repeat is below the 20 floor: only the
    // two verbatim block carriers appear
    assert(byDefault.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(byDefault.forall(_.getLong(2) == 24L))
    // the 8-gram setting (pinned by the q139 oracle) flags doc 3 too —
    // the fixture really distinguishes the operating points
    val fine = ExactSubstrOps.dupSpanProfile(docs, col("doc_id"), col("text"),
      l = 8, mergeGap = 0).collect()
    assert(fine.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("shared-frame ExactSubstr paths are identical to the standalone operators") {
    // q139/q143/q145 answer off one session-shared dupOccurrences +
    // mergedSpans build; the composition must be bit-identical to the
    // self-contained operators at the same (l, mergeGap)
    val docs = Seq(
      (1L, s"x $shared10 y z w q r s t"),
      (2L, s"$shared10 p q r s t u v w"),
      (3L, "lone doc with no repeats at all here ok")
    ).toDF("doc_id", "text")
    val dupOcc = ExactSubstrOps.dupOccurrences(docs, col("doc_id"),
      col("text"), l = 8, minOccurrences = 2L).persist()
    val spans = ExactSubstrOps.mergedSpans(dupOcc, l = 8, mergeGap = 0)
    try {
      val prof = ExactSubstrOps.profileFromSpans(spans)
        .orderBy("doc_id").collect().toSeq
      val profStandalone = ExactSubstrOps.dupSpanProfile(docs,
          col("doc_id"), col("text"), l = 8, mergeGap = 0)
        .orderBy("doc_id").collect().toSeq
      assert(prof == profStandalone)
      val strip = ExactSubstrOps.stripFromSpans(docs, col("doc_id"),
          col("text"), spans, l = 8)
        .orderBy("doc_id").collect().toSeq
      val stripStandalone = ExactSubstrOps.stripDupSpans(docs,
          col("doc_id"), col("text"), l = 8, mergeGap = 0)
        .orderBy("doc_id").collect().toSeq
      assert(strip == stripStandalone)
      val keepOne = ExactSubstrOps.keepOneFromFrames(docs, col("doc_id"),
          col("text"), dupOcc, spans, l = 8, mergeGap = 0)
        .orderBy("doc_id").collect().toSeq
      val keepOneStandalone = ExactSubstrOps.stripDupSpansKeepOne(docs,
          col("doc_id"), col("text"), l = 8, mergeGap = 0)
        .orderBy("doc_id").collect().toSeq
      assert(keepOne == keepOneStandalone)
    } finally dupOcc.unpersist(false)
  }

  test("cdcChunks boundaries are content-defined: an early edit leaves later chunks intact") {
    import graft.ext.TextOps
    // a long pseudo-random token stream chunked two ways: original, and
    // with one token inserted near the front. Content-defined
    // boundaries re-synchronize after the edit, so most chunk digests
    // survive; a fixed grid would shift every downstream chunk.
    val words = (0 until 400).map(i => s"w${(i * 2654435761L) % 997}")
    val orig = words.mkString(" ")
    val edited = (words.take(3) ++ Seq("INSERTED") ++ words.drop(3)).mkString(" ")
    def digests(text: String, docId: Long) =
      TextOps.cdcChunks(Seq((docId, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .select("digest").as[String].collect().toSet
    val a = digests(orig, 1L)
    val b = digests(edited, 2L)
    val surviving = (a intersect b).size.toDouble / a.size
    assert(a.size >= 3, s"fixture too short: ${a.size} chunks")
    assert(surviving >= 0.5, s"only ${(surviving * 100).round}% of chunks survived the edit")
  }

  // ---- ClassifierOps -------------------------------------------------

  test("hard-sigmoid LR separates a linearly separable cloud") {
    // y = 1 iff x1 + x2 > 0; standardized-ish inputs around +-1
    val rows = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 1.0 + (i % 7) * 0.1 else -1.0 - (i % 5) * 0.1
      val x2 = if (i % 3 == 0) 0.5 else -0.25
      (if (x1 + x2 > 0) 1.0 else 0.0, x1, x2)
    }
    val f = rows.toDF("y", "x1", "x2")
    val w = ClassifierOps.fitHardSigmoidLR(f, Seq("x1", "x2"), "y", iters = 10, lr = 2.0)
    val scored = f.select(col("y"),
      ClassifierOps.score(w.toSeq, Seq("x1", "x2")).as("p"))
    val acc = scored.agg(avg(when(
      (col("p") >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc with weights ${w.toSeq}")
    assert(w(1) > 0) // the dominant feature gets a positive weight
  }

  test("grouped fit learns independent, opposite models per group") {
    // group A: y = 1 iff x > 0; group B: y = 1 iff x < 0. A pooled model
    // cannot fit both; independent per-group models learn opposite signs.
    val rows = (0 until 100).flatMap { i =>
      val x = if (i % 2 == 0) 1.0 + (i % 5) * 0.2 else -1.0 - (i % 5) * 0.2
      Seq(("A", if (x > 0) 1.0 else 0.0, x), ("B", if (x < 0) 1.0 else 0.0, x))
    }
    val f = rows.toDF("g", "y", "x")
    val w = ClassifierOps.fitGroupedHardSigmoidLR(f, "g", Seq("x"), "y",
      iters = 8, lr = 2.0).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w("A") > 0.5 && w("B") < -0.5, s"weights $w")
    // and the fitted models classify their own group correctly
    val scored = f.join(broadcast(ClassifierOps.fitGroupedHardSigmoidLR(
        f, "g", Seq("x"), "y", iters = 8, lr = 2.0)), "g")
      .select(col("y"),
        ClassifierOps.hardSigmoid(col("_w0") + col("x") * col("_w1")).as("p"))
    val acc = scored.agg(avg(when(
      (col("p") >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(acc == 1.0, s"grouped accuracy $acc")
  }

  test("hardSigmoid clamps to [0, 1] and is 0.5 at z = 0") {
    val out = Seq(-10.0, -2.0, 0.0, 2.0, 10.0).toDF("z")
      .select(ClassifierOps.hardSigmoid(col("z")).as("p"))
      .as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.0, 0.5, 1.0, 1.0))
  }

  // ---- ZOrder --------------------------------------------------------

  test("interleave16 places a-bits at even and b-bits at odd positions") {
    val out = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(out == Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0xFFFFFFFFL))
  }

  test("grid16 maps range edges to grid edges and clamps outliers") {
    val out = Seq(0L, 50L, 100L, -5L, 120L).toDF("v")
      .select(ZOrder.grid16(col("v"), lit(0L), lit(100L)).as("g"))
      .as[Long].collect().toSeq
    assert(out(0) == 0L && out(2) == 65535L)
    assert(out(1) == 50L * 65535L / 100L)
    assert(out(3) == 0L && out(4) == 65535L) // clamped
  }

  test("writeZOrdered keeps per-file min/max narrow on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.load(spark, SparkTestSession.sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    ParquetSink.writeZOrdered(li, "l_partkey", "l_suppkey", 8, s"$dir/z")
    // insertion-order baseline: same file count, no clustering
    li.repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/lin")
    def meanBoxArea(path: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("pw"),
          (max("l_suppkey") - min("l_suppkey")).as("sw"))
      stats.agg(avg(col("pw") * col("sw"))).head().getDouble(0)
    }
    val (zArea, linArea) = (meanBoxArea(s"$dir/z"), meanBoxArea(s"$dir/lin"))
    // a Z-clustered file covers a small cell of the (partkey, suppkey)
    // grid; insertion order covers nearly the full rectangle per file
    assert(zArea < linArea / 2, s"z=$zArea lin=$linArea")
  }
}
