package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Training-set assembly operators: benchmark decontamination and
  * sequence packing — the steps between "cleaned corpus" and "batches
  * on the trainer".
  *
  * Scale shapes: decontamination is one shingle-explode of the corpus
  * joined against a BROADCAST benchmark shingle set (the benchmark is
  * eval data — thousands of docs, not billions); packing is one window
  * cumsum per shard, shuffling each doc row once on its shard key.
  */
object TrainingSetOps {

  /** Flags corpus documents that share any k-token shingle with the
    * benchmark set (the standard n-gram-collision decontamination
    * test). Returns (doc_id, contaminated). The benchmark side is
    * deduplicated and broadcast; the corpus explodes once and
    * left-semi-joins per shingle, then flags by membership — no row
    * amplification survives the aggregation. */
  def contaminationFlags(corpus: DataFrame, id: Column, text: Column,
                         benchmark: DataFrame, btext: Column,
                         k: Int = 8): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.shingles(btext, k)).as("__sh"))
      .distinct()
    val hits = corpus
      .select(id.as("doc_id"), explode(TextOps.shingles(text, k)).as("__sh"))
      .join(broadcast(benchShingles), Seq("__sh"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    corpus.select(id.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** GPT-style sequence packing plan: concatenate each shard's
    * documents in id order and cut every `budget` tokens. Emits, per
    * document, the first and last training-sequence index it lands in
    * (a document may straddle a cut). One window cumsum per shard —
    * the shard count bounds window-partition size, so no global sort
    * and no single-partition window at corpus scale. */
  def packSequences(df: DataFrame, id: Column, text: Column,
                    budget: Int, shards: Int = 64): DataFrame =
    packSequencesByCount(df, id, TextOps.tokenCount(text), budget, shards)

  /** [[packSequences]] over a PRE-COMPUTED token-count column — the
    * form pipeline stages use when counts already exist (curation
    * carries them), so the text is never re-tokenized. */
  def packSequencesByCount(df: DataFrame, id: Column, nTokens: Column,
                           budget: Int, shards: Int = 64): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    df.select(id.as("doc_id"),
        pmod(id.cast(LongType), lit(shards.toLong)).as("shard"),
        nTokens.cast(LongType).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("seq_first"),
        floor((col("cum") - 1) / budget).as("seq_last"))
  }

  /** Cross-document boilerplate removal (the C4-style line filter): a
    * line whose trimmed form appears in at least `minDocs` distinct
    * documents is boilerplate (nav bars, cookie banners, footers) and is
    * dropped from every document; documents left with no lines drop out
    * entirely. Returns (doc_id, text).
    *
    * Scale shape: one posexplode of the corpus into lines, one map-side-
    * combinable distinct-doc count per line, an anti-join of the line
    * table against the boilerplate set (tiny by construction — only
    * lines repeated across `minDocs`+ documents survive the HAVING — so
    * AQE broadcasts it), and one groupBy(doc) reassembly. Nothing
    * collects at the driver. */
  def removeBoilerplate(df: DataFrame, id: Column, text: Column,
                        minDocs: Int = 3): DataFrame = {
    val lines = df.select(id.as("doc_id"),
      posexplode(split(text, "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .groupBy(trim(col("line")).as("nline"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("nline")
    lines.join(boiler, trim(col("line")) === col("nline"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("text"))
  }

  /** Paragraph-level exact dedup across the corpus (the "deduplicating
    * training data" granularity, on paragraph units): every repeated
    * (trimmed) paragraph keeps only its FIRST global occurrence — in
    * (doc_id, position) order — and all later copies are cut from their
    * documents; documents left with nothing drop out.
    *
    * Scale shape: one posexplode, one shuffle on the paragraph key with
    * a per-key window (partition size = the copy count of ONE paragraph,
    * never the corpus), one groupBy(doc) reassembly. Empty paragraphs
    * are filtered before the shuffle so the degenerate hot key never
    * exists; a corpus-wide boilerplate paragraph IS its own hot key —
    * run [[removeBoilerplate]] first when that's the concern. */
  def dedupParagraphs(df: DataFrame, id: Column, text: Column,
                      sep: String = "\n"): DataFrame = {
    val pars = df.select(id.as("doc_id"),
        posexplode(split(text, sep)).as(Seq("pos", "par")))
      .filter(trim(col("par")) =!= "")
    val w = Window.partitionBy(trim(col("par"))).orderBy("doc_id", "pos")
    pars.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("par")))),
          x => x.getField("par")), sep).as("text"))
  }

  /** Quality-ordered token-budget curation: keep documents in global
    * (quality DESC, id ASC) order while the running token total stays
    * within `budget` — "take the best N tokens" corpus selection.
    *
    * The naive plan is a single global window cumsum, which serializes
    * the whole corpus through ONE partition. This is the two-phase
    * scale shape instead: quality is bucketized (`buckets` quantized
    * levels), per-bucket token totals are aggregated (map-side
    * combined, ≤ `buckets` rows), the tokens-in-strictly-better-buckets
    * offset comes from a window over that TINY frame (the only
    * single-partition window, bounded by the bucket count, never by
    * data size), and the within-bucket cumsum runs partitioned by
    * bucket. Bucket = floor(quality·buckets) is monotone in quality, so
    * (bucket DESC, quality DESC, id) is exactly the global order — the
    * DuckDB oracle computes the single global cumsum and the gate
    * proves the equivalence. Caveat: a corpus whose quality mass sits
    * in one bucket degrades to the naive shape; raise `buckets` to
    * match quality granularity. */
  def curateByBudget(df: DataFrame, id: Column, quality: Column,
                     tokens: Column, budget: Long,
                     buckets: Int = 1000): DataFrame = {
    val base = df.select(id.as("doc_id"), quality.cast(DoubleType).as("q"),
        tokens.cast(LongType).as("n_tokens"))
      .withColumn("qb",
        least(floor(col("q") * buckets), lit(buckets.toLong - 1)).cast(LongType))
    // Both consumers of `base` (the per-bucket totals and the final
    // within-bucket cumsum) hang off the SAME hash(qb) window below:
    // the bucket total is max(running sum) per bucket, so the plan has
    // one canonical Exchange(hash(qb)) subtree and Spark's exchange
    // reuse evaluates the (expensive — quality/token scoring) input
    // scan once instead of twice. Measured 2× on q57's regex-heavy base.
    val wIn = Window.partitionBy("qb").orderBy(col("q").desc, col("doc_id"))
    val withCum = base.withColumn("cumIn", sum("n_tokens").over(wIn))
    val perBucket = withCum.groupBy("qb").agg(max("cumIn").as("btok"))
    val wAbove = Window.orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val above = perBucket
      .withColumn("above", coalesce(sum("btok").over(wAbove), lit(0L)))
      .select("qb", "above")
    withCum.join(broadcast(above), Seq("qb"))
      .filter(col("above") + col("cumIn") <= budget)
      .select("doc_id", "q", "n_tokens")
  }

  /** Drops documents containing any blocklisted domain (suffix match —
    * subdomains of a blocked entry are blocked). Narrow filter, zero
    * shuffle; the blocklist is policy metadata inlined as literals. */
  def domainBlocklistFilter(df: DataFrame, text: Column,
                            blocked: Seq[String]): DataFrame =
    df.filter(!TextOps.domainBlocked(text, blocked))

  /** Incremental corpus dedup: of an `incoming` batch, keep only
    * documents that are (a) not already in the `reference` corpus (by
    * exact digest) and (b) not duplicated WITHIN the batch (first id
    * wins) — the "don't re-add what the training set already has"
    * step of a snapshot-to-snapshot refresh.
    *
    * Scale shape: one digest projection per side, an anti-join on the
    * digest key (shuffle or broadcast depending on reference digest
    * cardinality — at 100 TB the reference side ships ONLY digests,
    * never text), and a per-digest first-id window whose partition is
    * one digest's copy count. */
  def incrementalDedup(incoming: DataFrame, reference: DataFrame,
                       id: Column, text: Column,
                       refText: Column): DataFrame = {
    val inc = incoming.withColumn("__digest", md5(text))
    val refDigests = reference.select(md5(refText).as("__digest")).distinct()
    val w = Window.partitionBy("__digest").orderBy(id)
    inc.join(refDigests, Seq("__digest"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__digest", "__rn")
  }

  /** Deterministic exact-k sample per group: ranks each group's rows by
    * the portable (id, salt) hash and keeps the first k — "give me
    * exactly k docs per domain, the same k on every run/engine/cluster
    * size". One shuffle on the group key; per-group window partitions
    * are group-sized (use when groups ≪ corpus; for heavy groups the
    * mixture resampler's threshold form avoids the window entirely). */
  def sampleExactPerGroup(df: DataFrame, group: Column, id: Column, k: Int,
                          salt: String = "sample"): DataFrame = {
    val u = PortableHash.base(concat(id.cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(group).orderBy(u.asc, id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weight-proportional deterministic Bernoulli sample: row kept iff
    * its portable-hash uniform falls below weight/maxWeight, so the
    * heaviest row is always kept and every other row survives with
    * probability proportional to its weight — same rows on every run,
    * engine, and cluster size. The comparison is pure integer
    * cross-multiplication (no float ratio), and maxWeight is a 1-row
    * broadcast; the filter itself is a narrow projection over the
    * corpus scan.
    *
    * Preconditions (caller-owned, same headroom contract as
    * [[graft.analytics.RegressionOps]]' integer sums): weights must be
    * non-negative longs with `max(weight) < Long.MaxValue / 1e6` —
    * the `(u % 1e6) * maxWeight` cross-multiplication overflows past
    * that (~9.2e12) and silently corrupts keep decisions. The uniform
    * also carries a ~0.05% modulo bias (PortableHash's modulus is not
    * a multiple of 1e6) — irrelevant for curation sampling, but don't
    * use this as a statistical RNG. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     salt: String = "wsample"): DataFrame = {
    val mx = df.agg(max(weight).as("__maxw"))
    val u = PortableHash.base(concat(id.cast("string"), lit(":" + salt)))
    df.crossJoin(broadcast(mx))
      .filter((u % 1000000L) * col("__maxw") < weight * 1000000L)
      .drop("__maxw")
  }

  /** Deterministic training shuffle order: a stable pseudo-random total
    * order from the portable (id, salt) hash. Narrow projection; the
    * actual global ordering happens in the consumer's range-partitioned
    * sort (Spark's sort is a range shuffle — no single-partition
    * bottleneck). Feed `shard = pmod(shuffle_key, n)` into
    * [[packSequences]] to pack in shuffled order. */
  def shuffleKey(id: Column, salt: String = "shuffle"): Column =
    PortableHash.base(concat(id.cast("string"), lit(":" + salt)))

  /** Domain-mixture resampling: deterministically downsample each
    * domain so the surviving corpus matches the target `weights`
    * proportions, keeping as much data as possible (the binding domain
    * — the one with the least data relative to its weight — is kept
    * whole; every other domain is thinned to match). Domains absent
    * from `weights` are dropped. Sampling is the portable (id, salt)
    * hash against the per-domain acceptance rate, so re-runs keep
    * exactly the same rows on any engine or cluster size.
    *
    * Scale shape: one tiny per-domain count aggregate (map-side
    * combined), the acceptance-rate frame is a handful of rows joined
    * back by broadcast, and the filter itself is a narrow projection —
    * one scan, no corpus shuffle. */
  def resampleMixture(df: DataFrame, domain: Column, id: Column,
                      weights: Map[String, Double],
                      salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val wsum = weights.values.sum
    val wlit = map(weights.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(lit(k), lit(v / wsum))
    }: _*)
    val counts = df.groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", try_element_at(wlit, col("__dom")))
      .filter(col("__w").isNotNull)
    val tRow = counts.agg(min(col("__n") / col("__w")).as("__t"))
    val accept = counts.crossJoin(broadcast(tRow))
      .select(col("__dom"),
        least(lit(1.0), col("__w") * col("__t") / col("__n")).as("__p"))
    val u = (PortableHash.base(concat(id.cast("string"), lit(":" + salt)))
      % 1000000L).cast(DoubleType) / 1e6
    df.join(broadcast(accept), domain === col("__dom"))
      .filter(u < col("__p"))
      .drop("__dom", "__p")
  }
}
