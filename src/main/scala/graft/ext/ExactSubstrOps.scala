package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.QueryCaches.Pinned

/** Exact-substring duplication profiling — the ExactSubstr side of the
  * dedup family (Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", arXiv:2107.06499): find every maximal token span of a
  * document that re-occurs verbatim elsewhere in the corpus, and report
  * per-document duplicated-span coverage. Whole-document MinHash (q35)
  * and the chunk-grid pass (q137) both miss this shape: a boilerplate
  * license header pasted into thousands of otherwise-unique documents
  * never lifts whole-doc (or even chunk) Jaccard above threshold, but is
  * exactly what ExactSubstr removes before LM training.
  *
  * The paper builds a corpus-wide suffix array; the Spark-first
  * re-expression replaces it with fixed-length rolling token grams
  * (stride 1), which detect every duplicated substring of >= `l` tokens
  * (a duplicated span of length m >= l contains m-l+1 duplicated grams,
  * and the island merge below reassembles them into the maximal span).
  * Spans shorter than `l` are deliberately below the match floor, same
  * role as the paper's 50-token threshold.
  *
  * Scale shape (the reason this survives 100 TB where a suffix array
  * does not distribute):
  *  - the gram frame is corpus-token-sized (one row per position) and
  *    never wider than (doc_id, pos, gram);
  *  - "occurs >= minOccurrences times" is ONE map-side-combined count
  *    on the gram key, and feeds back as a LEFT SEMI join (no payload);
  *  - span reassembly is a per-document window over the doc's
  *    *duplicated* positions only — partitioned by doc_id, never global;
  *  - nothing is all-pairs: two documents sharing a span never meet in
  *    a join, they only co-occur under one gram key.
  */
object ExactSubstrOps {

  /** Production default operating point — the LINEAR regime. The 8-gram
    * setting is correct on short-document corpora but goes disk-bound at
    * corpus scale: 8-grams are dense, so the duplicated-position frame
    * approaches corpus-token size and its per-document window spills
    * (measured ~19× time for 10× data at 5M docs). At the 20-token
    * floor (Lee et al.'s 50-token regime scaled to this corpus's
    * ~56-token median docs) only long verbatim passages count, the dup
    * frame stays sparse, and the same pipeline measured linear
    * (10.6× time for 10× data on the same 5M-doc corpus). mergeGap=4
    * is the paper's near-adjacent range merge: a one-word edit inside a
    * boilerplate block doesn't split the report. Callers profiling
    * short-doc corpora pass l explicitly (the 8-gram oracles do).
    *
    * CHANGELOG: these defaults changed in round 9 from (l=8, mergeGap=0)
    * — any default-arg caller of dupSpanProfile / stripDupSpans /
    * stripDupSpansKeepOne changed output at that point. For keep-one the
    * mergeGap also threads into the CANONICAL-side island merge (the
    * elected copy keeps its gap-merged block whole; see the mergeGap>0
    * keep-one spec in LayoutTrainSpec for the pinned semantics). */
  val DefaultL = 20
  val DefaultMergeGap = 4

  /** Per-document duplicated-span profile. Output: one row per document
    * that contains at least one duplicated gram — (doc_id, n_spans,
    * dup_tokens, n_tokens, coverage_fp) where coverage_fp is
    * (10000 * dup_tokens) div n_tokens (fixed-point, engine-portable).
    *
    * @param l              gram length in tokens — the minimum span
    *                       length that counts as duplicated
    * @param minOccurrences a gram is duplicated when it occurs this many
    *                       times corpus-wide (2 = the paper's "appears
    *                       twice"; within-doc repeats count, as they do
    *                       in a suffix array)
    * @param mergeGap       spans separated by at most this many clean
    *                       tokens merge into one reported span (Lee et
    *                       al. merge near-adjacent duplicate ranges so a
    *                       one-token edit inside a boilerplate block
    *                       doesn't split the report in two); 0 = merge
    *                       only overlapping/contiguous covers
    */
  def dupSpanProfile(docs: DataFrame, id: Column, text: Column,
                     l: Int = DefaultL, minOccurrences: Long = 2L,
                     mergeGap: Int = DefaultMergeGap): DataFrame =
    profileFromSpans(
      mergedSpans(dupOccurrences(docs, id, text, l, minOccurrences),
        l, mergeGap))

  /** The duplicated-occurrence frame — (gkey, doc_id, n_tokens, pos),
    * one row per occurrence of a corpus-duplicated l-gram. This is the
    * family's shared intermediate: [[mergedSpans]]/[[profileFromSpans]]
    * (profile), [[stripFromSpans]] (strip-everywhere) and
    * [[keepOneFromFrames]] (keep-one) are all cheap derivations of it,
    * so a session materializes it ONCE per corpus and every family
    * query answers off the same build (the
    * [[graft.ext.SimilarityOps.ivfFitCached]] amortized-index class —
    * callers persist it; a production deployment stores it next to the
    * corpus). Typically a small fraction of corpus-token size at the
    * default gram floor. */
  def dupOccurrences(docs: DataFrame, id: Column, text: Column,
                     l: Int = DefaultL,
                     minOccurrences: Long = 2L): DataFrame = {
    val (_, grams, dupKeys) = gramFrames(docs, id, text, l, minOccurrences)
    grams.join(dupKeys, Seq("gkey"), "left_semi")
      .select(col("gkey"), col("doc_id"), col("n_tokens"), col("pos"))
  }

  /** Maximal merged spans of a [[dupOccurrences]] frame — the
    * gaps-and-islands pass, exposed so one persisted occurrence frame
    * serves every span consumer. Output: (doc_id, n_tokens, span_id,
    * sp_start, sp_end). */
  def mergedSpans(dupOcc: DataFrame, l: Int, mergeGap: Int = 0): DataFrame =
    mergeIslands(dupOcc.select("doc_id", "n_tokens", "pos"), l, mergeGap)

  /** The [[dupSpanProfile]] rollup over a prebuilt [[mergedSpans]]
    * frame: span-count-sized input, one grouped aggregation. */
  def profileFromSpans(spans: DataFrame): DataFrame =
    spans
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("sp_end") - col("sp_start") + 1L).as("dup_tokens"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        expr("(10000 * dup_tokens) div n_tokens").as("coverage_fp"))

  /** The APPLY side of the profile: rebuild every affected document's
    * text with its duplicated spans REMOVED (ALL occurrences — the
    * C4/CCNet strip-everywhere policy; [[stripDupSpansKeepOne]] is the
    * Lee-faithful keep-one alternative). Output: one row per document
    * that lost tokens —
    * (doc_id, n_tokens, kept_tokens, removed_tokens, cleaned_text).
    *
    * Scale: the reconstruction is span-native ([[rebuildFromSpans]]) —
    * merged spans aggregate per document and the strip is an array
    * filter inside the doc row, so nothing token-sized is ever
    * shuffled; state is document-sized, never corpus-sized. */
  def stripDupSpans(docs: DataFrame, id: Column, text: Column,
                    l: Int = DefaultL, minOccurrences: Long = 2L,
                    mergeGap: Int = DefaultMergeGap): DataFrame =
    stripFromSpans(docs, id, text,
      mergedSpans(dupOccurrences(docs, id, text, l, minOccurrences),
        l, mergeGap), l)

  /** [[stripDupSpans]] over a prebuilt [[mergedSpans]] frame (the
    * shared-build path): only the rebuild re-reads the corpus — one
    * tokenize pass, no gram hashing, no gram-count shuffle. */
  def stripFromSpans(docs: DataFrame, id: Column, text: Column,
                     spans: DataFrame, l: Int): DataFrame =
    rebuildFromSpans(tokenize(docs, id, text, l),
      spans, keepSpans = None)

  /** Lee-faithful KEEP-ONE variant of [[stripDupSpans]]: each duplicated
    * gram elects a CANONICAL occurrence — the corpus-wide minimum
    * (doc_id, pos) — and a token position is stripped only when every
    * duplicated gram covering it is non-canonical. The first copy of a
    * duplicated passage therefore survives verbatim (an exact-dup pair
    * keeps doc A untouched and empties doc B), which is the
    * "all but one occurrence" semantics of the suffix-array dedup,
    * elected relationally: one grouped min per gram key, no cross-doc
    * pairing. Output schema matches [[stripDupSpans]]; only documents
    * that actually lost tokens appear. */
  def stripDupSpansKeepOne(docs: DataFrame, id: Column, text: Column,
                           l: Int = DefaultL, minOccurrences: Long = 2L,
                           mergeGap: Int = DefaultMergeGap,
                           release: Boolean = false): DataFrame = {
    // Persist the DUPLICATED-POSITION-sized frame only (typically a
    // small fraction of the corpus): canon and allPos both read it, so
    // the corpus gram pass runs twice (dupKeys count + this join), not
    // four times. The corpus-sized frames (grams, toks) deliberately
    // stay UNPERSISTED — at 100 TB, re-streaming tokenize+hash from
    // source is cheaper than spill-caching a corpus-sized frame.
    val dupOcc = dupOccurrences(docs, id, text, l, minOccurrences)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CachePolicy.finish(release, Seq(dupOcc))(
      keepOneFromFrames(docs, id, text, dupOcc,
        mergedSpans(dupOcc, l, mergeGap), l, mergeGap))
  }

  /** The keep-one set algebra over prebuilt family frames — `dupOcc`
    * is a (persisted) [[dupOccurrences]] frame and `allSpans` its
    * [[mergedSpans]] at the same (l, mergeGap); a session that shares
    * both (the q139/q143/q145 family) pays no gram pass here at all.
    *
    * "a position survives iff SOME canonical occurrence covers it" is
    * pure span algebra: a position is stripped iff it lies in a
    * duplicated span AND in no canonical span. Both sides stay
    * INTERVALS end-to-end — the canonical occurrences island-merge
    * once (gram-occurrence-sized window) and the per-position test
    * happens inside [[rebuildFromSpans]]'s array filter, so no
    * position-level frame is ever materialized or shuffled. (History:
    * the round-8 form exploded every occurrence ×l through a
    * per-position max and spilled; the round-9 form exploded merged
    * spans back to positions and anti-joined — still token-sized
    * shuffles at ScaleUp dup density.) */
  def keepOneFromFrames(docs: DataFrame, id: Column, text: Column,
                        dupOcc: DataFrame, allSpans: DataFrame,
                        l: Int, mergeGap: Int = 0): DataFrame = {
    val canon = dupOcc.groupBy("gkey")
      .agg(min(struct(col("doc_id"), col("pos"), col("n_tokens"))).as("c"))
      .select(col("c.doc_id").as("doc_id"), col("c.n_tokens").as("n_tokens"),
        col("c.pos").as("pos"))
    rebuildFromSpans(tokenize(docs, id, text, l), allSpans,
      keepSpans = Some(mergeIslands(canon, l, mergeGap)))
  }

  /** Span-native rebuild: documents stay token ARRAYS end-to-end. The
    * strip (and optional keep) spans aggregate to one small array per
    * affected document — merged islands, so a document's span count is
    * bounded by its own length and in practice a handful — and join to
    * the tokenized corpus on doc_id (document-count-sized rows, never
    * token-count-sized). The per-token covered test is a codegen'd
    * higher-order `filter`/`exists` over the doc's own arrays.
    *
    * This replaced the posexplode + anti-join + collect_list form,
    * which shuffled TWO corpus-token-sized frames (every (doc_id, pos,
    * tok) row out, every kept token back through a whole-doc
    * collect_list): at ScaleUp ×1000 dup density (2M docs, covered
    * positions ≈ corpus tokens) that spilled — q143 measured 444 s
    * warm, 76× for 10× data. Here the only shuffles are span-count-
    * sized aggregations and a doc-count-sized join.
    *
    * A token position is kept iff it is outside every `spans` interval
    * OR inside some `keepSpans` interval ([[keepOneFromFrames]]'s
    * canonical cover); output rows are the documents that actually
    * lost tokens, matching the anti-join form exactly. */
  private def rebuildFromSpans(toks: DataFrame, spans: DataFrame,
                               keepSpans: Option[DataFrame]): DataFrame = {
    val spanArrT = "array<struct<sp_start:bigint,sp_end:bigint>>"
    def perDoc(sp: DataFrame, as: String) = sp.groupBy("doc_id")
      .agg(collect_list(struct(col("sp_start"), col("sp_end"))).as(as))
    val base = toks.join(perDoc(spans, "strip_sps"), Seq("doc_id"))
    val joined = keepSpans match {
      case Some(ks) => base.join(perDoc(ks, "keep_sps"), Seq("doc_id"), "left")
        .withColumn("keep_sps",
          coalesce(col("keep_sps"), array().cast(spanArrT)))
      case None => base.withColumn("keep_sps", array().cast(spanArrT))
    }
    def covers(sps: Column, pos: Column) =
      exists(sps, sp => pos >= sp.getField("sp_start") &&
        pos <= sp.getField("sp_end"))
    joined
      .withColumn("kept", filter(col("toks"), (_, i) => {
        val pos = i.cast(LongType)
        !covers(col("strip_sps"), pos) || covers(col("keep_sps"), pos)
      }))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast(LongType).as("kept_tokens"),
        (col("n_tokens") - size(col("kept")).cast(LongType))
          .as("removed_tokens"),
        array_join(col("kept"), " ").as("cleaned_text"))
      .filter(col("removed_tokens") > 0L)
  }

  /** Cross-corpus span contamination: positions of a NON-benchmark
    * ("train") document whose `l`-gram occurs verbatim anywhere in the
    * benchmark slice, reassembled into maximal spans — the span-level
    * decontamination audit (the n-gram overlap check of GPT-3/PaLM
    * appendix-style contamination studies) that doc-level
    * decontamination (q53) rounds up to whole documents. Output: one
    * row per contaminated train doc — (doc_id, n_spans,
    * contam_tokens, n_tokens, contamination_fp).
    *
    * Scale shape: same as [[dupSpanProfile]] — the benchmark key set is
    * ONE distinct on the 8-byte gram key (benchmark-sized, typically
    * tiny next to train), the detection is a LEFT SEMI join on that
    * key, and the island merge is per-train-doc windows. Never
    * all-pairs, no text payload moves after the gram pass. */
  def crossContamination(docs: DataFrame, id: Column, text: Column,
                         isBench: Column, l: Int = 8): DataFrame = {
    require(l >= 2, s"gram length must be >= 2, got $l")
    val toks = docs
      .select(id.as("doc_id"), isBench.as("is_bench"),
        TextOps.tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .filter(col("n_tokens") >= l)
    val grams = gramExplode(toks, l, extra = Seq("is_bench"))
    val benchKeys = grams.filter(col("is_bench")).select("gkey").distinct()
    val contamPos = grams.filter(!col("is_bench"))
      .join(benchKeys, Seq("gkey"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    mergeIslands(contamPos, l)
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("sp_end") - col("sp_start") + 1L).as("contam_tokens"))
      .select(col("doc_id"), col("n_spans"), col("contam_tokens"),
        col("n_tokens"),
        expr("(10000 * contam_tokens) div n_tokens").as("contamination_fp"))
  }

  /** Distinct gram keys of a benchmark corpus — the STATIC side of the
    * contamination guard ([[crossContamination]]'s `benchKeys` set,
    * exposed so train-offline/guard-online deployments can build it
    * once and reuse it: [[graft.streaming.StreamingContamination]]).
    * One gram pass over the benchmark + a distinct on the 8-byte key —
    * benchmark-sized work, persisted by the caller. */
  def benchGramKeys(bench: DataFrame, id: Column, text: Column,
                    l: Int = 8): DataFrame = {
    require(l >= 2, s"gram length must be >= 2, got $l")
    val toks = bench
      .select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .filter(col("n_tokens") >= l)
    gramExplode(toks, l, extra = Seq.empty).select("gkey").distinct()
  }

  /** Doc-level contamination verdicts for a (micro-)batch against a
    * prebuilt [[benchGramKeys]] frame: (doc_id, n_tokens, n_hit_grams,
    * contaminated). Exact — the same LEFT SEMI gram check
    * [[crossContamination]] runs, so a doc is flagged here iff it has a
    * contaminated span there. Docs shorter than `l` tokens carry no
    * gram and are clean by definition (below the match floor). */
  def flagContaminated(batch: DataFrame, benchKeys: DataFrame,
                       id: Column, text: Column, l: Int = 8): DataFrame = {
    require(l >= 2, s"gram length must be >= 2, got $l")
    val toks = batch
      .select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
    val grams = gramExplode(toks.filter(col("n_tokens") >= l), l,
      extra = Seq.empty)
    val hits = grams.join(benchKeys, Seq("gkey"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    toks.select("doc_id", "n_tokens")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("hits"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("hits"), lit(0L)) > 0L).as("contaminated"))
  }

  /** (doc_id, toks, n_tokens) for docs of at least `l` tokens. */
  // ── Incremental maintenance (CDC) ───────────────────────────────────

  /** The incremental-maintenance state: `occ` is the ALL-grams
    * occurrence frame (gkey, doc_id, n_tokens, pos) — the relational
    * analogue of Lee et al.'s suffix array, ~8 bytes of key per corpus
    * token — and `cnt` the corpus-wide gram-count table (gkey, cnt).
    * Both are pure functions of the corpus ([[initState]]) and both
    * update from a change stream with work bounded by the touched
    * documents ([[applyChanges]]); a deployment persists them next to
    * the corpus (the [[graft.etl.FrameStore]]/[[SignatureStore]]
    * segment pattern), bucketed by `gkey` so the flipped-key probes
    * below are pruned index lookups. */
  case class SubstrState(occ: DataFrame, cnt: DataFrame)

  /** Full build of [[SubstrState]] — paid once per corpus. */
  def initState(docs: DataFrame, id: Column, text: Column,
                l: Int = DefaultL): SubstrState = {
    val occ = gramExplode(tokenize(docs, id, text, l), l, extra = Seq.empty)
      .select("gkey", "doc_id", "n_tokens", "pos")
    SubstrState(occ, countsFromOcc(occ))
  }

  /** The gram-count table of an occurrence frame — the one derivation
    * rule shared by [[initState]] and callers rebuilding `cnt` from a
    * persisted/stored `occ` (so the two can never drift). */
  def countsFromOcc(occ: DataFrame): DataFrame =
    occ.groupBy("gkey").agg(count(lit(1)).as("cnt"))

  /** One CDC step of the ExactSubstr family — the composition the
    * round-10 verdict asked for: a corpus mutation no longer re-pays
    * the full gram build + restrip; only the gram passes of the
    * TOUCHED documents run, and only the AFFECTED documents restrip.
    *
    * `changes` is [[graft.etl.ChangeCapture.diff]](oldCorpus,
    * newCorpus, idCol) with `text` in the old/new structs; `prevStrip`
    * is the previous [[stripDupSpans]] output over the old corpus.
    * Returns (new state, new strip output) — the strip output is
    * row-identical to a full `stripDupSpans(newCorpus)` rebuild
    * (spec-pinned).
    *
    * Affected set derivation (the part a naive "restrip changed docs"
    * gets WRONG): a mutation changes the spans of UNCHANGED documents
    * whenever a gram's corpus-wide duplication status flips — deleting
    * the second copy of a passage makes the surviving copy unique
    * again; inserting a copy makes a previously-unique passage
    * duplicated. So: gram-count deltas from the touched docs' removed +
    * added occurrences (delta-key-sized), one merge into `cnt` yielding
    * the flipped keys, and affected = touched ∪ docs holding an
    * occurrence of a flipped key (a semi-join probe into `occ` —
    * pruned when the store is gkey-bucketed). Everything downstream
    * (dup filter, island merge, span-native rebuild) runs over
    * affected docs only. */
  def applyChanges(state: SubstrState, prevStrip: DataFrame,
                   changes: DataFrame, newCorpus: DataFrame,
                   id: Column, text: Column,
                   l: Int = DefaultL, minOccurrences: Long = 2L,
                   mergeGap: Int = DefaultMergeGap)
      : (SubstrState, DataFrame) = {
    val c = deltaCore(state, changes, l, minOccurrences)
    val spansAff = mergedSpans(dupOccAffected(c, minOccurrences), l, mergeGap)
    // the diff's key column name IS the corpus key column name
    val affDocs = newCorpus.join(c.affectedIds, Seq(c.idCol), "left_semi")
    val stripAff = stripFromSpans(affDocs, id, text, spansAff, l)
    val stripNew = prevStrip
      .join(c.affectedIds.unionByName(c.removedIds).distinct()
          .withColumnRenamed(c.idCol, "doc_id"),
        Seq("doc_id"), "left_anti")
      .unionByName(stripAff)
    (SubstrState(c.occNew, c.cntNew), stripNew)
  }

  /** Roll a [[mergedSpans]] family frame (and the state) forward by a
    * change stream — the durable-artifact twin of [[applyChanges]]:
    * same bounded delta core, but the maintained output is the spans
    * FRAME (what [[graft.etl.FrameStore]] publishes for the
    * esspans8/esspans20 families) rather than the strip rows. Spans of
    * unaffected documents are carried by reference from `prevSpans`;
    * only affected documents re-run the island merge. Returns
    * (new state, new spans frame), both row-identical to a full
    * rebuild over the new corpus (spec-pinned). */
  def applySpanDelta(state: SubstrState, prevSpans: DataFrame,
                     changes: DataFrame,
                     l: Int = DefaultL, minOccurrences: Long = 2L,
                     mergeGap: Int = DefaultMergeGap)
      : (SubstrState, DataFrame) = {
    val c = deltaCore(state, changes, l, minOccurrences)
    val spansAff = mergedSpans(dupOccAffected(c, minOccurrences), l, mergeGap)
    val spansNew = prevSpans
      .join(c.affectedIds.unionByName(c.removedIds).distinct()
          .withColumnRenamed(c.idCol, "doc_id"),
        Seq("doc_id"), "left_anti")
      .unionByName(spansAff)
    (SubstrState(c.occNew, c.cntNew), spansNew)
  }

  /** The outputs every CDC consumer shares: maintained occurrence +
    * count frames, the affected-document set, and the removed ids. */
  private final case class DeltaCore(occNew: DataFrame, cntNew: DataFrame,
                                     affectedIds: DataFrame,
                                     removedIds: DataFrame, idCol: String)

  /** The duplicated occurrences of the AFFECTED documents only — the
    * input every affected-doc re-derivation (spans, strip) starts from. */
  private def dupOccAffected(c: DeltaCore, minOccurrences: Long): DataFrame =
    c.occNew
      .join(c.affectedIds.withColumnRenamed(c.idCol, "doc_id"),
        Seq("doc_id"), "left_semi")
      .join(c.cntNew.filter(col("cnt") >= minOccurrences).select("gkey"),
        Seq("gkey"), "left_semi")
      .select("doc_id", "n_tokens", "pos")

  private def deltaCore(state: SubstrState, changes: DataFrame,
                        l: Int, minOccurrences: Long): DeltaCore = {
    val idCol = changes.columns.head // diff puts the key first
    val touchedNewIds = changes
      .filter(col("change").isin("insert", "update")).select(idCol)
    val removedIds = changes
      .filter(col("change").isin("delete", "update")).select(idCol)
    // gram passes over TOUCHED docs only
    val addedOcc = gramExplode(
      tokenize(changes.filter(col("change").isin("insert", "update"))
          .select(col(idCol), col("new.text").as("__text")),
        col(idCol), col("__text"), l),
      l, extra = Seq.empty).select("gkey", "doc_id", "n_tokens", "pos")
      .pin() // drain()-tracked: a sweep's q197 loop must not accumulate these
    val removedOcc = state.occ.join(
      removedIds.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"), "left_semi")
    val occNew = state.occ
      .join(removedIds.withColumnRenamed(idCol, "doc_id"),
        Seq("doc_id"), "left_anti")
      .select("gkey", "doc_id", "n_tokens", "pos") // join key reorders
      .unionByName(addedOcc)
    // delta-key-sized count maintenance; the SAME merge yields cntNew
    // and the flipped keys (duplication status crossed minOccurrences)
    val delta = removedOcc.select(col("gkey"), lit(-1L).as("d"))
      .unionByName(addedOcc.select(col("gkey"), lit(1L).as("d")))
      .groupBy("gkey").agg(sum("d").as("d"))
    val merged = state.cnt.join(delta, Seq("gkey"), "full_outer")
      .select(col("gkey"),
        coalesce(col("cnt"), lit(0L)).as("cnt_old"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d"), lit(0L))).as("cnt"))
      .pin() // corpus-gram-type-sized — must be releasable by drain()
    val cntNew = merged.filter(col("cnt") > 0).select("gkey", "cnt")
    val flipped = merged.filter(
      (col("cnt_old") >= minOccurrences) =!= (col("cnt") >= minOccurrences))
      .select("gkey")
    // affected = touched ∪ holders of a flipped key
    val affectedIds = occNew.join(flipped, Seq("gkey"), "left_semi")
      .select(col("doc_id").as(idCol))
      .unionByName(touchedNewIds).distinct()
      .pin()
    DeltaCore(occNew, cntNew, affectedIds, removedIds, idCol)
  }

  private def tokenize(docs: DataFrame, id: Column, text: Column,
                       l: Int): DataFrame = {
    require(l >= 2, s"gram length must be >= 2, got $l")
    docs
      .select(id.as("doc_id"), TextOps.tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .filter(col("n_tokens") >= l)
  }

  /** Shared internals: (tokenized docs, gram frame, duplicated keys). */
  private def gramFrames(docs: DataFrame, id: Column, text: Column,
                         l: Int, minOccurrences: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = tokenize(docs, id, text, l)
    val grams = gramExplode(toks, l, extra = Seq.empty)
    val dupKeys = grams.groupBy("gkey")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minOccurrences)
      .select("gkey")
    (toks, grams, dupKeys)
  }

  /** One row per grid position, stride 1: pos ranges over 0..n-l. The
    * gram text is immediately collapsed to its 60-bit portable md5
    * prefix (PortableHash.long60, codegen'd): the count shuffle and the
    * semi-join feedback then move 8-byte keys instead of ~l-token
    * strings — the dominant shuffle of this operator at scale. The
    * DuckDB oracle groups by the equivalent hex prefix, so a (presumed
    * astronomically unlikely) 60-bit collision would affect both
    * engines identically. `extra` columns from `toks` ride along. */
  private def gramExplode(toks: DataFrame, l: Int,
                          extra: Seq[String]): DataFrame = {
    val keep = (Seq("doc_id", "n_tokens") ++ extra).map(col)
    toks.select(keep :+
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - l),
          i => array_join(slice(col("toks"), i + 1, lit(l)), " ")))
          .as(Seq("pos", "gram")): _*)
      .select(keep :+ col("pos") :+
        PortableHash.long60(col("gram")).as("gkey"): _*)
  }

  /** Gaps-and-islands: a gram at pos covers [pos, pos+l-1]; merge
    * overlapping or contiguous covers — and covers separated by at most
    * `mergeGap` clean tokens — into maximal spans. The island cumsum
    * consumes the running-max frame's output, so the two Window nodes
    * cannot fuse — but they pipeline over ONE (doc_id, pos)
    * exchange+sort with no re-partition between them (spec-pinned).
    * Input: (doc_id, n_tokens, pos); output: (doc_id, n_tokens,
    * span_id, sp_start, sp_end). */
  private def mergeIslands(positions: DataFrame, l: Int,
                           mergeGap: Int = 0): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(l - 1).cast(LongType))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    positions
      .withColumn("new_span",
        when(prevEnd.isNull || col("pos") > prevEnd + 1L + mergeGap, 1L)
          .otherwise(0L))
      .withColumn("span_id",
        sum("new_span").over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "n_tokens", "span_id")
      .agg(min("pos").as("sp_start"),
        (max(col("pos")) + lit(l - 1).cast(LongType)).as("sp_end"))
  }
}
