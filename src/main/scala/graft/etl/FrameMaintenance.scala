package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, ExactSubstrOps, SketchOps}

/** Incremental maintenance of the durable [[FrameStore]] family frames
  * from a corpus DELTA — the missing half of the durable-artifact
  * story: [[FrameStore.invalidate]] drops a corpus subtree and the next
  * session re-pays the FULL family build, but the expensive families
  * already have true delta operators
  * ([[graft.ext.ExactSubstrOps.applyChanges]], the
  * [[graft.ext.SignatureStore]] anti-join update). This wires
  * [[ChangeCapture.diff]] → delta operator → re-publish, so a corpus
  * snapshot roll (daily dump N → N+1) updates the stored artifacts with
  * work bounded by the touched documents instead of rebuilding them.
  *
  * Snapshot model: corpora are IMMUTABLE under their directory (the
  * FrameStore contract), so maintenance is a ROLL-FORWARD between two
  * snapshot identities — read the frames published for `oldDir`
  * (building them there first if absent), apply the delta, publish the
  * results under `newDir`. Both subtrees stay valid; dropping the old
  * one after cutover is [[FrameStore.invalidate]].
  *
  * Cost shape at 100 TB: the COMPUTE is delta-bounded — the only
  * tokenize/gram/signature passes run over touched documents; carried
  * rows flow from the stored parquet scan straight back out. The
  * PUBLISH writes each frame in full (corpus-linear IO, zero CPU
  * re-derivation) — the same sequential-write cost any snapshot copy
  * pays; a deployment that needs delta-bounded WRITES too uses the
  * [[graft.ext.SignatureStore]] segment layout, which this maintenance
  * deliberately mirrors at frame granularity.
  *
  * Idempotent: frames already published under `newDir` are left as-is
  * (getOrBuild semantics) — re-running a crashed maintenance job
  * completes the missing frames only.
  */
object FrameMaintenance {

  /** Roll the ExactSubstr family (`esocc`/`escnt`/`esdup`/`esspans`)
    * forward from (`oldDir`, `oldDocs`) to (`newDir`, `newDocs`).
    * `(l, mergeGap)` selects the operating point — (8, 0) is the
    * fine-grained oracle family, (20, 4) the production default.
    * Returns (key, stored frame) for everything published under
    * `newDir`.
    *
    * `oldFrames` — the old-snapshot (occ, cnt, spans) family when the
    * caller ALREADY holds it (a session's pinned shared frames, a
    * just-read store): the roll then starts from those frames instead
    * of re-deriving (or re-fetching) the old family. With no store
    * configured, `FrameStore.getOrBuild` is the identity, so an
    * absent `oldFrames` re-pays the full old-corpus gram pass + count
    * shuffle + island merge on EVERY execution — q200 measured that
    * rebuild as the bulk of its warm time. */
  def rollForwardExactSubstr(s: SparkSession, oldDir: String, newDir: String,
                             oldDocs: DataFrame, newDocs: DataFrame,
                             l: Int = 8, mergeGap: Int = 0,
                             minOccurrences: Long = 2L,
                             oldFrames: Option[(DataFrame, DataFrame, DataFrame)] = None)
      : Seq[(String, DataFrame)] = {
    val changes = ChangeCapture.diff(
        oldDocs.select("doc_id", "text"), newDocs.select("doc_id", "text"),
        "doc_id")
      .filter(col("change") =!= "unchanged")
    // old-snapshot frames: as passed in, else read from the store,
    // paying the full build ONCE if this corpus was never published
    // (first migration)
    val occOld = oldFrames.map(_._1).getOrElse(
      FrameStore.getOrBuild(s, oldDir, s"esocc$l")(
        ExactSubstrOps.initState(oldDocs, col("doc_id"), col("text"), l).occ))
    val cntOld = oldFrames.map(_._2).getOrElse(
      FrameStore.getOrBuild(s, oldDir, s"escnt$l")(
        ExactSubstrOps.countsFromOcc(occOld)))
    val spansOld = oldFrames.map(_._3).getOrElse(
      FrameStore.getOrBuild(s, oldDir, s"esspans$l")(
        ExactSubstrOps.mergedSpans(dupOf(occOld, cntOld, minOccurrences),
          l, mergeGap)))
    val (stateNew, spansNew) = ExactSubstrOps.applySpanDelta(
      ExactSubstrOps.SubstrState(occOld, cntOld), spansOld, changes,
      l, minOccurrences, mergeGap)
    val occStored = FrameStore.getOrBuild(s, newDir, s"esocc$l")(stateNew.occ)
    val cntStored = FrameStore.getOrBuild(s, newDir, s"escnt$l")(stateNew.cnt)
    val dupStored = FrameStore.getOrBuild(s, newDir, s"esdup$l")(
      dupOf(occStored, cntStored, minOccurrences))
    val spansStored = FrameStore.getOrBuild(s, newDir, s"esspans$l")(spansNew)
    Seq(s"esocc$l" -> occStored, s"escnt$l" -> cntStored,
      s"esdup$l" -> dupStored, s"esspans$l" -> spansStored)
  }

  /** Roll the MinHash family (`mhsigs`/`mhpairs`) forward: removed and
    * updated documents leave the signature frame by one anti-join (the
    * SignatureStore update rule), touched documents re-sign, and the
    * pair frame keeps every pair with both endpoints untouched while
    * [[graft.ext.DedupOps.incrementalCandidatePairs]] re-bands ONLY the
    * touched signatures against the rolled-forward index. Returns
    * (key, stored frame) for everything published under `newDir`. */
  def rollForwardMinhash(s: SparkSession, oldDir: String, newDir: String,
                         oldDocs: DataFrame, newDocs: DataFrame,
                         shingleSize: Int = 3, numHashes: Int = 32,
                         bands: Int = 8): Seq[(String, DataFrame)] = {
    val changes = ChangeCapture.diff(
        oldDocs.select("doc_id", "text"), newDocs.select("doc_id", "text"),
        "doc_id")
      .filter(col("change") =!= "unchanged")
    val sigsOld = FrameStore.getOrBuild(s, oldDir, "mhsigs")(
      DedupOps.minhashSignatures(oldDocs, col("doc_id"), col("text"),
        shingleSize, numHashes, portable = true))
    val pairsOld = FrameStore.getOrBuild(s, oldDir, "mhpairs")(
      DedupOps.candidatePairsFromSignatures(sigsOld, numHashes, bands))
    val gone = changes.filter(col("change").isin("delete", "update"))
      .select("doc_id")
    val touchedSigs = DedupOps.minhashSignatures(
      changes.filter(col("change").isin("insert", "update"))
        .select(col("doc_id"), col("new.text").as("text")),
      col("doc_id"), col("text"), shingleSize, numHashes, portable = true)
    val sigsNew = sigsOld.join(gone, Seq("doc_id"), "left_anti")
      .unionByName(touchedSigs)
    val sigsStored = FrameStore.getOrBuild(s, newDir, "mhsigs")(sigsNew)
    // pairs: keep both-endpoints-untouched rows; every pair with a
    // touched endpoint re-derives from the delta band probe (disjoint
    // sets — updated/deleted ids leave via `gone`, inserted ids were
    // never present, so no dedup pass is needed)
    val pairsKept = pairsOld
      .join(gone.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_anti")
      .join(gone.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_anti")
    val pairsDelta = DedupOps.incrementalCandidatePairs(
      sigsStored.join(
          changes.filter(col("change").isin("insert", "update")).select("doc_id"),
          Seq("doc_id"), "left_semi"),
      sigsStored, numHashes, bands)
    val pairsStored = FrameStore.getOrBuild(s, newDir, "mhpairs")(
      pairsKept.unionByName(pairsDelta)
        .select("id_a", "id_b", "est_jaccard")) // anti-joins reorder
    Seq("mhsigs" -> sigsStored, "mhpairs" -> pairsStored)
  }

  /** Roll ANY per-document pure-derivation frame forward — the general
    * form behind the lmtridb (per-doc trigram counts), sd3 (shingle
    * sets), and quality-score families: each output row is a function
    * of its OWN document only, so maintenance is one anti-join carry
    * of untouched rows plus `derive` over the touched documents.
    * `derive` must key its output on `doc_id` and take a
    * (doc_id, text) frame; it runs over the FULL old corpus only if
    * the old frame was never published. */
  def rollForwardPerDoc(s: SparkSession, oldDir: String, newDir: String,
                        key: String, oldDocs: DataFrame, newDocs: DataFrame)
                       (derive: DataFrame => DataFrame): DataFrame = {
    val changes = ChangeCapture.diff(
        oldDocs.select("doc_id", "text"), newDocs.select("doc_id", "text"),
        "doc_id")
      .filter(col("change") =!= "unchanged")
    val oldFrame = FrameStore.getOrBuild(s, oldDir, key)(
      derive(oldDocs.select("doc_id", "text")))
    val gone = changes.filter(col("change").isin("delete", "update"))
      .select("doc_id")
    val touched = changes.filter(col("change").isin("insert", "update"))
      .select(col("doc_id"), col("new.text").as("text"))
    val rolled = oldFrame.join(gone, Seq("doc_id"), "left_anti")
      .select(oldFrame.columns.map(col): _*) // the anti-join reorders
      .unionByName(derive(touched))
    FrameStore.getOrBuild(s, newDir, key)(rolled)
  }

  /** Roll the sign-LSH embedding near-dup pair family (`embpairs<bits>`)
    * forward: pairs with both endpoints untouched carry by anti-join;
    * every pair with a touched endpoint re-derives from
    * [[graft.ext.DedupOps.incrementalEmbeddingPairs]] (touched ×
    * bucket-mates). `bits`/`seed` must match the stored family — the
    * key carries the bits, so a caller that resizes the bucket width
    * (autoSignBits at a grown corpus count) is publishing a DIFFERENT
    * family, not rolling this one. */
  def rollForwardEmbeddingPairs(s: SparkSession, oldDir: String,
                                newDir: String, oldVecs: DataFrame,
                                newVecs: DataFrame, bits: Int,
                                threshold: Double = 0.4, dim: Int = 64,
                                seed: Long = 7L): Seq[String] = {
    val key = s"embpairs$bits"
    val changes = ChangeCapture.diff(
        oldVecs.select("vec_id", "embedding"),
        newVecs.select("vec_id", "embedding"), "vec_id")
      .filter(col("change") =!= "unchanged")
    val pairsOld = FrameStore.getOrBuild(s, oldDir, key)(
      DedupOps.embeddingNearDupPairs(oldVecs, col("vec_id"),
        col("embedding"), threshold, dim, bits, seed))
    val gone = changes.filter(col("change").isin("delete", "update"))
      .select("vec_id")
    val touched = changes.filter(col("change").isin("insert", "update"))
      .select(col("vec_id"), col("new.embedding").as("embedding"))
    val vecsNew = newVecs.select("vec_id", "embedding")
    val pairsKept = pairsOld
      .join(gone.withColumnRenamed("vec_id", "id_a"), Seq("id_a"), "left_anti")
      .join(gone.withColumnRenamed("vec_id", "id_b"), Seq("id_b"), "left_anti")
    val pairsDelta = DedupOps.incrementalEmbeddingPairs(
      touched, vecsNew, col("vec_id"), col("embedding"),
      threshold, dim, bits, seed)
    FrameStore.getOrBuild(s, newDir, key)(
      pairsKept.unionByName(pairsDelta)
        .select("id_a", "id_b", "cosine")) // anti-joins reorder
    Seq(key)
  }

  /** Roll the IVF inverted file (`ivf-<nlist>-<iters>-assigned`)
    * forward under FROZEN centroids: assignment is a pure per-row
    * function of (vector, centroid literals), so removed/updated rows
    * leave by one anti-join and only touched vectors re-run the
    * argmax. The centroid table re-publishes unchanged under the new
    * snapshot (it IS the frozen fit). This is the production ANN
    * maintenance shape — a daily corpus delta never re-pays the
    * k-means collects; centroid DRIFT is observable instead:
    * [[graft.ext.SimilarityOps.tuneIvfNprobe]] on the rolled file
    * measures the recall the frozen fit still buys, and a missed
    * target triggers a re-fit under a NEW family key.
    * `oldVecs`/`newVecs` expose `(cid, cvec)`. Returns (key, stored
    * frame) for everything published under `newDir`. */
  def rollForwardIvfAssigned(s: SparkSession, oldDir: String, newDir: String,
                             oldVecs: DataFrame, newVecs: DataFrame,
                             nlist: Int, iters: Int = 2)
      : Seq[(String, DataFrame)] = {
    val model = graft.ext.SimilarityOps.ivfFitCached(oldDir, oldVecs,
      nlist, iters)
    publishIvf(s, newDir, nlist, iters, model.centroids,
      rolledIvfAssignment(model, oldVecs, newVecs))
  }

  /** The frozen-centroid roll alone (no publish): removed/updated rows
    * leave by one anti-join, only touched vectors re-run the argmax. */
  private def rolledIvfAssignment(model: graft.ext.SimilarityOps.IvfModel,
                                  oldVecs: DataFrame,
                                  newVecs: DataFrame): DataFrame = {
    val changes = ChangeCapture.diff(
        oldVecs.select("cid", "cvec"), newVecs.select("cid", "cvec"), "cid")
      .filter(col("change") =!= "unchanged")
    val gone = changes.filter(col("change").isin("delete", "update"))
      .select("cid")
    val touched = changes.filter(col("change").isin("insert", "update"))
      .select(col("cid"), col("new.cvec").as("cvec"))
    model.assigned.join(gone, Seq("cid"), "left_anti")
      .select(model.assigned.columns.map(col): _*) // the anti-join reorders
      .unionByName(graft.ext.SimilarityOps.ivfAssign(touched, model.centroids))
  }

  private def publishIvf(s: SparkSession, dir: String, nlist: Int, iters: Int,
                         centroids: Array[Array[Double]],
                         assigned: DataFrame): Seq[(String, DataFrame)] = {
    val centKey = s"ivf-$nlist-$iters-centroids"
    val centFrame = {
      import s.implicits._
      centroids.zipWithIndex.flatMap { case (cv, cid) =>
        cv.zipWithIndex.map { case (c, pos) => (cid, pos, c) }
      }.toSeq.toDF("cid", "pos", "c")
    }
    Seq(centKey -> FrameStore.getOrBuild(s, dir, centKey)(centFrame),
      s"ivf-$nlist-$iters-assigned" ->
        FrameStore.getOrBuild(s, dir, s"ivf-$nlist-$iters-assigned")(assigned))
  }

  /** The decision record [[rollForwardIvfRecallTargeted]] returns next
    * to its frames: what the frozen fit still measured, what was
    * declared, and whether the observe→react loop re-fit. */
  case class IvfRollDecision(refit: Boolean, frozenRecallFp: Long,
                             targetRecallFp: Long, finalRecallFp: Long,
                             deepestNprobe: Int)

  /** [[rollForwardIvfAssigned]] with the observe→react loop CLOSED: the
    * frozen-centroid roll is MEASURED before it is published —
    * [[graft.ext.SimilarityOps.tuneIvfNprobe]] on the rolled inverted
    * file reports the recall the frozen fit still buys on the NEW
    * corpus, and a miss of `targetRecallFp` at the DEEPEST candidate
    * nprobe (the dial has nowhere left to go) triggers the re-fit:
    * k-means re-runs on the new corpus (cached under `newDir`, so the
    * next delta's roll starts from THIS fit), every vector re-assigns,
    * and the re-fit index is what publishes under the standard keys.
    * Measure-before-publish keeps the keys immutable — no
    * second-generation key juggling — and the returned
    * [[IvfRollDecision]] is the auditable record of which arm won and
    * the recalls that decided it. Centroid drift is thus observed AND
    * reacted to; an undrifted corpus never re-pays the k-means
    * collects (spec-pinned both ways). */
  def rollForwardIvfRecallTargeted(
      s: SparkSession, oldDir: String, newDir: String,
      oldVecs: DataFrame, newVecs: DataFrame, sampleQueries: DataFrame,
      k: Int, targetRecallFp: Long, nlist: Int, iters: Int = 2,
      candidates: Seq[Int] = Seq(1, 2, 4, 8, 16))
      : (Seq[(String, DataFrame)], IvfRollDecision) = {
    import graft.QueryCaches.Pinned
    import graft.ext.SimilarityOps
    val deepest = candidates.max
    // the exact ground truth is MODEL-INDEPENDENT: one pinned
    // brute-force pass serves both the frozen measurement and the
    // post-refit one (review finding — the loop paid it twice)
    val exact = SimilarityOps.bruteForceTopK(sampleQueries, newVecs, k)
      .select("qid", "cid").pin()
    def recallAtDeepest(model: SimilarityOps.IvfModel): Long =
      SimilarityOps.tuneIvfNprobeWithExact(exact, sampleQueries, model, k,
          targetRecallFp, candidates)
        .filter(col("nprobe") === deepest)
        .select("recall_fp").head().getLong(0)
    val frozen = SimilarityOps.ivfFitCached(oldDir, oldVecs, nlist, iters)
    // pinned: the non-refit path evaluates the rolled assignment twice
    // (recall measurement, then publish)
    val rolledModel = SimilarityOps.IvfModel(frozen.centroids,
      rolledIvfAssignment(frozen, oldVecs, newVecs).pin())
    val frozenRecall = recallAtDeepest(rolledModel)
    val refit = frozenRecall < targetRecallFp
    val finalModel =
      if (refit) SimilarityOps.ivfFitCached(newDir, newVecs, nlist, iters)
      else rolledModel
    val finalRecall = if (refit) recallAtDeepest(finalModel) else frozenRecall
    (publishIvf(s, newDir, nlist, iters, finalModel.centroids,
        finalModel.assigned),
      IvfRollDecision(refit, frozenRecall, targetRecallFp, finalRecall,
        deepest))
  }

  /** Roll a durable Count-Min counter table forward under a FULL CDC
    * delta. CMS is the one sketch in the family that DELETES exactly:
    * the counter table is linear in the per-item counts (a signed
    * measure over the token multiset), so the roll adds the delta's
    * counters — departed tokens carry negative weight — and drops
    * buckets that sum to zero. Roll ≡ rebuild is exact EQUALITY, not
    * an approximation bound: both sides are the same Σ over the same
    * multiset (q203 hash-gates it; HLL registers and MG summaries are
    * max/threshold-monotone, so they get [[rollForwardHllRegisters]]'s
    * append-only contract instead). `tokens` maps a (doc_id, text)
    * frame to per-document item counts (doc_id, item, n); its gram
    * passes run over TOUCHED documents only. */
  def rollForwardCms(s: SparkSession, oldDir: String, newDir: String,
                     key: String, oldDocs: DataFrame, newDocs: DataFrame,
                     depth: Int, width: Int, salt: String = "cms")
                    (tokens: DataFrame => DataFrame): DataFrame = {
    val changes = ChangeCapture.diff(
        oldDocs.select("doc_id", "text"), newDocs.select("doc_id", "text"),
        "doc_id")
      .filter(col("change") =!= "unchanged")
    val oldCounters = FrameStore.getOrBuild(s, oldDir, key)(
      SketchOps.cmsCounters(
        tokens(oldDocs.select("doc_id", "text")),
        col("item"), col("n"), depth, width, salt))
    val departed = tokens(changes
        .filter(col("change").isin("delete", "update"))
        .select(col("doc_id"), col("old.text").as("text")))
      .select(col("item"), (-col("n")).as("n"))
    val arrived = tokens(changes
        .filter(col("change").isin("insert", "update"))
        .select(col("doc_id"), col("new.text").as("text")))
      .select(col("item"), col("n"))
    val deltaCounters = SketchOps.cmsCounters(
      departed.unionByName(arrived), col("item"), col("n"), depth, width, salt)
    val rolled = oldCounters.unionByName(deltaCounters)
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") =!= 0L)
    FrameStore.getOrBuild(s, newDir, key)(rolled)
  }

  /** Roll a durable HLL register family forward. Registers are
    * max-monotone — they absorb arrivals and cannot forget — so the
    * delta-bounded roll applies ONLY to an append-only delta (pure
    * inserts: the daily-dump-grows case). Any delete or update falls
    * back to a full rebuild from `newDocs`, deliberately: carrying
    * registers across a shrunken corpus would overestimate forever
    * and silently diverge from the family's rebuild semantics. The
    * published frame is identical either way (merge(build(A),
    * build(B)) ≡ build(A ∪ B), the q110-proven property); only the
    * work differs. `items` maps (doc_id, text) to an `item` column. */
  def rollForwardHllRegisters(s: SparkSession, oldDir: String,
                              newDir: String, key: String,
                              oldDocs: DataFrame, newDocs: DataFrame,
                              b: Int, salt: String = "hll")
                             (items: DataFrame => DataFrame): DataFrame = {
    val changes = ChangeCapture.diff(
        oldDocs.select("doc_id", "text"), newDocs.select("doc_id", "text"),
        "doc_id")
      .filter(col("change") =!= "unchanged")
    val hasRemoval = !changes
      .filter(col("change").isin("delete", "update")).isEmpty
    // the old frame is read (building it only if never published) on
    // the merge arm ONLY — the rebuild arm must not pay a full
    // old-corpus register pass just to discard it
    val rolled =
      if (hasRemoval)
        SketchOps.hllRegisters(
          items(newDocs.select("doc_id", "text")), col("item"), b, salt)
      else {
        val oldRegs = FrameStore.getOrBuild(s, oldDir, key)(
          SketchOps.hllRegisters(
            items(oldDocs.select("doc_id", "text")), col("item"), b, salt))
        SketchOps.hllMerge(oldRegs, SketchOps.hllRegisters(
          items(changes.filter(col("change") === "insert")
            .select(col("doc_id"), col("new.text").as("text"))),
          col("item"), b, salt))
      }
    FrameStore.getOrBuild(s, newDir, key)(rolled)
  }

  private def dupOf(occ: DataFrame, cnt: DataFrame,
                    minOccurrences: Long): DataFrame =
    occ.join(cnt.filter(col("cnt") >= minOccurrences).select("gkey"),
        Seq("gkey"), "left_semi")
      .select("gkey", "doc_id", "n_tokens", "pos")
}
