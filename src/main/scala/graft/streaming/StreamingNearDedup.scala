package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.DedupOps

/** Streaming MinHash/LSH near-duplicate dedup — the streaming half of
  * [[graft.ext.DedupOps.nearDedup]], closing the last batch/stream
  * asymmetry in the dedup family (exact dedup already has
  * [[StreamingDedup]]).
  *
  * Semantics per micro-batch: a document is DROPPED if it is a
  * verified near-duplicate (exact n-gram Jaccard ≥ threshold over
  * LSH band candidates — the same keys and verify as the batch path)
  * of an already-emitted document, or of a surviving earlier-id
  * document in the same batch (within-batch clusters resolve
  * transitively via [[DedupOps.resolveClusters]], exactly like batch).
  * Emitted documents are never retracted: a later "bridge" document
  * that would have merged two already-emitted clusters in a full batch
  * run is itself dropped, but cannot un-emit either cluster head —
  * the one inherent stream/batch divergence. When ids arrive in
  * ascending order (monotone ingest), stream output ≡ batch
  * `nearDedup` minus such bridges; the spec pins bit-equality on a
  * bridge-free two-batch corpus.
  *
  * State = a parquet survivor index of `(doc_id, text, sig)` rows —
  * MinHash signatures are computed ONCE per document (the shingle+hash
  * pass is the expensive part) and only re-BANDED per batch (a narrow
  * projection); the candidate join is on (band, bucket), never
  * all-pairs.
  *
  * Index maintenance is LSM-shaped so per-batch I/O is O(batch), not
  * O(index): each micro-batch appends its survivors as one immutable
  * SEGMENT directory (`seg-<batchId>`, staged then atomically
  * renamed), then size-TIERED compaction runs: whenever `mergeFactor`
  * segments share a size class (floor log₂ of their byte size), they
  * fold into one segment named after their newest member
  * (`seg-<batchId>-c`), cascading upward like LSM level merges.
  * Untouched segments are HARD-LINKED into the rebuilt store (same
  * inode, zero data copied — the local stand-in for a table-format
  * manifest that re-points at unchanged data files), so a large
  * compacted segment is never rewritten when small fresh ones merge:
  * amortized maintenance I/O per document is O(log n) rewrites over
  * the index's lifetime, and the segment count stays
  * O(mergeFactor · log n). `maxSegments` remains a hard backstop
  * (full fold) for pathological size distributions. Every rebuild
  * uses the same tmp-rewrite → whole-store atomic-swap + crash-repair
  * discipline as the CDC apply. Replay of a micro-batch after a
  * pre-checkpoint crash is detected by its batchId segment (plain or
  * compacted) already existing and is skipped — segment contents are
  * deterministic, so skip ≡ rewrite (effectively exactly-once). Only
  * the newest batchId can ever be replayed; it is the max-named
  * stream segment, so any merge group containing it names the merged
  * segment `seg-<batchId>-c`, preserving the replay marker; a merge
  * that does NOT contain it implies a later batch ran, whose
  * checkpoint commit makes the merged-away ids unreplayable. (Ad-hoc
  * `seg-adhoc-*` segments only ever merge with each other — their
  * names sort after every numeric batchId and carry no replay
  * contract.) At 100 TB the segment append becomes a table-format
  * manifest commit, the tiered fold a background rewrite, and the
  * (band, bucket) lookup a state-store/bucketed-table point join; the
  * dataflow below is the part that stays.
  */
object StreamingNearDedup {

  private def rmTree(p: java.nio.file.Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private def recover(store: String): Unit = {
    val dir = Paths.get(store)
    val bak = Paths.get(store + "._apply_bak")
    val tmp = Paths.get(store + "._apply_tmp")
    val tmpData = Paths.get(store + "._apply_tmp_data")
    val segTmp = Paths.get(store + "._seg_tmp")
    if (Files.exists(bak)) {
      if (!Files.exists(dir)) Files.move(bak, dir, StandardCopyOption.ATOMIC_MOVE)
      else rmTree(bak)
    }
    Seq(tmp, tmpData, segTmp).foreach(p => if (Files.exists(p)) rmTree(p))
  }

  /** Segment directories of the store, oldest-first. The store holds
    * ONLY `seg-*` children (plus transient staging siblings outside
    * it), so a plain listing is the manifest. */
  private[graft] def listSegments(store: String): Seq[Path] = {
    val dir = Paths.get(store)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("seg-"))
      .sortBy(_.getFileName.toString)
  }

  private def readIndex(spark: SparkSession, store: String): Option[DataFrame] = {
    val segs = listSegments(store)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(_.toString): _*))
  }

  /** Survivors emitted so far: the documents of the index store. */
  def emitted(spark: SparkSession, indexStore: String): DataFrame =
    readIndex(spark, indexStore).map(_.select("doc_id", "text"))
      .getOrElse(spark.emptyDataFrame)

  private def segName(batchId: Long, compacted: Boolean): String =
    f"seg-$batchId%012d" + (if (compacted) "-c" else "")

  /** Stage `df` as parquet and atomically publish it as `store/<name>`. */
  private def appendSegment(df: DataFrame, store: String, name: String): Unit = {
    val segTmp = Paths.get(store + "._seg_tmp")
    df.write.mode("overwrite").parquet(segTmp.toString)
    Files.createDirectories(Paths.get(store))
    Files.move(segTmp, Paths.get(store, name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def segBytes(p: Path): Long =
    Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  /** Recreate `src`'s tree at `dst` with hard links to the data files:
    * same inodes, zero bytes copied — the local-FS stand-in for a
    * table-format manifest re-pointing at unchanged files. */
  private def linkTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.createLink(t, p)
    }

  /** Merged segment carries its newest member's name + `-c`, so a merge
    * containing the newest batchId preserves the replay marker. */
  private def mergedName(group: Seq[Path]): String =
    group.map(_.getFileName.toString).max.stripSuffix("-c") + "-c"

  /** Replace the `drop` segments with `merged` published as `name`,
    * hard-linking every untouched segment into the rebuilt store, then
    * whole-store atomic swap (tmp store → bak → live; crash windows
    * repaired by [[recover]]). Only the dropped segments' bytes are
    * rewritten. */
  private def rebuildStore(merged: DataFrame, store: String,
                           drop: Set[String], name: String): Unit = {
    val tmpData = Paths.get(store + "._apply_tmp_data")
    val tmpStore = Paths.get(store + "._apply_tmp")
    // materialize BEFORE touching the live store: `merged` reads the
    // very segment files the swap will retire
    merged.write.mode("overwrite").parquet(tmpData.toString)
    Files.createDirectories(tmpStore)
    listSegments(store).filterNot(s => drop(s.getFileName.toString))
      .foreach(s => linkTree(s, tmpStore.resolve(s.getFileName.toString)))
    Files.move(tmpData, tmpStore.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    val dir = Paths.get(store)
    if (Files.exists(dir)) {
      val bak = Paths.get(store + "._apply_bak")
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmpStore, dir, StandardCopyOption.ATOMIC_MOVE)
      rmTree(bak)
    } else Files.move(tmpStore, dir, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Size-tiered maintenance: while any `mergeFactor` segments of the
    * same kind (stream vs ad-hoc) share a size class (floor log₂
    * bytes), fold them into one segment — cascading upward as merged
    * segments graduate classes, LSM-style. If the count still exceeds
    * `maxSegments` afterwards (pathological size spread), full-fold. */
  private[graft] def maintain(spark: SparkSession, store: String,
                              maxSegments: Int, mergeFactor: Int): Unit = {
    var repeat = true
    while (repeat) {
      val segs = listSegments(store)
      val group = segs.groupBy { s =>
        val kind = s.getFileName.toString.startsWith("seg-adhoc")
        (kind, 63 - java.lang.Long.numberOfLeadingZeros(math.max(segBytes(s), 1L)))
      }.values.find(_.size >= mergeFactor)
      group match {
        case Some(g) =>
          rebuildStore(spark.read.parquet(g.map(_.toString): _*), store,
            g.map(_.getFileName.toString).toSet, mergedName(g))
        case None =>
          if (segs.size > maxSegments)
            rebuildStore(spark.read.parquet(segs.map(_.toString): _*), store,
              segs.map(_.getFileName.toString).toSet, mergedName(segs))
          repeat = false
      }
    }
  }

  private[graft] def processBatch(batch: DataFrame, indexStore: String,
                                  shingleSize: Int, numHashes: Int, bands: Int,
                                  jaccardThreshold: Double, batchId: Long = -1L,
                                  maxSegments: Int = 8,
                                  mergeFactor: Int = 4): Unit = {
    recover(indexStore)
    // replay short-circuit: this batch's segment (plain or compacted)
    // already published means the batch fully applied before the
    // checkpoint was lost; contents are deterministic, so skip ≡ redo
    if (batchId >= 0 &&
      (Files.exists(Paths.get(indexStore, segName(batchId, compacted = false))) ||
        Files.exists(Paths.get(indexStore, segName(batchId, compacted = true))))) return
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val rowsPerBand = numHashes / bands

    // within-batch near-dedup first: transitive clusters inside the
    // batch resolve exactly like the batch operator (min id kept).
    // release=true: micro-batches are exactly the changing-inputs
    // case the cache-release flag exists for — default persists would
    // accumulate one dead CacheManager entry per batch
    val batchKept = DedupOps.nearDedup(batch, col("doc_id"), col("text"),
      shingleSize, numHashes, bands, jaccardThreshold, release = true)

    // signature pass runs ONCE per surviving batch doc; stored docs
    // reuse the signature persisted in the index. LEFT join: a text
    // too short to shingle has no signature row — it carries a null
    // sig (no band keys → never a candidate) and survives, same as in
    // the batch path
    val newSigs = batchKept
      .join(DedupOps.minhashSignatures(batchKept, col("doc_id"), col("text"),
        shingleSize, numHashes), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("sig"))

    val survivors = readIndex(spark, indexStore) match {
      case None => newSigs
      case Some(stored) =>
        // candidate join keyed exactly like the batch band join, but in
        // two stages so the probe stays NARROW: band keys alone
        // (doc_id, band, bucket) flow through the (band, bucket) join —
        // the index side's text column is never exploded bands× into
        // the shuffle, and parquet column pruning keeps the index scan
        // to (doc_id, sig) — then text is fetched for CANDIDATE pairs
        // only (candidate-sized, broadcast under AQE) and verified with
        // the same exact n-gram Jaccard as the batch path. A doc
        // matching ANY emitted survivor is dropped, so no cross-batch
        // resolution pass is needed (emitted survivors are mutually
        // non-duplicate).
        def bandKeys(df: DataFrame, idAs: String): DataFrame = df
          .select(col("doc_id").as(idAs),
            explode(DedupOps.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bb"))
          .select(col(idAs), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        val candPairs = bandKeys(newSigs, "id_n")
          .join(bandKeys(stored, "id_s"), Seq("band", "bucket"))
          .select("id_n", "id_s")
          .distinct()
        val dupIds = candPairs
          .join(newSigs.select(col("doc_id").as("id_n"), col("text").as("text_n")),
            Seq("id_n"))
          .join(stored.select(col("doc_id").as("id_s"), col("text").as("text_s")),
            Seq("id_s"))
          .filter(DedupOps.ngramJaccard(col("text_n"), col("text_s"), shingleSize)
            >= jaccardThreshold)
          .select(col("id_n").as("doc_id"))
          .distinct()
        newSigs.join(dupIds, Seq("doc_id"), "left_anti")
    }

    val surv = survivors.persist()
    try {
      if (batchId >= 0) {
        // publish even an empty segment: it is the replay marker
        appendSegment(surv, indexStore, segName(batchId, compacted = false))
      } else if (!surv.isEmpty) {
        // ad-hoc (non-streaming) call: no replay contract, skip
        // empties; probe for a free name (maintenance shrinks counts,
        // so the size alone can collide with a survivor of a merge)
        val name = Iterator.from(listSegments(indexStore).size)
          .map(i => f"seg-adhoc-$i%06d")
          .find(n => !Files.exists(Paths.get(indexStore, n)) &&
            !Files.exists(Paths.get(indexStore, n + "-c"))).get
        appendSegment(surv, indexStore, name)
      }
      maintain(spark, indexStore, maxSegments, mergeFactor)
    } finally surv.unpersist()
  }

  /** Start near-deduping the `docs` stream (rows: doc_id, text) into
    * the survivor index at `indexStore`. Processes everything
    * available, then stops; read results with [[emitted]]. */
  def start(docs: DataFrame, indexStore: String, checkpointDir: String,
            shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
            jaccardThreshold: Double = 0.8, maxSegments: Int = 8,
            mergeFactor: Int = 4): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) =>
        processBatch(batch, indexStore, shingleSize, numHashes, bands,
          jaccardThreshold, batchId = id, maxSegments = maxSegments,
          mergeFactor = mergeFactor))
      .trigger(Trigger.AvailableNow())
      .start()
}
