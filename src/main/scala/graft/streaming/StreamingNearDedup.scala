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
  * renamed), and once the store holds `maxSegments` segments the next
  * batch folds everything into a single compacted segment
  * (`seg-<batchId>-c`) using the same tmp-rewrite → whole-store
  * atomic-swap + crash-repair discipline as the CDC apply. Replay of a
  * micro-batch after a pre-checkpoint crash is detected by its batchId
  * segment (plain or compacted) already existing and is skipped —
  * segment contents are deterministic, so skip ≡ rewrite (effectively
  * exactly-once). Only the newest batchId can ever be replayed, and a
  * later batch's compaction implies the earlier checkpoint committed,
  * so a compacted-away segment is never the replay target. At 100 TB
  * the segment append becomes a table-format manifest commit, the
  * compaction a background rewrite, and the (band, bucket) lookup a
  * state-store/bucketed-table point join; the dataflow below is the
  * part that stays.
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

  /** Fold every existing segment plus `survivors` into one compacted
    * segment, swapped in wholesale (tmp store → bak → live, crash
    * windows repaired by [[recover]]). */
  private def compactInto(spark: SparkSession, survivors: DataFrame,
                          store: String, name: String): Unit = {
    val merged = readIndex(spark, store)
      .map(_.unionByName(survivors)).getOrElse(survivors)
    val tmpData = Paths.get(store + "._apply_tmp_data")
    val tmpStore = Paths.get(store + "._apply_tmp")
    merged.write.mode("overwrite").parquet(tmpData.toString)
    Files.createDirectories(tmpStore)
    Files.move(tmpData, tmpStore.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    val dir = Paths.get(store)
    if (Files.exists(dir)) {
      val bak = Paths.get(store + "._apply_bak")
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmpStore, dir, StandardCopyOption.ATOMIC_MOVE)
      rmTree(bak)
    } else Files.move(tmpStore, dir, StandardCopyOption.ATOMIC_MOVE)
  }

  private[graft] def processBatch(batch: DataFrame, indexStore: String,
                                  shingleSize: Int, numHashes: Int, bands: Int,
                                  jaccardThreshold: Double, batchId: Long = -1L,
                                  maxSegments: Int = 8): Unit = {
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
        def banded(df: DataFrame, suffix: String): DataFrame = df
          .select(col("doc_id").as("id" + suffix), col("text").as("text" + suffix),
            explode(DedupOps.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bb"))
          .select(col("id" + suffix), col("text" + suffix),
            col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        // candidate join keyed exactly like the batch band join; verify
        // with the same exact n-gram Jaccard — a doc matching ANY
        // emitted survivor is dropped, so no cross-batch resolution pass
        // is needed (emitted survivors are mutually non-duplicate)
        val dupIds = banded(newSigs, "_n")
          .join(banded(stored, "_s"), Seq("band", "bucket"))
          .filter(DedupOps.ngramJaccard(col("text_n"), col("text_s"), shingleSize)
            >= jaccardThreshold)
          .select(col("id_n").as("doc_id"))
          .distinct()
        newSigs.join(dupIds, Seq("doc_id"), "left_anti")
    }

    val surv = survivors.persist()
    try {
      val segs = listSegments(indexStore)
      if (segs.size + 1 > maxSegments) {
        // fold the whole store + this batch into one segment; name it
        // by this batchId so a replay still short-circuits
        compactInto(spark, surv, indexStore,
          segName(math.max(batchId, 0L), compacted = true))
      } else if (batchId >= 0) {
        // publish even an empty segment: it is the replay marker
        appendSegment(surv, indexStore, segName(batchId, compacted = false))
      } else if (!surv.isEmpty) {
        // ad-hoc (non-streaming) call: no replay contract, skip empties
        appendSegment(surv, indexStore, f"seg-adhoc-${segs.size}%06d")
      }
    } finally surv.unpersist()
  }

  /** Start near-deduping the `docs` stream (rows: doc_id, text) into
    * the survivor index at `indexStore`. Processes everything
    * available, then stops; read results with [[emitted]]. */
  def start(docs: DataFrame, indexStore: String, checkpointDir: String,
            shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
            jaccardThreshold: Double = 0.8, maxSegments: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) =>
        processBatch(batch, indexStore, shingleSize, numHashes, bands,
          jaccardThreshold, batchId = id, maxSegments = maxSegments))
      .trigger(Trigger.AvailableNow())
      .start()
}
