package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

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
  * State = a parquet survivor index `(doc_id, text, sig)` — MinHash
  * signatures are computed ONCE per document (the shingle+hash pass is
  * the expensive part) and only re-BANDED per batch (a narrow
  * projection); the candidate join is on (band, bucket), never
  * all-pairs. The index is maintained with the same tmp-rewrite →
  * atomic-swap + [[StreamingApply.recover]]-style repair discipline as
  * the CDC apply, so a replayed micro-batch re-derives the same index
  * (effectively exactly-once). At 100 TB the swap becomes a table-
  * format manifest commit and the (band, bucket) lookup a state-store/
  * bucketed-table point join; the dataflow below is the part that
  * stays.
  */
object StreamingNearDedup {

  private def rmTree(p: java.nio.file.Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private def recover(store: String): Unit = {
    val dir = Paths.get(store)
    val bak = Paths.get(store + "._apply_bak")
    val tmp = Paths.get(store + "._apply_tmp")
    if (Files.exists(bak)) {
      if (!Files.exists(dir)) Files.move(bak, dir, StandardCopyOption.ATOMIC_MOVE)
      else rmTree(bak)
    }
    if (Files.exists(tmp)) rmTree(tmp)
  }

  private def swapIn(merged: DataFrame, store: String): Unit = {
    val dir = Paths.get(store)
    val tmp = Paths.get(store + "._apply_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (Files.exists(dir)) {
      val bak = Paths.get(store + "._apply_bak")
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      rmTree(bak)
    } else Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Survivors emitted so far: the documents of the index store. */
  def emitted(spark: SparkSession, indexStore: String): DataFrame =
    if (Files.exists(Paths.get(indexStore)))
      spark.read.parquet(indexStore).select("doc_id", "text")
    else spark.emptyDataFrame

  private[graft] def processBatch(batch: DataFrame, indexStore: String,
                                  shingleSize: Int, numHashes: Int, bands: Int,
                                  jaccardThreshold: Double): Unit = {
    recover(indexStore)
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

    val haveIndex = Files.exists(Paths.get(indexStore))
    val survivors = if (!haveIndex) newSigs else {
      val stored = spark.read.parquet(indexStore)
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

    val merged =
      if (haveIndex) spark.read.parquet(indexStore).unionByName(survivors)
      else survivors
    swapIn(merged, indexStore)
  }

  /** Start near-deduping the `docs` stream (rows: doc_id, text) into
    * the survivor index at `indexStore`. Processes everything
    * available, then stops; read results with [[emitted]]. */
  def start(docs: DataFrame, indexStore: String, checkpointDir: String,
            shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
            jaccardThreshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) =>
        processBatch(batch, indexStore, shingleSize, numHashes, bands,
          jaccardThreshold))
      .trigger(Trigger.AvailableNow())
      .start()
}
