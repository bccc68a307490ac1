package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed MinHash signature index for BATCH dedup over a
  * growing corpus — the amortization the sf100 rehearsal showed is
  * missing: a cold `nearDedup` run spends its time (318 s at 2M docs)
  * in the one-time shingle→hash→min signature pass, which is a pure
  * function of each document alone. Persisting `(doc_id, sig)` once
  * means every later run — and every run over a corpus that only GREW —
  * recomputes signatures for the NEW documents only, then band-joins
  * the stored frame ([[DedupOps.candidatePairsFromSignatures]]).
  *
  * Addressing and durability follow [[graft.etl.FrameStore]] (r12): the
  * store is any Hadoop-FileSystem URI — bare local path, `file://`,
  * `hdfs://`, `s3a://` — and segments commit with a MARKER, not a
  * rename, because object stores have no atomic directory rename. Each
  * append writes its parquet directly into an immutable
  * `segdata-<uuid>` directory, then publishes it with one
  * create-if-absent of a `seg-<n>` marker FILE naming that directory.
  * A crash before the marker leaves an unreferenced data dir: the
  * update's documents stay missing from [[read]], so the next [[update]]
  * recomputes exactly them (idempotence), and [[compact]] sweeps the
  * orphan. A torn marker (created, content never landed) names nothing
  * and is skipped on read; its number is simply burned. Concurrent
  * appenders race the marker create and the loser retries on the next
  * number — both segments land.
  *
  * Documents are assumed IMMUTABLE under their `doc_id` (the store is
  * content-addressed by id): a re-presented id is skipped, never
  * recomputed. A corpus whose documents MUTATE needs a delete path —
  * filter-and-[[compact]] serves small cases, and
  * [[graft.etl.FrameMaintenance.rollForwardMinhash]] is the
  * snapshot-roll form over the FrameStore twin of this index.
  *
  * Scale shape: the missing-id set comes from one LEFT ANTI join of
  * corpus ids against stored ids (broadcast when the store is small,
  * shuffle otherwise — Catalyst's call); the signature pass runs only
  * over the anti-join survivors; reads are a plain multi-path parquet
  * scan, so partition pruning and column projection work as for any
  * table. */
object SignatureStore {

  private val SegPrefix = "seg-"
  private val DataPrefix = "segdata-"

  private def fsFor(spark: SparkSession, store: String): FileSystem =
    new HPath(store).getFileSystem(spark.sessionState.newHadoopConf())

  private def readSmall(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Committed segments as (marker name, data dir), marker-ordered;
    * torn markers (no valid data dir) are skipped. */
  private[graft] def listSegments(spark: SparkSession, store: String)
      : Seq[(String, HPath)] = {
    val fs = fsFor(spark, store)
    val root = new HPath(store)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(SegPrefix))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val name = readSmall(fs, st.getPath).trim
        val dd = if (name.startsWith(DataPrefix)) new HPath(root, name) else null
        if (dd != null && fs.exists(dd)) Seq(st.getPath.getName -> dd)
        else Seq.empty
      }
  }

  /** All stored signatures as `(doc_id, sig)`, or None for an
    * empty/absent store. */
  def read(spark: SparkSession, store: String): Option[DataFrame] = {
    val segs = listSegments(spark, store)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(_._2.toString): _*))
  }

  private def appendSegment(spark: SparkSession, df: DataFrame,
                            store: String): Unit = {
    val fs = fsFor(spark, store)
    val root = new HPath(store)
    val dataName = DataPrefix + java.util.UUID.randomUUID().toString.take(12)
    df.write.mode("overwrite").parquet(new HPath(root, dataName).toString)
    // commit: claim the lowest free segment number; a concurrent
    // appender winning a number just pushes us to the next one
    var n = fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(SegPrefix))
      .map(_.stripPrefix(SegPrefix).toLong)
      .foldLeft(-1L)(math.max) + 1
    var committed = false
    while (!committed) {
      val marker = new HPath(root, f"$SegPrefix$n%012d")
      try {
        val out = fs.create(marker, false)
        try out.write(dataName.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        committed = true
      } catch {
        case _: java.io.IOException if fs.exists(marker) => n += 1
      }
    }
  }

  /** Ensure every document of `corpus` has a stored signature,
    * computing and appending ONLY the missing ones; returns the full
    * post-update signature frame. `corpus` must expose the given id and
    * text columns; signature parameters must match across every update
    * of one store (they define the store, so they're the caller's
    * versioning key — bake them into the path). */
  def update(spark: SparkSession, store: String, corpus: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             shingleSize: Int = 3, numHashes: Int = 32,
             portable: Boolean = true): DataFrame = {
    val docs = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val missing = read(spark, store) match {
      case None => docs
      case Some(stored) =>
        docs.join(stored.select("doc_id"), Seq("doc_id"), "left_anti")
    }
    // persisted across the emptiness probe and the segment write, so
    // the signature pass for the missing docs runs ONCE; the common
    // steady-state (no new docs) skips the write entirely
    val fresh = DedupOps.minhashSignatures(
        missing, col("doc_id"), col("text"), shingleSize, numHashes, portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try if (!fresh.isEmpty) appendSegment(spark, fresh, store)
    finally fresh.unpersist(false)
    read(spark, store).getOrElse(fresh)
  }

  /** Fold every segment into one (drops the per-update segmentation;
    * also the delete path: pass a `keep` predicate to drop rows).
    * Sweeps orphaned data dirs from pre-commit crashes. */
  def compact(spark: SparkSession, store: String,
              keep: Option[org.apache.spark.sql.Column] = None): Unit =
    read(spark, store).foreach { all =>
      val kept = keep.map(all.filter).getOrElse(all)
        .localCheckpoint() // sever from the files about to be replaced
      val fs = fsFor(spark, store)
      val root = new HPath(store)
      fs.listStatus(root).toSeq
        .filter(st => st.getPath.getName.startsWith(SegPrefix) ||
          st.getPath.getName.startsWith(DataPrefix))
        .foreach(st => fs.delete(st.getPath, true))
      appendSegment(spark, kept, store)
    }
}
