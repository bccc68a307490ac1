package graft.ext

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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
  * Layout and durability follow the streaming survivor index
  * ([[graft.streaming.StreamingNearDedup]]): the store is a directory
  * of immutable `seg-<n>` parquet segment dirs; appends stage to a
  * `._seg_tmp` sibling and publish with one atomic rename, so a crash
  * mid-update leaves either the old store or the old store plus a
  * complete new segment — never a torn one. `update` is idempotent:
  * re-running it after any crash point re-derives the same missing-id
  * set (minus whatever the published segment already holds).
  *
  * Documents are assumed IMMUTABLE under their `doc_id` (the store is
  * content-addressed by id): a re-presented id is skipped, never
  * recomputed. A corpus whose documents MUTATE needs a delete path —
  * filter-and-[[compact]] serves small cases; at scale that's a
  * table-format delete (the same boundary StreamingNearDedup documents
  * for its segment appends at 100 TB).
  *
  * Scale shape: the missing-id set comes from one LEFT ANTI join of
  * corpus ids against stored ids (broadcast when the store is small,
  * shuffle otherwise — Catalyst's call); the signature pass runs only
  * over the anti-join survivors; reads are a plain multi-path parquet
  * scan, so partition pruning and column projection work as for any
  * table. */
object SignatureStore {

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private[graft] def listSegments(store: String): Seq[Path] = {
    val root = Paths.get(store)
    if (!Files.isDirectory(root)) Seq.empty
    else Files.list(root).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("seg-"))
      .sortBy(_.getFileName.toString)
  }

  /** All stored signatures as `(doc_id, sig)`, or None for an
    * empty/absent store. */
  def read(spark: SparkSession, store: String): Option[DataFrame] = {
    val segs = listSegments(store)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(_.toString): _*))
  }

  private def nextSegName(store: String): String = {
    val n = listSegments(store)
      .map(_.getFileName.toString.stripPrefix("seg-").toLong)
      .foldLeft(-1L)(math.max) + 1
    f"seg-$n%012d"
  }

  private def appendSegment(df: DataFrame, store: String): Unit = {
    Files.createDirectories(Paths.get(store))
    val tmp = Paths.get(store + "._seg_tmp")
    rmTree(tmp) // leftover from a pre-publish crash — contents stale
    df.write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, Paths.get(store, nextSegName(store)),
      StandardCopyOption.ATOMIC_MOVE)
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
    try if (!fresh.isEmpty) appendSegment(fresh, store)
    finally fresh.unpersist(false)
    read(spark, store).getOrElse(fresh)
  }

  /** Fold every segment into one (drops the per-update segmentation;
    * also the delete path: pass a `keep` predicate to drop rows). */
  def compact(spark: SparkSession, store: String,
              keep: Option[org.apache.spark.sql.Column] = None): Unit =
    read(spark, store).foreach { all =>
      val kept = keep.map(all.filter).getOrElse(all)
        .localCheckpoint() // sever from the files about to be replaced
      listSegments(store).foreach(rmTree)
      appendSegment(kept, store)
    }
}
