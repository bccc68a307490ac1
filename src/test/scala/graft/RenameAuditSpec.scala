package graft

import java.net.URI
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.FrameStore
import graft.ext.SignatureStore

/** Records every rename and create that crosses the FileSystem API —
  * the instrument that turns "the commit protocol is rename-free" from
  * prose into an assertion. Registered under the `graftaudit://`
  * scheme; behaves as the local FS otherwise. */
class RenameAuditFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftaudit:///")

  override def rename(src: HPath, dst: HPath): Boolean = {
    RenameAuditFileSystem.renames.add((src.toUri.getPath, dst.toUri.getPath))
    super.rename(src, dst)
  }

  // RawLocalFileSystem implements both create overloads independently
  // (the permission one does NOT funnel into the other), so record both
  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    RenameAuditFileSystem.creates.add((f.toUri.getPath, overwrite))
    super.create(f, permission, overwrite, bufferSize, replication, blockSize,
      progress)
  }

  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    RenameAuditFileSystem.creates.add((f.toUri.getPath, overwrite))
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object RenameAuditFileSystem {
  val renames: java.util.List[(String, String)] =
    java.util.Collections.synchronizedList(new java.util.ArrayList)
  val creates: java.util.List[(String, Boolean)] =
    java.util.Collections.synchronizedList(new java.util.ArrayList)
  def reset(): Unit = { renames.clear(); creates.clear() }
}

/** Structural proof that the durable stores are object-store-safe: on
  * S3 a directory rename is a non-atomic copy, so the round-12 commit
  * protocol must never rename ACROSS its commit boundary. Under the
  * auditing FS, a full publish + fresh-read cycle may rename only
  * INSIDE an immutable `data-*`/`segdata-*` staging directory (Spark's
  * FileOutputCommitter at work — the part a real S3 deployment swaps
  * for an S3-native committer without touching the protocol), and the
  * commit point itself is exactly one create-if-absent marker: never
  * renamed, never overwritten. */
class RenameAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = SparkTestSession.sfDir

  private def auditedSession(root: String) = {
    // register the scheme on the context-level hadoop conf (the base
    // every sessionState.newHadoopConf() copies from)
    spark.sparkContext.hadoopConfiguration.set("fs.graftaudit.impl",
      classOf[RenameAuditFileSystem].getName)
    val s = spark.newSession()
    s.conf.set("spark.graft.frameStore.path", root)
    s
  }

  private def auditedRoot(): String =
    "graftaudit://" + Files.createTempDirectory("renameaudit").toString

  /** The staging-dir prefix of a path, or None when the path is not
    * inside one — e.g. `/x/frame/data-ab12cd34-ef/part-0.parquet` →
    * `/x/frame/data-ab12cd34-ef`. */
  private def stagingPrefix(p: String): Option[String] = {
    val segs = p.split("/")
    val i = segs.indexWhere(s => s.startsWith("data-") || s.startsWith("segdata-"))
    if (i < 0) None else Some(segs.take(i + 1).mkString("/"))
  }

  test("FrameStore publish + fresh read: renames confined to the staging dir; marker is one create-if-absent") {
    val root = auditedRoot()
    RenameAuditFileSystem.reset()

    val sA = auditedSession(root)
    val build = Tables.load(sA, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
    val a = FrameStore.getOrBuild(sA, sfDir, "auditlen")(build)
    val aRows = a.orderBy("doc_id").collect().map(_.toString).toSeq

    val sB = auditedSession(root)
    val b = FrameStore.getOrBuild(sB, sfDir, "auditlen")(
      fail("fresh session must read the published frame, not rebuild"))
    assert(b.orderBy("doc_id").collect().map(_.toString).toSeq == aRows)

    val renames = RenameAuditFileSystem.renames.asScala.toSeq
    assert(renames.nonEmpty,
      "the local FileOutputCommitter should have exercised the rename audit")
    renames.foreach { case (src, dst) =>
      val sp = stagingPrefix(src); val dp = stagingPrefix(dst)
      assert(sp.isDefined && sp == dp,
        s"rename escaped its staging dir: $src -> $dst")
      assert(!src.contains("_GRAFT_COMMIT") && !dst.contains("_GRAFT_COMMIT"),
        s"commit marker must never be renamed: $src -> $dst")
    }

    val markerCreates = RenameAuditFileSystem.creates.asScala.toSet
      .filter(_._1.endsWith("_GRAFT_COMMIT"))
    assert(markerCreates.size == 1, s"exactly one commit, got $markerCreates")
    assert(!markerCreates.head._2, "commit marker must be create-if-absent")
  }

  test("SignatureStore segments: same discipline across initial and incremental updates") {
    val root = auditedRoot() + "/sigs"
    val s = auditedSession(root)
    val docs = Tables.load(s, sfDir, "documents").select("doc_id", "text")
    RenameAuditFileSystem.reset()

    SignatureStore.update(s, root, docs.filter(col("doc_id") % 2 === 0))
    SignatureStore.update(s, root, docs) // incremental: odd ids only
    val stored = SignatureStore.read(s, root)
    assert(stored.exists(_.count() == docs.count()))

    RenameAuditFileSystem.renames.asScala.toSeq.foreach { case (src, dst) =>
      val sp = stagingPrefix(src); val dp = stagingPrefix(dst)
      assert(sp.isDefined && sp == dp,
        s"rename escaped its staging dir: $src -> $dst")
    }
    val segCreates = RenameAuditFileSystem.creates.asScala.toSet
      .filter(c => c._1.matches(".*/seg-\\d+$"))
    assert(segCreates.map(_._1.split("/").last).toSeq.sorted ==
      Seq("seg-000000000000", "seg-000000000001"),
      s"two segment commits expected, got $segCreates")
    assert(segCreates.forall(!_._2), "segment markers must be create-if-absent")
  }
}
