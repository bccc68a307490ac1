package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Durable, cross-session store for corpus-derived family frames —
  * the [[graft.ext.SignatureStore]] staged-write/atomic-publish
  * pattern generalized from MinHash signatures to EVERY session-shared
  * artifact (MinHash signature + candidate frames, embedding near-dup
  * pairs and resolved cluster labels, ExactSubstr gram/span builds,
  * the band-sensitivity scoreboard, the purchase graph and its
  * BFS/k-core labelings, PQ/IVF fit tables).
  *
  * Why: the ×1000 rehearsal showed the session memo solves the
  * warm-path cost but leaves the COLD path at minutes per family
  * (q150 191 s, q194 216 s first-call builds) — and those frames die
  * with the session. A 100 TB deployment pays each family build once
  * per corpus and persists the artifact NEXT TO the corpus; this store
  * is that shape: the first session builds and publishes, every later
  * session — including a fresh process — answers off the parquet
  * artifact with a plain scan (so pruning/projection work as for any
  * table).
  *
  * Addressing: the root is any Hadoop-FileSystem URI — a bare local
  * path, `file://...`, `hdfs://...`, or an object store like
  * `s3a://...` — resolved through the session's Hadoop configuration.
  * That is the point of speaking the `org.apache.hadoop.fs` API
  * instead of `java.nio.file`: a 100 TB corpus lives on HDFS/S3, and
  * the durable frames must live next to it.
  *
  * Durability contract, rename-free (object stores have no atomic
  * directory rename, so the commit point is a MARKER, not a move):
  * each build attempt writes its parquet + schema JSON directly into a
  * uniquely-named `data-<uuid>` directory under the frame dir — never
  * touched by any other attempt — and then publishes with a single
  * create-if-absent of the `_GRAFT_COMMIT` marker file naming that
  * data directory. A crash at any point leaves either no marker (next
  * caller rebuilds; the orphaned data dir is swept by the next
  * successful publish or by [[invalidate]]) or a complete, immutable
  * artifact. Concurrent publishers each stage into their OWN data dir;
  * exactly one marker create wins, losers delete their orphan and read
  * the winner's copy. The one non-atomic window — a crash between
  * marker create and the ~20-byte content write — is self-healing: a
  * marker that names no complete data dir is treated as unpublished
  * and deleted before rebuild (no permanently wedged key).
  *
  * The written schema rides along (`_graft_schema.json`) so even a
  * zero-row frame (a parquet dir with no part files) reads back with
  * its exact column names and types; nullability widens to `true` on
  * read — Spark treats every file source as nullable — which is the
  * safe direction for all consumers.
  *
  * Keying: `<root>/<corpusSlug>-<md5(corpusDir)>/<key>` — the key
  * carries the family parameters (e.g. `embpairs6`, `esspans20`), the
  * corpus path is baked into the layout, and the store assumes the
  * corpus directory is IMMUTABLE under that path (the SignatureStore
  * contract): re-generating a corpus in place requires dropping its
  * store subtree ([[invalidate]]).
  *
  * Opt-in: enabled when `spark.graft.frameStore.path` (or the
  * `SPARK_GRAFT_FRAME_STORE` env) names a directory; otherwise
  * [[getOrBuild]] is the identity on `build` and behavior is exactly
  * the session-memo-only shape.
  */
object FrameStore {

  private val CommitMarker = "_GRAFT_COMMIT"
  private val SchemaFile = "_graft_schema.json"
  private val DataPrefix = "data-"

  def configuredRoot(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.frameStore.path")
      .orElse(sys.env.get("SPARK_GRAFT_FRAME_STORE"))
      .filter(_.nonEmpty)

  private def md5Hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** `<root>/<corpusSlug>-<md5(dir) take 12>` — one subtree per corpus. */
  private[graft] def corpusDir(root: String, dir: String): HPath = {
    val slug = dir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last match {
      case "" => "corpus"
      case s  => s.replaceAll("[^A-Za-z0-9._-]", "_")
    }
    new HPath(root, s"$slug-${md5Hex(dir).take(12)}")
  }

  private[graft] def frameDir(root: String, dir: String, key: String): HPath =
    new HPath(corpusDir(root, dir), key.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** Resolve the Hadoop FileSystem for `root`.
    *
    * S3A contract of the marker commit: `fs.create(marker,
    * overwrite=false)` is atomic on HDFS and local filesystems; on
    * S3A it is atomic ONLY with conditional writes (Hadoop ≥ 3.4's
    * `fs.s3a.create.conditional`, an S3 If-None-Match PUT) — we set
    * that flag here so clusters that support it get the atomic commit
    * for free. Without it S3A degrades to check-then-PUT, so two
    * concurrent publishers can transiently BOTH "win" the marker. The
    * degradation is benign, not corrupting, and is spec-pinned
    * (FrameStoreSpec "S3A degradation"): every reader re-resolves the
    * marker on every call, a second winner's overwrite just redirects
    * readers to its (complete, immutable) data dir, and the worst
    * interleaving — a stale post-commit sweep deleting the dir the
    * final marker names — self-heals because a marker naming no
    * complete data dir reads as unpublished and the next caller
    * rebuilds. No wedge, no wrong rows; the cost is one rebuild.
    *
    * Store-private FileSystem instances, one per (session, scheme,
    * authority), built with `FileSystem.newInstance` so the
    * conditional-create conf ACTUALLY APPLIES: Hadoop's global FS
    * cache keys on (scheme, authority, UGI), so `getFileSystem` would
    * silently hand back any s3a FS the session already opened for
    * corpus reads — with its original conf, without the atomic-create
    * upgrade. Keyed THROUGH the session (SessionMemo) rather than
    * globally, because each session's Hadoop conf (endpoints,
    * credentials, custom fs.<scheme>.impl) must keep applying to its
    * own store traffic; entries die with the session's context like
    * every other memoized artifact. */
  private val fsMemo = new graft.SessionMemo[String, FileSystem]

  private def fileSystemFor(s: SparkSession, root: String): FileSystem = {
    val uri = new HPath(root).toUri
    val cacheKey =
      s"${Option(uri.getScheme).getOrElse("")}://${Option(uri.getAuthority).getOrElse("")}"
    fsMemo.getOrBuild(s, cacheKey) {
      val conf = s.sessionState.newHadoopConf()
      // both spellings: HADOOP-19256 shipped the gate as
      // fs.s3a.create.conditional.enabled; set the bare key too for
      // forward-compatibility. On Hadoop < 3.4 the flag is unknown and
      // ignored; there S3A degrades to check-then-PUT, and the
      // degradation contract the spec pins (double-win converges,
      // swept-marker self-heals) holds without it.
      conf.setIfUnset("fs.s3a.create.conditional.enabled", "true")
      conf.setIfUnset("fs.s3a.create.conditional", "true")
      FileSystem.newInstance(uri, conf)
    }
  }

  private def readSmallFile(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeSmallFile(fs: FileSystem, p: HPath, content: String,
                             overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** The data directory a VALID published marker names, or None when
    * the key is unpublished — including the self-heal case of a torn
    * marker (created but its content or data dir never landed). */
  private def publishedDataDir(fs: FileSystem, fd: HPath): Option[HPath] = {
    val marker = new HPath(fd, CommitMarker)
    if (!fs.exists(marker)) None
    else {
      val name = readSmallFile(fs, marker).trim
      if (!name.startsWith(DataPrefix)) None // torn marker: empty/garbage
      else {
        val dataDir = new HPath(fd, name)
        if (fs.exists(new HPath(dataDir, SchemaFile))) Some(dataDir) else None
      }
    }
  }

  private[graft] def published(fs: FileSystem, fd: HPath): Boolean =
    publishedDataDir(fs, fd).isDefined

  /** Delete data dirs no marker names — pre-commit crash leftovers and
    * losing concurrent attempts. Only called AFTER a marker exists, so
    * an in-flight sibling attempt that is about to lose its marker race
    * would be deleted anyway. */
  private def sweepOrphans(fs: FileSystem, fd: HPath): Unit =
    publishedDataDir(fs, fd).foreach { winner =>
      fs.listStatus(fd).foreach { st: FileStatus =>
        val nm = st.getPath.getName
        if (st.isDirectory && nm.startsWith(DataPrefix) && nm != winner.getName)
          fs.delete(st.getPath, true)
      }
    }

  private def readFrame(s: SparkSession, fs: FileSystem, fd: HPath): DataFrame = {
    val dataDir = publishedDataDir(fs, fd).getOrElse(
      throw new IllegalStateException(s"frame at $fd is not published"))
    val schema = DataType.fromJson(
      readSmallFile(fs, new HPath(dataDir, SchemaFile))).asInstanceOf[StructType]
    // explicit schema: exact round-trip (nullability, zero-row frames)
    s.read.schema(schema).parquet(dataDir.toString)
  }

  /** The stored frame for (corpus dir, key), building and publishing it
    * first if absent; identity on `build` when no store is configured. */
  def getOrBuild(s: SparkSession, dir: String, key: String)
                (build: => DataFrame): DataFrame =
    configuredRoot(s) match {
      case None => build
      case Some(root) =>
        val fs = fileSystemFor(s, root)
        val fd = frameDir(root, dir, key)
        val marker = new HPath(fd, CommitMarker)
        if (!published(fs, fd)) {
          // torn marker (create landed, content/data never did): self-heal
          if (fs.exists(marker)) fs.delete(marker, false)
          val df = build
          val dataName = DataPrefix +
            java.util.UUID.randomUUID().toString.take(12)
          val dataDir = new HPath(fd, dataName)
          // Everything up to the marker create is PRE-COMMIT: if any of
          // it fails while a concurrent publisher has committed, we are
          // the benign loser — the winner's post-commit sweep may even
          // have deleted our in-flight staging out from under the write
          // job. Fall through to read the winner; rethrow real failures.
          try {
            df.write.mode("overwrite").parquet(dataDir.toString)
            writeSmallFile(fs, new HPath(dataDir, SchemaFile), df.schema.json,
              overwrite = true)
            // commit point: ONE create-if-absent of the marker
            writeSmallFile(fs, marker, dataName, overwrite = false)
            // post-commit: reclaim pre-commit crash leftovers and
            // losing attempts (their publishers recover right here)
            sweepOrphans(fs, fd)
          } catch {
            case e: Throwable =>
              if (published(fs, fd)) fs.delete(dataDir, true)
              else throw e
          }
        }
        readFrame(s, fs, fd)
    }

  /** Drop one stored frame (or, with `key = None`, the corpus's whole
    * subtree) — the maintenance path for a corpus regenerated in place. */
  def invalidate(s: SparkSession, dir: String, key: Option[String] = None): Unit =
    configuredRoot(s).foreach { root =>
      val fs = fileSystemFor(s, root)
      fs.delete(key.map(k => frameDir(root, dir, k))
        .getOrElse(corpusDir(root, dir)), true)
    }

  /** Keys currently published for the corpus — inspection/spec hook. */
  def publishedKeys(s: SparkSession, dir: String): Seq[String] =
    configuredRoot(s).toSeq.flatMap { root =>
      val fs = fileSystemFor(s, root)
      val cd = corpusDir(root, dir)
      if (!fs.exists(cd)) Seq.empty
      else fs.listStatus(cd).toSeq
        .filter(st => st.isDirectory && published(fs, st.getPath))
        .map(_.getPath.getName).sorted
    }
}
