package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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
  * Durability contract (SignatureStore's): a frame is built into a
  * staged `._tmp` sibling and published with ONE atomic rename, so a
  * crash at any point leaves either no artifact (next caller rebuilds)
  * or a complete one — never a torn frame. A concurrent publisher race
  * is benign: the loser's rename fails against the winner's complete
  * directory and the loser reads the winner's copy. The written
  * schema rides along (`_graft_schema.json`) so even a zero-row frame
  * (a parquet dir with no part files) reads back with its exact
  * column names and types; nullability widens to `true` on read —
  * Spark treats every file source as nullable — which is the safe
  * direction for all consumers.
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

  def configuredRoot(s: SparkSession): Option[String] =
    s.conf.getOption("spark.graft.frameStore.path")
      .orElse(sys.env.get("SPARK_GRAFT_FRAME_STORE"))
      .filter(_.nonEmpty)

  private def md5Hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** `<root>/<corpusSlug>-<md5(dir) take 12>` — one subtree per corpus. */
  private[graft] def corpusDir(root: String, dir: String): Path = {
    val slug = Option(Paths.get(dir).getFileName).map(_.toString)
      .getOrElse("corpus").replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get(root, s"$slug-${md5Hex(dir).take(12)}")
  }

  private def frameDir(root: String, dir: String, key: String): Path =
    corpusDir(root, dir).resolve(key.replaceAll("[^A-Za-z0-9._-]", "_"))

  private def published(fd: Path): Boolean = Files.exists(fd.resolve("_SUCCESS"))

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private def readFrame(s: SparkSession, fd: Path): DataFrame = {
    val schemaFile = fd.resolve("_graft_schema.json")
    val schema = DataType.fromJson(new String(
      Files.readAllBytes(schemaFile), StandardCharsets.UTF_8))
      .asInstanceOf[StructType]
    // explicit schema: exact round-trip (nullability, zero-row frames)
    s.read.schema(schema).parquet(fd.toString)
  }

  /** The stored frame for (corpus dir, key), building and publishing it
    * first if absent; identity on `build` when no store is configured. */
  def getOrBuild(s: SparkSession, dir: String, key: String)
                (build: => DataFrame): DataFrame =
    configuredRoot(s) match {
      case None => build
      case Some(root) =>
        val fd = frameDir(root, dir, key)
        if (!published(fd)) {
          val df = build
          val tmp = fd.getParent.resolve("._" + fd.getFileName + "_tmp")
          Files.createDirectories(fd.getParent)
          rmTree(tmp) // leftover from a pre-publish crash — contents stale
          df.write.mode("overwrite").parquet(tmp.toString)
          Files.write(tmp.resolve("_graft_schema.json"),
            df.schema.json.getBytes(StandardCharsets.UTF_8))
          try Files.move(tmp, fd, StandardCopyOption.ATOMIC_MOVE)
          catch {
            // a concurrent publisher won; its artifact is complete
            case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.DirectoryNotEmptyException
              if published(fd) => rmTree(tmp)
          }
        }
        readFrame(s, fd)
    }

  /** Drop one stored frame (or, with `key = None`, the corpus's whole
    * subtree) — the maintenance path for a corpus regenerated in place. */
  def invalidate(s: SparkSession, dir: String, key: Option[String] = None): Unit =
    configuredRoot(s).foreach { root =>
      rmTree(key.map(k => frameDir(root, dir, k))
        .getOrElse(corpusDir(root, dir)))
    }

  /** Keys currently published for the corpus — inspection/spec hook. */
  def publishedKeys(s: SparkSession, dir: String): Seq[String] =
    configuredRoot(s).toSeq.flatMap { root =>
      val cd = corpusDir(root, dir)
      if (!Files.isDirectory(cd)) Seq.empty
      else Files.list(cd).iterator().asScala
        .filter(p => published(p)).map(_.getFileName.toString).toSeq.sorted
    }
}
