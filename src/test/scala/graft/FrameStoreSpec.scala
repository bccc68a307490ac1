package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.FrameStore

/** The durable family-frame store: crash-safe publish, build-once
  * across sessions, bit-exact round trips — plus the [[SessionMemo]]
  * lifecycle guarantees (single concurrent build, eviction hook). */
class FrameStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = SparkTestSession.sfDir

  /** Fresh session (own conf) with a fresh store root. */
  private def storedSession(root: String) = {
    val s = spark.newSession()
    s.conf.set("spark.graft.frameStore.path", root)
    s
  }

  test("unconfigured store is the identity: build returned as-is, nothing written") {
    val s = spark.newSession()
    val df = s.range(5).toDF("x")
    val out = FrameStore.getOrBuild(s, sfDir, "idtest")(df)
    assert(out eq df)
    assert(FrameStore.publishedKeys(s, sfDir).isEmpty)
  }

  test("build runs once; second session reads the published artifact bit-identically") {
    val root = Files.createTempDirectory("framestore").toString
    val builds = new AtomicInteger(0)
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds.incrementAndGet()
      Tables.load(s, sfDir, "documents")
        .select(col("doc_id"), length(col("text")).as("len"),
          split(col("text"), "\\s+").as("toks"))
    }
    val sA = storedSession(root)
    val a = FrameStore.getOrBuild(sA, sfDir, "doclen")(build(sA))
    val aRows = a.orderBy("doc_id").collect().map(_.toString)
    assert(builds.get() == 1)
    assert(FrameStore.publishedKeys(sA, sfDir) == Seq("doclen"))

    val sB = storedSession(root)
    val b = FrameStore.getOrBuild(sB, sfDir, "doclen")(build(sB))
    assert(builds.get() == 1, "a NEW session must answer off disk, not rebuild")
    assert(b.schema == a.schema)
    assert(b.orderBy("doc_id").collect().map(_.toString).toSeq == aRows.toSeq)
    // and the plan is a plain parquet scan of the store (pruning/
    // projection apply as for any table)
    assert(b.queryExecution.sparkPlan.toString.contains(root))
  }

  test("zero-row frames round-trip exactly (schema rides along)") {
    val root = Files.createTempDirectory("framestore").toString
    val s = storedSession(root)
    val empty = s.range(1).toDF("x")
      .select(col("x"), lit("y").as("s")).filter(col("x") < 0)
    FrameStore.getOrBuild(s, sfDir, "empty")(empty)
    val back = FrameStore.getOrBuild(s, sfDir, "empty")(
      fail("must not rebuild"): org.apache.spark.sql.DataFrame)
    // names+types exact; nullability widens to true (Spark treats all
    // file sources as nullable — documented FrameStore contract)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == empty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 0)
  }

  test("a staged (pre-commit crash) data dir is not a published frame and gets swept") {
    val root = Files.createTempDirectory("framestore").toString
    val s = storedSession(root)
    // simulate a crash mid-write: data dir exists, no commit marker
    val fd = Paths.get(FrameStore.frameDir(root, sfDir, "crashkey").toString)
    val stale = fd.resolve("data-stalecrash")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-stale.parquet"), Array[Byte](1, 2, 3))
    assert(FrameStore.publishedKeys(s, sfDir).isEmpty)
    val out = FrameStore.getOrBuild(s, sfDir, "crashkey")(
      s.range(3).toDF("x"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(FrameStore.publishedKeys(s, sfDir) == Seq("crashkey"))
    assert(!Files.exists(stale), "orphan pre-commit data dir must be swept")
  }

  test("a torn commit marker (created, content never landed) self-heals on rebuild") {
    val root = Files.createTempDirectory("framestore").toString
    val s = storedSession(root)
    val fd = Paths.get(FrameStore.frameDir(root, sfDir, "tornkey").toString)
    Files.createDirectories(fd)
    Files.write(fd.resolve("_GRAFT_COMMIT"), Array.emptyByteArray)
    assert(FrameStore.publishedKeys(s, sfDir).isEmpty,
      "a marker naming no complete data dir is not a published frame")
    val out = FrameStore.getOrBuild(s, sfDir, "tornkey")(s.range(2).toDF("x"))
    assert(out.count() == 2)
    assert(FrameStore.publishedKeys(s, sfDir) == Seq("tornkey"))
  }

  test("concurrent publishers of one key: both stage, one commit wins, one data dir survives") {
    val root = Files.createTempDirectory("framestore").toString
    val builds = new AtomicInteger(0)
    val bothBuilding = new CountDownLatch(2)
    val pool = Executors.newFixedThreadPool(2)
    // two SESSIONS race the same key; the latch holds both inside build
    // so neither can publish before the other has started staging
    val futs = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        def call(): Seq[String] = {
          val s = storedSession(root)
          FrameStore.getOrBuild(s, sfDir, "racekey") {
            builds.incrementAndGet()
            bothBuilding.countDown()
            assert(bothBuilding.await(30, TimeUnit.SECONDS))
            s.range(4).toDF("x")
          }.orderBy("x").collect().map(_.toString).toSeq
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val results = futs.map(_.get())
    assert(builds.get() == 2, "latch must force a genuine publish race")
    assert(results(0) == results(1))
    // exactly one data dir + the marker remain — the loser swept its own
    val fd = Paths.get(FrameStore.frameDir(root, sfDir, "racekey").toString)
    val dataDirs = Files.list(fd).iterator().asScala
      .filter(_.getFileName.toString.startsWith("data-")).toSeq
    assert(dataDirs.size == 1, s"expected one surviving data dir, got $dataDirs")
    // and a later fresh session reads without rebuilding
    val s3 = storedSession(root)
    val back = FrameStore.getOrBuild(s3, sfDir, "racekey")(
      fail("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(back.orderBy("x").collect().map(_.toString).toSeq == results(0))
  }

  test("S3A degradation: a double-win marker overwrite converges; a marker naming a swept dir self-heals") {
    // On S3A without conditional writes, create-if-absent is
    // check-then-PUT: two publishers can transiently BOTH "win" the
    // marker. This pins the documented saving properties on a real
    // store: (1) readers re-resolve the marker every call, so a second
    // winner's overwrite just redirects them to its complete data dir
    // — no rebuild, no wrong rows; (2) the worst interleaving — a
    // stale post-commit sweep deleted the dir the final marker names —
    // self-heals to a rebuild, never a wedge.
    val root = Files.createTempDirectory("framestore").toString
    val s = storedSession(root)
    FrameStore.getOrBuild(s, sfDir, "s3akey")(s.range(3).toDF("x"))
    val fd = Paths.get(FrameStore.frameDir(root, sfDir, "s3akey").toString)

    // publisher B "wins" AFTER A's commit: stages its own complete
    // data dir, then force-overwrites the marker (the S3A PUT)
    val bDir = fd.resolve("data-s3aracewin")
    val bDf = s.range(100, 104).toDF("x")
    bDf.write.mode("overwrite").parquet(bDir.toString)
    Files.write(bDir.resolve("_graft_schema.json"),
      bDf.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the overwrite goes through the Hadoop FS API (as B's PUT would),
    // which also maintains LocalFileSystem's checksum sidecar
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    val mOut = hfs.create(
      new org.apache.hadoop.fs.Path(fd.resolve("_GRAFT_COMMIT").toString), true)
    try mOut.write("data-s3aracewin".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally mOut.close()

    val afterOverwrite = FrameStore.getOrBuild(storedSession(root), sfDir, "s3akey")(
      fail("a reader after a double-win must NOT rebuild"): org.apache.spark.sql.DataFrame)
    assert(afterOverwrite.collect().map(_.getLong(0)).sorted.toSeq
      == Seq(100L, 101L, 102L, 103L),
      "readers must follow the overwritten marker to the second winner's frame")

    // worst case: A's stale sweep deleted the dir B's marker names
    def rmTree(p: java.nio.file.Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
    rmTree(bDir)
    assert(FrameStore.publishedKeys(storedSession(root), sfDir).isEmpty,
      "a marker naming an absent data dir must read as unpublished")
    val builds = new AtomicInteger(0)
    val s4 = storedSession(root)
    val healed = FrameStore.getOrBuild(s4, sfDir, "s3akey") {
      builds.incrementAndGet()
      s4.range(7).toDF("x")
    }
    assert(builds.get() == 1, "self-heal is one rebuild, not a wedge")
    assert(healed.count() == 7)
    // converged: one surviving data dir; later readers answer off disk
    val dataDirs = Files.list(fd).iterator().asScala
      .filter(_.getFileName.toString.startsWith("data-")).toSeq
    assert(dataDirs.size == 1, s"sweep must reclaim every loser: $dataDirs")
    val back = FrameStore.getOrBuild(storedSession(root), sfDir, "s3akey")(
      fail("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(back.count() == 7)
  }

  test("a file:// Hadoop-FS URI root behaves identically to a bare local path") {
    val local = Files.createTempDirectory("framestore")
    val root = "file://" + local.toString
    val builds = new AtomicInteger(0)
    val sA = storedSession(root)
    val a = FrameStore.getOrBuild(sA, sfDir, "urikey") {
      builds.incrementAndGet()
      Tables.load(sA, sfDir, "documents")
        .select(col("doc_id"), length(col("text")).as("len"))
    }
    val aRows = a.orderBy("doc_id").collect().map(_.toString)
    assert(builds.get() == 1)
    assert(FrameStore.publishedKeys(sA, sfDir) == Seq("urikey"))
    val sB = storedSession(root)
    val b = FrameStore.getOrBuild(sB, sfDir, "urikey")(
      fail("must not rebuild"): org.apache.spark.sql.DataFrame)
    assert(b.orderBy("doc_id").collect().map(_.toString).toSeq == aRows.toSeq)
    // the artifact landed under the URI root on the local disk
    assert(Files.exists(Paths.get(
      FrameStore.frameDir(local.toString, sfDir, "urikey").toString)))
  }

  test("invalidate drops one key, then the whole corpus subtree") {
    val root = Files.createTempDirectory("framestore").toString
    val s = storedSession(root)
    FrameStore.getOrBuild(s, sfDir, "k1")(s.range(2).toDF("x"))
    FrameStore.getOrBuild(s, sfDir, "k2")(s.range(2).toDF("x"))
    FrameStore.invalidate(s, sfDir, Some("k1"))
    assert(FrameStore.publishedKeys(s, sfDir) == Seq("k2"))
    FrameStore.invalidate(s, sfDir)
    assert(FrameStore.publishedKeys(s, sfDir).isEmpty)
  }

  test("sharedFrame family answers a NEW session warm off disk, bit-identically") {
    val root = Files.createTempDirectory("framestore").toString
    val sA = storedSession(root)
    val a = QueryHelpers.minhashPairs(sA, sfDir)
      .orderBy("id_a", "id_b").collect().map(_.toString)
    // the signature frame and the candidate-pair frame both published
    val keys = FrameStore.publishedKeys(sA, sfDir)
    assert(keys.contains("mhsigs") && keys.contains("mhpairs"))

    val sB = storedSession(root)
    val pairsB = QueryHelpers.minhashPairs(sB, sfDir)
    assert(pairsB.orderBy("id_a", "id_b").collect().map(_.toString).toSeq
      == a.toSeq)
  }

  test("PQ fit re-hydrates a NEW session from the published codebook") {
    val root = Files.createTempDirectory("framestore").toString
    val sA = storedSession(root)
    val (_, _, centA) = QueryHelpers.pqFitted(sA, sfDir)
    val keys = FrameStore.publishedKeys(sA, sfDir)
    assert(keys.contains("pq-qv") && keys.contains("pq-cent"))

    val sB = storedSession(root)
    val (qvB, _, centB) = QueryHelpers.pqFitted(sB, sfDir)
    assert(centB.flatten.flatten.toSeq == centA.flatten.flatten.toSeq)
    // the quantized frame is the stored artifact, not a rebuild
    assert(qvB.queryExecution.sparkPlan.toString.contains(root))
  }

  test("BPE induction re-hydrates a NEW session from the published tables") {
    val root = Files.createTempDirectory("framestore").toString
    val sA = storedSession(root)
    val docs = Tables.load(sA, sfDir, "documents").limit(50)
    val key = s"bpe-spec:$sfDir"
    val mA = graft.ext.BpeOps.bpeMerges(docs, col("text"), rounds = 2,
      cacheKey = Some(key)).collect().map(_.toString).sorted.toSeq
    assert(FrameStore.publishedKeys(sA, key).toSet
      == Set("bpe-2-merges", "bpe-2-vocab"))

    val sB = storedSession(root)
    val docsB = Tables.load(sB, sfDir, "documents").limit(50)
    val mB = graft.ext.BpeOps.bpeMerges(docsB, col("text"), rounds = 2,
      cacheKey = Some(key))
    assert(mB.queryExecution.sparkPlan.toString.contains(root))
    assert(mB.collect().map(_.toString).sorted.toSeq == mA)
  }

  test("SessionMemo: concurrent first callers share one build") {
    val memo = new SessionMemo[String, java.lang.Long]
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    val results = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[java.lang.Long] {
        def call(): java.lang.Long = {
          gate.await()
          memo.getOrBuild(spark, "k") {
            Thread.sleep(50) // widen the race window
            Long.box(builds.incrementAndGet().toLong)
          }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(builds.get() == 1, "losing concurrent callers must share the winner's build")
    assert(results.map(_.get()).distinct.size == 1)
  }

  test("SessionMemo: a throwing build is retried, then session eviction forgets entries") {
    val memo = new SessionMemo[String, String]
    var attempts = 0
    def failing: String = { attempts += 1; throw new RuntimeException("boom") }
    intercept[RuntimeException] { memo.getOrBuild(spark, "k")(failing) }
    // a failed build removes its holder: the NEXT caller's OWN thunk
    // runs (the first caller's captured closure is not replayed)
    val v = memo.getOrBuild(spark, "k")("ok")
    assert(v == "ok" && attempts == 1,
      "a failed build must not be cached, and must not pin the failed thunk")
    assert(memo.entryCount == 1)
    memo.evictSession(CachePolicy.sessionId(spark))
    assert(memo.entryCount == 0)
  }
}
