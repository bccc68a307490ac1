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
