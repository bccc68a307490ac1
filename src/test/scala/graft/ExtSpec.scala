package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext._

class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and distributed joins"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "el gato y el perro en la casa es un animal que come y duerme")
  ).toDF("doc_id", "text")

  test("exact dedup finds the planted duplicate class") {
    val classes = DedupOps.exactDupClasses(docs, col("doc_id"), col("text")).collect()
    assert(classes.length == 4)
    assert(classes.count(_.getLong(1) == 2L) == 1) // one class of 2 copies
    val deduped = DedupOps.exactDedup(docs, col("text"))
    assert(deduped.count() == 4)
  }

  test("minhash LSH surfaces near-dup and exact-dup pairs, not unrelated") {
    val pairs = DedupOps.minhashCandidatePairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup always caught
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc never paired
  }

  test("ngram jaccard: identity 1.0, near-dup high, disjoint 0") {
    val row = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") === 0 && col("b.doc_id").isin(0, 1, 2))
      .select(col("b.doc_id"),
        DedupOps.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(row(0L) == 1.0)
    assert(row(1L) > 0.5 && row(1L) < 1.0)
    assert(row(2L) == 0.0)
  }

  test("simhash: identical texts collide; hamming to unrelated is large") {
    val h = DedupOps.simhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(3L))
    val near = java.lang.Long.bitCount(h(0L) ^ h(1L))
    val far = java.lang.Long.bitCount(h(0L) ^ h(2L))
    assert(near < far)
  }

  test("simhash near-dup pairs: band trick finds close hashes, hamming gate holds") {
    val pairs = DedupOps.simhashNearDupPairs(docs, col("doc_id"), col("text"),
      maxHamming = 3, bands = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 0) // exact dup: hamming 0
    assert(!pairs.keys.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc excluded
    assert(pairs.values.forall(_ <= 3))
    // completeness vs brute force at this k (pigeonhole: k < bands)
    val brute = DedupOps.simhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteClose = for {
      x <- brute.keys; y <- brute.keys if x < y
      if java.lang.Long.bitCount(brute(x) ^ brute(y)) <= 3
    } yield (x, y)
    assert(bruteClose.toSet == pairs.keySet)
  }

  test("cosine: orthogonal vectors 0, identical 1, zero-norm safe") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val out = df.select(SimilarityOps.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(out(2) == 0.0)
  }

  test("brute-force top-k: ranks ordered by cosine, no self-match, k respected") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val r = SimilarityOps.bruteForceTopK(q, c, 5).collect()
    assert(r.length == 15)
    assert(!r.exists(x => x.getLong(0) == x.getLong(1)))
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.sameElements(cos.sorted.reverse))
    }
  }

  test("hard-negative top-k: hits are cross-label and equal label-filtered brute force") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"),
      col("label").as("clabel"))
    val out = SimilarityOps.hardNegativesTopK(q, c, 5).collect()
    assert(out.length == 15)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall(r => labelOf(r.getLong(1)) != labelOf(r.getLong(0))))
    for (qid <- 0L to 2L) {
      val one = emb.filter(col("vec_id") === qid)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val slice = emb.filter(col("label") =!= labelOf(qid))
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val ref = SimilarityOps.bruteForceTopK(one, slice, 5).collect()
        .map(r => (r.getLong(1), r.getInt(3))).toSet
      val got = out.filter(_.getLong(0) == qid)
        .map(r => (r.getLong(1), r.getInt(3))).toSet
      assert(got == ref)
    }
  }

  test("LSH top-k is a subset-quality approximation of brute force") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val lsh = SimilarityOps.lshTopK(q, c, 5, dim = 64, bits = 4).collect()
    assert(lsh.nonEmpty && lsh.length <= 5)
    // every LSH hit shares the query's sign bucket by construction
    val bucketOfQ = emb.filter(col("vec_id") === 0)
      .select(SimilarityOps.signBucket(col("embedding"), 64, 4)).head().getLong(0)
    val hitIds = lsh.map(_.getLong(1)).toSet
    val buckets = emb.filter(col("vec_id").isin(hitIds.toSeq: _*))
      .select(SimilarityOps.signBucket(col("embedding"), 64, 4)).collect().map(_.getLong(0))
    assert(buckets.forall(_ == bucketOfQ))
  }

  test("hyperplane buckets are balanced (no leading-dims hot bucket)") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val n = emb.count()
    val bits = 4
    val sizes = emb
      .groupBy(SimilarityOps.signBucket(col("embedding"), 64, bits).as("b"))
      .count().collect().map(_.getLong(1))
    // random hyperplanes concentrate bucket sizes near n/2^bits: assert
    // no bucket owns more than 4x its fair share
    assert(sizes.max <= 4L * n / (1L << bits).max(1L))
  }

  test("multi-table LSH recall >= single-table recall") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(SimilarityOps.bruteForceTopK(q, c, 5))
    val t1 = hits(SimilarityOps.lshTopK(q, c, 5, dim = 64, bits = 6, tables = 1))
    val t2 = hits(SimilarityOps.lshTopK(q, c, 5, dim = 64, bits = 6, tables = 2))
    val r1 = (t1 intersect exact).size.toDouble / exact.size
    val r2 = (t2 intersect exact).size.toDouble / exact.size
    assert(r2 >= r1)
  }

  test("resolveClusters: chains merge transitively, min id labels the cluster") {
    // components: {1,2,3,4} via chain, {10,11}, isolated pairs only
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = DedupOps.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("resolveClusters: long path converges within the iteration cap") {
    val n = 64 // path graph 0-1-2-...-63: worst-case diameter for propagation
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val out = DedupOps.resolveClusters(pairs).collect()
    assert(out.length == n && out.forall(_.getLong(1) == 0L))
  }

  test("resolveClusters: chain round count is logarithmic in the diameter") {
    // the O(log d) claim, measured: each round's compress step reads the
    // SAME round's propagated labels, so label reach ~doubles per round.
    // A 1024-node path is the worst case for plain propagation (would
    // need ~1024 rounds); the bar is log₂(diameter)+2.
    val n = 1024
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val (labels, rounds) = DedupOps.resolveClustersCounted(pairs, maxIters = 64)
    val out = labels.collect()
    assert(out.length == n && out.forall(_.getLong(1) == 0L))
    val bound = (math.log(n - 1) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"chain of diameter ${n - 1} took $rounds rounds (bound $bound)")
  }

  test("nearDedup end-to-end keeps one doc per planted near-dup cluster") {
    val kept = DedupOps.nearDedup(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // docs 0,1,3 are a near/exact-dup cluster -> keep only min id 0
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(3L))
    assert(kept.contains(2L) && kept.contains(4L))
  }

  test("semanticDedup: greedy within-cluster prune keeps the lowest id") {
    import graft.ext.SimilarityOps
    // nlist=1 pins every vector to one cluster, isolating the prune
    // rule from the k-means fit (which q129's oracle re-derives)
    val rows = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(0.99f, 0.14f, 0f, 0f)), // cos(10,11) ≈ 0.990 → dropped
      (20L, Array(0f, 0f, 1f, 0f)),       // orthogonal to 10/11 → kept
      (21L, Array(0f, 0f, 0.1f, 0.99f)))  // cos(20,21) ≈ 0.10 → kept
    val df = rows.toDF("cid", "cvec")
    val out = SimilarityOps.semanticDedup(df, tau = 0.9, nlist = 1)
    assert(out.collect().map(_.getLong(0)).toSet == Set(10L, 20L, 21L))
    // tau above every pairwise cosine → nothing dropped
    val all = SimilarityOps.semanticDedup(df, tau = 0.9999, nlist = 1)
    assert(all.count() == 4)
  }

  test("autoSignBits: occupancy-targeted, monotone, clamped") {
    import graft.ext.SimilarityOps.autoSignBits
    assert(autoSignBits(0) == 4 && autoSignBits(1000) == 4) // min clamp
    assert(autoSignBits(500000) == 9)   // 500k/1000 -> 2^9 buckets
    assert(autoSignBits(5000000) == 13) // the sf100 regime
    assert(autoSignBits(1L << 60) == 24) // max clamp
    // monotone in n, antitone in targetBucket
    assert(autoSignBits(1 << 20) <= autoSignBits(1 << 22))
    assert(autoSignBits(1 << 20, targetBucket = 100) >=
      autoSignBits(1 << 20, targetBucket = 10000))
  }

  test("embeddingNearDupPairs defaults to occupancy-targeted signBits (two corpus sizes)") {
    // The production entry must not carry a pinned bit width across
    // corpus scales (the sf100 rehearsal's q47 lesson): the default is
    // AutoBits → autoSignBits(count). Pin the equivalence at two sizes:
    // the default-call pair set equals the explicit autoSignBits(n) call.
    import graft.ext.SimilarityOps.autoSignBits
    def corpus(n: Int) = (0 until n).map { i =>
      val r = math.toRadians((i * 7919) % 360)
      (i.toLong, Array(math.cos(r).toFloat, math.sin(r).toFloat))
    }.toDF("vid", "v")
    for (n <- Seq(50, 400)) {
      val df = corpus(n)
      def pairSet(df2: org.apache.spark.sql.DataFrame) = df2
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val auto = pairSet(DedupOps.embeddingNearDupPairs(
        df, col("vid"), col("v"), threshold = 0.95, dim = 2))
      val explicit = pairSet(DedupOps.embeddingNearDupPairs(
        df, col("vid"), col("v"), threshold = 0.95, dim = 2,
        signBits = autoSignBits(n)))
      assert(auto == explicit, s"auto default diverged at n=$n")
      assert(auto.nonEmpty) // 7919 mod 360 revisits angles → real pairs
    }
  }

  test("nearDedup with release=true matches default output and frees its caches") {
    // distinct fixture (salted ids) → distinct analyzed plans → no
    // CacheManager entry sharing with the other dedup tests
    val salted = docs.withColumn("doc_id", col("doc_id") + 1000L)
    val expect = DedupOps.nearDedup(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0) + 1000L).toSet
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val kept = DedupOps.nearDedup(salted, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, jaccardThreshold = 0.8,
      release = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expect)
    // the released call may leave behind only the frames that back its
    // (lazy) result: the checkpointed pairs frame and the final
    // resolveClusters label checkpoint — 2 RDDs, reclaimed when the
    // result is GC'd. The signature cache and every superseded round
    // checkpoint must be gone.
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 2, s"nearDedup(release=true) leaked ${added.size} caches")
  }

  test("nearDedupEmbeddings: transitive chain collapses to the min-id vector") {
    // a~b and b~c exceed the threshold, a~c does NOT (cos 50° ≈ 0.64):
    // only transitive resolution keeps exactly one of {a,b,c}
    def rot(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val df = Seq(
      (0L, rot(0)), (1L, rot(25)), (2L, rot(50)), // chain
      (10L, rot(180))                             // far away, kept
    ).toDF("vid", "v")
    val kept = DedupOps.nearDedupEmbeddings(df, col("vid"), col("v"),
      threshold = 0.9, dim = 2, signBits = 1)
      .select("vid").collect().map(_.getLong(0)).toSet
    if (kept.size < 4) { // chain shared a bucket → resolution must keep min id
      assert(kept.contains(0L) && !kept.contains(1L))
    }
    assert(kept.contains(10L))
    // pair graph sanity: a~c alone is below threshold
    val pairs = DedupOps.embeddingNearDupPairs(df, col("vid"), col("v"),
      threshold = 0.9, dim = 2, signBits = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 2L)))
  }

  test("minhashVerifiedPairs matches the two-pass candidates+verify result") {
    val one = DedupOps.minhashVerifiedPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16, estThreshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = DedupOps.minhashCandidatePairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 32, bands = 16)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == two)
  }

  test("corpus clean pipeline: gates, exact dedup, near-dup resolution compose") {
    val good = "the cat is in the house and that is fine because the dog is of the " +
      "same mind and the birds are in the garden near the house all day today"
    val corpus = Seq(
      (0L, good),                               // kept
      (1L, good),                               // exact dup of 0 -> dropped
      (2L, good + " tonight"),                  // near dup (shares min-5-gram fp w.h.p.)
      (3L, "el gato y el perro en la casa es un animal que come y duerme bien"), // not en
      (4L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))") // junk quality
    ).toDF("doc_id", "text")
    val summary = CorpusPipeline.cleanSummary(corpus, col("doc_id"), col("text"),
      lang = "en", minQuality = 0.3).collect().head
    assert(summary.getLong(0) == 5)        // n_input
    assert(summary.getLong(1) == 3)        // n_gated: 0,1,2 survive gates
    assert(summary.getLong(2) == 2)        // n_exact: {0|1}, 2
    assert(summary.getLong(3) <= 2)        // n_final: near-dup may collapse 2 into 0
    val kept = CorpusPipeline.clean(corpus, col("doc_id"), col("text"),
      lang = "en", minQuality = 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L)) // min id survives its class
    assert(!kept.contains(3L) && !kept.contains(4L))
  }

  test("langId picks English for English text, und for no-hit text") {
    val out = Seq("the cat is in the house and that is fine", "zzz qqq xxx")
      .toDF("text").select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(out(0) == "en")
    assert(out(1) == "und")
  }

  test("token count, quality score bounds, fingerprint determinism") {
    val df = Seq("one two three four five").toDF("text")
    assert(df.select(TextOps.tokenCount(col("text"))).head().getInt(0) == 5)
    val q = docs.select(TextOps.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    val f1 = docs.select(TextOps.fingerprint(col("text"), 5)).collect().map(_.getString(0))
    val f2 = docs.select(TextOps.fingerprint(col("text"), 5)).collect().map(_.getString(0))
    assert(f1.sameElements(f2))
    assert(f1(0) == f1(3)) // exact dups share a fingerprint
  }

  test("multimodal: real PNG decode via javax.imageio — dimensions and channel means") {
    import org.apache.spark.sql.Row
    // 8x4 solid red PNG rendered in-test (no external fixture needed)
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val mediaRows = java.util.Arrays.asList(
      Row(1L, "image", png, null),
      Row(2L, "image", Array.fill[Byte](16)(42), null), // not an image
      Row(3L, "audio", Array.fill[Byte](16)(1), null))  // not decoded
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)
    val out = MultimodalOps.extractImageFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(3) == 8 && out(1L).getInt(4) == 4)
    val feat = out(1L).getSeq[Float](5)
    assert(feat.length == 3 && feat(0) > 0.99f && feat(1) < 0.01f && feat(2) < 0.01f)
    assert(out(2L).isNullAt(3) && out(2L).isNullAt(5)) // garbage bytes -> nulls
    assert(out(3L).isNullAt(3)) // non-image kind skipped
    assert(out(2L).getInt(2) == 16) // byte count still reported
  }

  test("multimodal: dHash is pixel-deterministic and drives perceptual near-dup pairs") {
    import org.apache.spark.sql.Row
    // deterministic 90x80 grayscale gradients rendered in-test; the
    // dHash contract under test: identical pixels hash identically
    // across container formats, global brightness scaling is invariant
    // (gradient DIRECTION is the signal), and a one-row direction flip
    // moves exactly that row's 8 bits
    def render(fmt: String, dim: Double, flipRow: Int, reverse: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(90, 80,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 80; x <- 0 until 90) {
        val base = x * 255 / 89
        val v0 = if (reverse || y * 8 / 80 == flipRow) 255 - base else base
        val v = (v0 * dim).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val basePng = render("png", 1.0, -1, reverse = false)
    val baseBmp = render("bmp", 1.0, -1, reverse = false)
    assert(MultimodalOps.dhashImage(basePng).get ==
      MultimodalOps.dhashImage(baseBmp).get,
      "same pixels must hash identically across lossless containers")

    val mediaRows = java.util.Arrays.asList(
      Row(1L, "image", basePng, null),
      Row(2L, "image", render("png", 0.6, -1, reverse = false), null), // dimmed
      Row(3L, "image", render("png", 1.0, 3, reverse = false), null),  // one row flipped
      Row(4L, "image", render("png", 1.0, -1, reverse = true), null),  // reversed
      Row(5L, "image", Array.fill[Byte](16)(42), null))                // undecodable
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)

    val hashes = MultimodalOps.imageDhashes(spark, media)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(hashes(5L).isEmpty, "garbage bytes -> null dhash, row kept")
    assert(hashes(1L) == hashes(2L), "global brightness scaling is invariant")

    val pairs = MultimodalOps.imageNearDupPairs(spark, media,
        maxHamming = 10, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(pairs.toSeq == Seq((1L, 2L, 0), (1L, 3L, 8), (2L, 3L, 8)),
      "copy at hamming 0, row-flip at hamming 8, reversed image excluded")
  }

  test("multimodal: pattern-image render -> REAL decode+dHash equals the closed form") {
    // The q206 gate contract: a 9x8 pattern image has one pixel per
    // dHash grid cell, so the hash of the ENCODED bytes is analytically
    // predictable — dHash bit i (gy=i/8, gx=i%8) is set iff pattern bit
    // ((gy*9+gx) mod 64) < pattern bit ((gy*9+gx+1) mod 64). Pinning
    // the identity here means the driver oracle's relational replay and
    // the executor-side codec path can only agree by both being right.
    def analytic(bits: Long): Long = {
      def pix(q: Int): Int = ((bits >>> (q % 64)) & 1L).toInt
      (0 until 64).foldLeft(0L) { (d, i) =>
        val gy = i / 8; val gx = i % 8
        if (pix(gy * 9 + gx) < pix(gy * 9 + gx + 1)) d | (1L << i) else d
      }
    }
    val rnd = new scala.util.Random(13L)
    val patterns = Seq(0L, -1L, 0x5555555555555555L, Long.MinValue, 1L) ++
      Seq.fill(40)(rnd.nextLong())
    for (b <- patterns) {
      val viaCodec = MultimodalOps.dhashImage(MultimodalOps.renderPatternImage(b))
      assert(viaCodec.contains(analytic(b)),
        s"pattern $b: codec ${viaCodec} != analytic ${analytic(b)}")
    }
    // frame plumbing: renderPatternImages feeds imageDhashes by name
    import spark.implicits._
    val rendered = MultimodalOps.renderPatternImages(
      patterns.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("media_id", "bits"))
    val hashed = MultimodalOps.imageDhashes(spark, rendered)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for ((b, i) <- patterns.zipWithIndex)
      assert(hashed(i.toLong) == analytic(b))
  }

  test("multimodal: tone-WAV render -> REAL decode+fingerprint equals the closed form") {
    // The q208 gate contract, audio arm: 65 constant-amplitude tone
    // frames encode the pattern bits, so the fingerprint of the ENCODED
    // WAV is closed-form — bit i = patbit(i mod 64) < patbit((i+1) mod
    // 64), frame 64 wrapping to bit 0.
    def analytic(bits: Long): Long = {
      def b(q: Int): Int = ((bits >>> (q % 64)) & 1L).toInt
      (0 until 64).foldLeft(0L) { (d, i) =>
        if (b(i) < b((i + 1) % 64)) d | (1L << i) else d
      }
    }
    val rnd = new scala.util.Random(208L)
    val patterns = Seq(0L, -1L, 0x5555555555555555L, Long.MinValue, 1L) ++
      Seq.fill(40)(rnd.nextLong())
    for (p <- patterns) {
      val viaCodec = MultimodalOps.audioFingerprint(MultimodalOps.renderToneWav(p))
      assert(viaCodec.contains(analytic(p)),
        s"pattern $p: codec $viaCodec != analytic ${analytic(p)}")
    }
    // frame plumbing + audit contract: non-audio rows keep a null
    import spark.implicits._
    val rendered = MultimodalOps.renderToneWavs(
      patterns.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("media_id", "bits"))
    val fps = MultimodalOps.audioFingerprints(spark, rendered)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for ((p, i) <- patterns.zipWithIndex)
      assert(fps(i.toLong) == analytic(p))
    assert(MultimodalOps.audioFingerprint(Array.fill[Byte](16)(42)).isEmpty,
      "garbage bytes -> None, never a throw")
  }

  test("multimodal: COMPRESSED formats (JPEG, TIFF) decode for real on this JDK") {
    import org.apache.spark.sql.Row
    // Round-9 verdicts carried "compressed-media decode blocked on
    // sandbox codecs" — false for images: the headless JDK ships
    // pure-JVM JPEG and TIFF read/write SPIs, and decodeImage already
    // routes through ImageIO. This pins it with in-test fixtures.
    // JPEG is lossy (chroma subsampling), so channel means get loose
    // bounds; only MP3/compressed-audio and video remain stubbed.
    def render(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, 0xff0000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val mediaRows = java.util.Arrays.asList(
      Row(1L, "image", render("jpg"), null),
      Row(2L, "image", render("tiff"), null))
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)
    val out = MultimodalOps.extractImageFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getInt(3) == 8 && out(id).getInt(4) == 4)
      val feat = out(id).getSeq[Float](5)
      assert(feat(0) > 0.9f && feat(1) < 0.1f && feat(2) < 0.1f,
        s"media $id decoded means ${feat.mkString(",")}")
    }
  }

  test("multimodal: real image resize via headless Graphics2D — dims and color survive") {
    import org.apache.spark.sql.Row
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val mediaRows = java.util.Arrays.asList(
      Row(1L, "image", bos.toByteArray, null),
      Row(2L, "image", Array.fill[Byte](16)(42), null), // undecodable
      Row(3L, "audio", Array.fill[Byte](16)(1), null))  // non-image kind
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)
    val out = MultimodalOps.resizeImages(spark, media, 4, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(3) == 4 && out(1L).getInt(4) == 2)
    // re-decode the resized payload: target dims, still solid red
    val back = MultimodalOps.decodeImage(out(1L).getAs[Array[Byte]](2)).get
    assert(back._1 == 4 && back._2 == 2)
    assert(back._3(0) > 0.99f && back._3(1) < 0.01f && back._3(2) < 0.01f)
    assert(out(2L).isNullAt(2) && out(3L).isNullAt(2))
  }

  test("multimodal: real WAV decode via javax.sound.sampled — rate, duration, per-channel RMS") {
    import org.apache.spark.sql.Row
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // 100ms stereo 16-bit PCM WAV rendered in-test: ch0 = full-scale sine,
    // ch1 = silence. RMS expectations: sin -> 1/sqrt(2), silence -> 0.
    val rate = 8000
    val frames = rate / 10
    val pcm = new Array[Byte](frames * 4)
    for (f <- 0 until frames) {
      val s = (math.sin(2 * math.Pi * 440.0 * f / rate) * 32767).toInt
      pcm(f * 4) = (s & 0xff).toByte        // ch0 lo (little-endian)
      pcm(f * 4 + 1) = ((s >> 8) & 0xff).toByte
      pcm(f * 4 + 2) = 0                    // ch1 lo
      pcm(f * 4 + 3) = 0                    // ch1 hi
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 2, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val mediaRows = java.util.Arrays.asList(
      Row(1L, "audio", bos.toByteArray, null),
      Row(2L, "audio", Array.fill[Byte](16)(7), null),  // not a WAV
      Row(3L, "image", Array.fill[Byte](16)(1), null))  // non-audio kind
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)
    val out = MultimodalOps.extractAudioFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(3) == rate && out(1L).getInt(4) == 2)
    assert(out(1L).getLong(5) == 100L)
    val rms = out(1L).getSeq[Float](6)
    assert(rms.length == 2)
    assert(math.abs(rms(0) - 1.0 / math.sqrt(2)) < 0.01)
    assert(rms(1) < 0.001f)
    assert(out(2L).isNullAt(3) && out(2L).isNullAt(6))
    assert(out(3L).isNullAt(3))
  }

  test("multimodal: payload-sized repartition, stub features, frame plan") {
    import org.apache.spark.sql.Row
    val mediaRows = java.util.Arrays.asList(
      Row(1L, "image", Array.fill[Byte](64)(1), Row(640, 480, null, null)),
      Row(2L, "video", Array.fill[Byte](128)(2), Row(1920, 1080, null, 1000L)),
      Row(3L, "audio", null, Row(null, null, 44100, 2000L)))
    val media = spark.createDataFrame(mediaRows, MultimodalOps.mediaSchema)
    val feats = MultimodalOps.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == 3)
    assert(rows.find(_.getLong(0) == 3L).get.isNullAt(3)) // null payload -> null feature
    assert(rows.find(_.getLong(0) == 1L).get.getInt(2) == 64)
    val frames = MultimodalOps.frameSamplePlan(media, 250L)
    assert(frames.count() == 4) // 1000ms / 250ms
    assert(MultimodalOps.repartitionForPayloads(media).rdd.getNumPartitions >= 1)
  }

  test("vector expressions match their higher-order-function forms bit-for-bit") {
    import org.apache.spark.sql.types.DoubleType
    import graft.functions.VecExpressions
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings").limit(200)
    // VecDot vs aggregate(zip_with(...)): identical accumulation order →
    // zero tolerance, not epsilon
    val hofDot = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val dotDiff = emb.select(
        (VecExpressions.vecDot(col("embedding"), col("embedding")) - hofDot).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(dotDiff == 0)
    // MatSignBucket vs the literal multiply-add chain
    val planes = Hyperplanes.planes(64, 6).map(_.toArray).toArray
    val chain = Hyperplanes.planes(64, 6).zipWithIndex.map { case (p, i) =>
      when(Hyperplanes.dotLit(col("embedding"), p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val bktDiff = emb.select(
        (VecExpressions.matSignBucket(col("embedding"), planes) - chain).as("d"))
      .filter(col("d") =!= 0).count()
    assert(bktDiff == 0)
    // NearestCentroid: argmax with larger-id tiebreak (duplicate centroid)
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val vecs = Seq(Array(5.0f, 1.0f), Array(1.0f, 9.0f)).toDF("v")
    val ids = vecs.select(VecExpressions.nearestCentroid(col("v"), cents))
      .collect().map(_.getInt(0))
    assert(ids.sameElements(Array(2, 1))) // tie between 0 and 2 → larger id
  }

  test("assignSplit: deterministic, exhaustive, near-requested fractions") {
    val df = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val split = DedupOps.assignSplit(df, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == df.count()) // exhaustive: every doc got a label
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.05)
    // deterministic across evaluations
    val again = DedupOps.assignSplit(df, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() == 0)
    // a different salt draws a different (still exhaustive) assignment
    val salted = DedupOps.assignSplit(df, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "other")
    assert(split.select("doc_id", "split").except(
      salted.select("doc_id", "split")).count() > 0)
  }

  test("contaminationFlags: benchmark overlap flagged, clean docs not") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // contains bench 5-gram
      (2L, "totally unrelated words that never appear in any benchmark row"),
      (3L, "alpha beta gamma delta epsilon completely different tail here")
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta").toDF("btext")
    val flags = TrainingSetOps.contaminationFlags(corpus, col("doc_id"),
        col("text"), bench, col("btext"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L) && flags(3L) && !flags(2L))
    assert(flags.size == 3) // every corpus doc gets a flag
  }

  test("packSequences: contiguous coverage, budget respected, shard-local") {
    val docs = (0L until 40L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    val packed = TrainingSetOps.packSequences(docs, col("doc_id"), col("text"),
      budget = 10, shards = 4).collect()
    assert(packed.length == 40)
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      // cuts advance monotonically and cover contiguously: each doc
      // starts in the sequence where its predecessor ended, or in the
      // next one when the predecessor finished exactly on a cut
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(4) || b.getLong(3) == a.getLong(4) + 1)
        case _ =>
      }
      // a doc spans at most ceil(n_tokens/budget) extra sequences
      sorted.foreach { r =>
        assert(r.getLong(4) - r.getLong(3) <= r.getLong(2) / 10 + 1)
      }
    }
  }

  test("redactPii: every class scrubbed, clean text untouched, counts attributed") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 555-867-5309 x2"),
      (2L, "server 192.168.0.12 rejected ssn 123-45-6789 twice"),
      (3L, "no personal data in this row at all")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.redactPii(col("text")).as("red"),
        TextOps.piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "reach me at <EMAIL> or <PHONE> x2")
    assert(out(2L).getString(1) == "server <IP> rejected ssn <SSN> twice")
    assert(out(3L).getString(1) == "no personal data in this row at all")
    val c1 = out(1L).getStruct(2)
    assert(c1.getInt(0) == 1 && c1.getInt(3) == 1) // email + phone
    val c2 = out(2L).getStruct(2)
    assert(c2.getInt(1) == 1 && c2.getInt(2) == 1) // ssn + ip
    assert((0 to 3).forall(out(3L).getStruct(2).getInt(_) == 0))
  }

  test("removeBoilerplate: shared lines dropped, unique lines kept in order") {
    val df = Seq(
      (1L, "first unique line\nSHARED BANNER\nbody of one"),
      (2L, "SHARED BANNER\nbody of two\ntail two"),
      (3L, "body of three\nSHARED BANNER"),
      (4L, "SHARED BANNER") // nothing survives -> doc dropped
    ).toDF("doc_id", "text")
    val out = TrainingSetOps.removeBoilerplate(df, col("doc_id"), col("text"),
        minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "first unique line\nbody of one",
      2L -> "body of two\ntail two",
      3L -> "body of three"))
  }

  test("curateByBudget: bucketed two-phase equals the naive global cumsum") {
    val df = (0L until 200L).map { i =>
      (i, (i % 97).toDouble / 100.0, i % 13 + 1)
    }.toDF("doc_id", "q", "nt")
    val got = TrainingSetOps.curateByBudget(df, col("doc_id"), col("q"),
        col("nt"), budget = 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // naive reference: global (q desc, id) order, keep while cum <= budget
    var cum = 0L
    val want = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
      .takeWhile { case (_, _, n) => { cum += n; cum <= 300L } }
      .map(_._1).toSet
    assert(got == want && got.nonEmpty && got.size < 200)
  }

  test("resampleMixture: proportions approach targets, binding domain kept whole") {
    val df = (0L until 600L).map(i =>
      (i, "d" + (i % 3))).toDF("doc_id", "dom") // 200 docs each
    val out = TrainingSetOps.resampleMixture(df, col("dom"), col("doc_id"),
        Map("d0" -> 0.6, "d1" -> 0.3, "d2" -> 0.1))
      .groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binding domain d0: needs 0.6 share with only a third of the data ->
    // kept (nearly) whole; d1 thinned to ~half, d2 to ~a sixth
    assert(out("d0") > 190)
    assert(out("d1") > 75 && out("d1") < 125)
    assert(out("d2") > 15 && out("d2") < 55)
    // deterministic: the same call keeps exactly the same rows
    val again = TrainingSetOps.resampleMixture(df, col("dom"), col("doc_id"),
      Map("d0" -> 0.6, "d1" -> 0.3, "d2" -> 0.1))
    assert(again.exceptAll(TrainingSetOps.resampleMixture(df, col("dom"),
      col("doc_id"), Map("d0" -> 0.6, "d1" -> 0.3, "d2" -> 0.1))).isEmpty)
  }

  test("dedupParagraphs: only the first global occurrence of a repeat survives") {
    val df = Seq(
      (1L, "alpha\nSHARED\nbeta"),
      (2L, "SHARED\ngamma"),
      (3L, "delta\nSHARED")
    ).toDF("doc_id", "text")
    val out = TrainingSetOps.dedupParagraphs(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alpha\nSHARED\nbeta", 2L -> "gamma", 3L -> "delta"))
  }

  test("int8 quantization: codes bounded, reconstruction within half a step, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(100.0f, -50.0f, 1.0f, 0.1f))
    ).toDF("id", "v")
    val rows = df.select(col("id"),
        graft.functions.VecExpressions.int8Quantize(col("v")).as("q"),
        graft.functions.VecExpressions.vecAbsMax(col("v")).as("mx"))
      .collect()
    rows.foreach { r =>
      val q = r.getSeq[Byte](1)
      assert(q.forall(b => b >= -127 && b <= 127))
      if (r.getDouble(2) == 0.0) assert(q.forall(_ == 0))
    }
    val r3 = rows.find(_.getLong(0) == 3L).get
    val s3 = math.max(r3.getDouble(2), 1e-30) / 127.0
    val q3 = r3.getSeq[Byte](1)
    assert(q3(0) == 127 && q3(1) == -63) // floor(-63.5 + 0.5) = -63
    val v3 = Array(100.0, -50.0, 1.0, 0.1)
    v3.indices.foreach { i =>
      assert(math.abs(q3(i) * s3 - v3(i)) <= s3 / 2 + 1e-12)
    }
  }

  test("quantized top-k: high overlap with fp32 brute force on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp32 = pairs(SimilarityOps.bruteForceTopK(queries, corpus, 10))
    val int8 = pairs(SimilarityOps.quantizedTopK(queries, corpus, 10))
    val overlap = (fp32 intersect int8).size.toDouble / fp32.size
    assert(overlap >= 0.8, s"int8 top-k overlap with fp32 was $overlap")
  }

  test("quantized LSH top-k: same candidates as fp32 LSH, high overlap in ranking") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // buckets are computed from the fp32 vectors in BOTH paths, so the
    // candidate sets are identical — only the scoring payload differs
    val fp32 = pairs(SimilarityOps.lshTopK(queries, corpus, 10, dim = 64, bits = 6))
    val int8 = pairs(SimilarityOps.lshQuantizedTopK(queries, corpus, 10, dim = 64, bits = 6))
    val overlap = (fp32 intersect int8).size.toDouble / fp32.size
    assert(overlap >= 0.8, s"quantized LSH top-k overlap with fp32 LSH was $overlap")
  }

  test("quantized IVF top-k: shares the fp32 fit, high overlap in ranking") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ONE fitted model serves both paths (probe selection is fp32 in
    // both) — only the inverted-file payload and scoring differ
    val model = SimilarityOps.ivfFit(corpus, nlist = 8)
    val fp32 = pairs(SimilarityOps.ivfTopK(queries, model, 10, nprobe = 3))
    val int8 = pairs(SimilarityOps.ivfQuantizedTopK(queries, model, 10, nprobe = 3))
    val overlap = (fp32 intersect int8).size.toDouble / fp32.size
    assert(overlap >= 0.8, s"quantized IVF top-k overlap with fp32 IVF was $overlap")
  }

  test("meanPoolByLabel: exact fixed-point means") {
    val df = Seq(
      (0, Array(1.0f, -2.0f)),
      (0, Array(3.0f, 2.0f)),
      (1, Array(0.5f, 0.5f))
    ).toDF("label", "v")
    val out = EmbeddingOps.meanPoolByLabel(df, col("label"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out((0L, 0L)) == ((2.0, 2L)))
    assert(out((0L, 1L)) == ((0.0, 2L)))
    assert(out((1L, 0L)) == ((0.5, 1L)))
  }

  test("prototypeConfusion: diagonal well above chance, counts partition the corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val conf = EmbeddingOps.prototypeConfusion(emb, col("label"), col("embedding"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = conf.values.sum
    assert(total == emb.count())
    val diag = conf.collect { case ((l, a), n) if l == a => n }.sum
    // labels are weakly clustered in the synthetic embeddings: chance
    // assignment would put ~10% on the diagonal; prototypes reach ~36%
    assert(diag.toDouble / total > 0.25, s"diagonal fraction ${diag.toDouble / total}")
  }

  test("domain blocklist: subdomains blocked, lookalikes and clean domains kept") {
    val df = Seq(
      (1L, "go to https://ads.tracker.net/x now"),
      (2L, "see https://docs.example.com/guide and https://cdn.tracker.net/y"),
      (3L, "plain text without any links"),
      (4L, "https://nottracker.net/z is fine") // NOT a subdomain of tracker.net
    ).toDF("doc_id", "text")
    val kept = TrainingSetOps.domainBlocklistFilter(df, col("text"),
        Seq("tracker.net"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("incrementalDedup: reference collisions dropped, batch dups keep first id") {
    val incoming = Seq(
      (10L, "already in the snapshot"),
      (11L, "fresh content one"),
      (12L, "batch repeated payload"),
      (13L, "batch repeated payload"),
      (14L, "fresh content two")
    ).toDF("doc_id", "text")
    val reference = Seq(
      (1L, "already in the snapshot"),
      (2L, "some other snapshot doc")
    ).toDF("rid", "rtext")
    val kept = TrainingSetOps.incrementalDedup(incoming, reference,
        col("doc_id"), col("text"), col("rtext"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L, 14L))
  }

  test("normalize: zero-widths and controls stripped, whitespace collapsed, case folded") {
    val df = Seq((1L, "  Hello\tWorld\u200B!  \u0007x\r\nY  ")).toDF("id", "text")
    val out = df.select(TextOps.normalize(col("text"))).collect().head.getString(0)
    assert(out == "hello world! x y")
  }

  test("sampleExactPerGroup: exactly k per group, deterministic across runs") {
    val df = (0L until 90L).map(i => (i, "g" + (i % 3))).toDF("doc_id", "grp")
    def run() = TrainingSetOps.sampleExactPerGroup(df, col("grp"), col("doc_id"), k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val s1 = run()
    assert(s1.groupBy(_._1).forall(_._2.size == 10))
    assert(s1 == run())
  }

  test("repetitionRatio: repeated text high, unique text zero, short text zero") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "every token here is entirely different from all the others"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 0.8)  // 6 trigrams, all "spam spam spam"
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0) // below n tokens → single shingle, no repeats
  }

  test("collocations: a planted sticky bigram outranks frequent-but-independent pairs") {
    // "hong kong" always co-occurs (lift = N / n_hong·n_kong is maximal);
    // "the cat" repeats but both tokens also appear apart, diluting lift
    val phrases = (1 to 10).map(i =>
      (i.toLong, "hong kong is where the cat saw the dog and the cat slept"))
    val out = TextOps.collocations(phrases.toDF("doc_id", "text"),
      col("text"), minCount = 5L)
      .select("t1", "t2", "lift_raw")
    val rows = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.contains(("hong", "kong")))
    assert(rows(("hong", "kong")) > rows(("the", "cat")))
    // single-occurrence-per-doc pairs fall below minCount only if rarer
    // than 5 total; here every adjacent pair appears 10 times, so the
    // support filter keeps them all — check one
    assert(rows.contains(("cat", "slept")))
  }

  test("fuzzy join matches the naive quadratic answer, including edge shapes") {
    // planted shapes: exact duplicate (dist 0), single substitution,
    // two edits at both ends (worst case for the gram bound), a near
    // miss at dist 3, and an unrelated string
    val left = Seq(
      (1L, "chocolate"), (2L, "chocolatx"), (3L, "xhocolatx"),
      (4L, "xxocolaxx"), (5L, "aluminium")
    ).toDF("id", "s")
    val right = Seq((10L, "chocolate"), (11L, "zirconium")).toDF("id", "s")
    val got = FuzzyJoinOps.editDistanceJoin(left, right, maxDist = 2, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = left.as("a").crossJoin(right.as("b"))
      .withColumn("d", levenshtein(col("a.s"), col("b.s")))
      .filter(col("d") <= 2)
      .select(col("a.id"), col("b.id"), col("d").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.contains((1L, 10L, 0L)))
    assert(got.contains((2L, 10L, 1L)))
    assert(got.contains((3L, 10L, 2L))) // both-ends edits survive the bound
    assert(!got.exists(_._1 == 4L))     // dist 4: pruned or verified away
    assert(!got.exists(_._1 == 5L))     // unrelated
  }

  test("bpeMerges learns the hand-computed merge sequence") {
    // corpus "aaab aaab ab" -> vocab {aaab:2, ab:1}
    // round 1: (a,a)=4 vs (a,b)=3 -> merge (a,a); greedy left-to-right
    //   turns "a a a b" into "aa a b" (NOT "a aa b")
    // round 2: (aa,a)=2, (a,b)=2+1=3 -> merge (a,b) -> "aa ab" / "ab"
    // round 3: (aa,ab)=2 -> merge (aa,ab)
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = BpeOps.bpeMerges(df, col("text"), rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }
}
