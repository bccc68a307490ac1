package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingNearDedup

/** Sustained-rate rehearsal of the streaming near-dup index: N batches
  * of D documents each pushed through [[StreamingNearDedup.processBatch]]
  * (the exact function the foreachBatch sink runs), recording per-batch
  * wall time, post-maintenance segment count, and store bytes. This is
  * the backpressure claim a 100 TB ingest needs made measurable:
  *
  *  - FLAT per-batch latency: the probe join ships only narrow
  *    (doc_id, band, bucket) rows and candidate-sized text fetches, so
  *    batch time must not trend with index size at this scale (the
  *    residual O(index) term is the columnar (doc_id, sig) scan);
  *  - BOUNDED state: tiered compaction + the maxSegments backstop keep
  *    the segment count ≤ maxSegments after every batch, and store
  *    bytes track SURVIVORS (the index is the dedup state — growth
  *    proportional to unique docs is the contract, unbounded segment
  *    fan-out would be the failure).
  *
  * Corpus: deterministic sha2-token docs (40 tokens), per batch 80%
  * unique, 10% near-dup of a same-batch unique doc (one token mutated,
  * 3-gram Jaccard ≈ 0.95), 10% near-dup of an earlier batch's unique
  * doc — so every batch exercises within-batch resolution AND the
  * cross-batch index probe, and the expected emit rate is 0.8·D.
  *
  * Usage: runMain graft.StreamRehearsal [nBatches] [docsPerBatch] [outJson]
  * Prints one JSON line (and writes it to outJson if given).
  */
object StreamRehearsal {

  /** Token `pos` of document seed `seed`: 8 hex chars of a sha2 keyed
    * by (seed, pos) — collision-free for our purposes, fully
    * distributed (pure expressions, no driver data). */
  private def tok(seed: Column, pos: Column): Column =
    substring(sha2(concat(lit("t"), seed.cast("string"), lit("_"),
      pos.cast("string")), 256), 1, 8)

  /** 40-token text of `seed`, with position `mutPos` (0 = none)
    * replaced by a token derived from `salt` — a near-dup one mutated
    * token away from its base. */
  private def docText(seed: Column, mutPos: Column, salt: Column): Column =
    array_join(transform(sequence(lit(1), lit(40)),
      p => when(p === mutPos, tok(salt + 1000000000L, p))
        .otherwise(tok(seed, p))), " ")

  /** Batch `b` of `d` docs: ids b·d..b·d+d−1; roles by index mod 10. */
  private[graft] def makeBatch(spark: SparkSession, b: Long, d: Long): DataFrame = {
    val id = col("id")
    val i = id - lit(b * d)
    val uniq = lit(b * d) + i // its own seed
    // map a uniform draw k ∈ [0, 0.8d) onto the k-th UNIQUE-role index
    // (i%10 ∈ 0..7) — a base drawn from a dup-role index would be a
    // phantom (its seed-stream text is not the text that row emitted)
    def baseIdx(k: Column): Column = // integer div: Column./ is double
      floor(k / 8).cast("long") * 10 + pmod(k, lit(8L))
    // within-batch dup: base is a unique doc of THIS batch. baseIdx can
    // land above this row's index, in which case min-id keep retains the
    // MUTATED variant and drops the base — either way exactly one of the
    // pair survives, so the 0.8·D emit rate and the cross-batch probe
    // still hold (a cross dup differs from the variant in only 2 of 40
    // shingle grams, Jaccard ≈ 0.9 ≥ 0.8).
    val withinBase =
      lit(b * d) + baseIdx(pmod(xxhash64(id, lit("w")), lit(d * 8 / 10)))
    // cross-batch dup: base is a unique doc of an EARLIER batch
    val crossBatch = pmod(xxhash64(id, lit("b")), lit(math.max(b, 1L)))
    val crossBase =
      crossBatch * d + baseIdx(pmod(xxhash64(id, lit("j")), lit(d * 8 / 10)))
    val role = pmod(i, lit(10L))
    val isWithin = role === 8
    val isCross = role === 9 && lit(b > 0)
    val seed = when(isWithin, withinBase).when(isCross, crossBase).otherwise(uniq)
    val mutPos = when(isWithin, lit(40)).when(isCross, lit(39)).otherwise(lit(0))
    spark.range(b * d, b * d + d)
      .select(id.as("doc_id"), docText(seed, mutPos, id).as("text"))
  }

  private def storeBytes(store: String): Long =
    StreamingNearDedup.listSegments(store).map { seg =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(seg).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }.sum

  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(20)
    val docsPerBatch = args.lift(1).map(_.toLong).getOrElse(50000L)
    val outJson = args.lift(2)
    val cores = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = java.nio.file.Files
      .createTempDirectory("neardedup-rehearsal").toString + "/index"
    val maxSegments = 8
    val times = Array.ofDim[Double](nBatches)
    val segs = Array.ofDim[Int](nBatches)
    val bytes = Array.ofDim[Long](nBatches)
    val emitted = Array.ofDim[Long](nBatches)
    (0 until nBatches).foreach { b =>
      // materialize the batch OUTSIDE the timed section: generation is
      // rehearsal scaffolding, not pipeline work
      val batch = makeBatch(spark, b, docsPerBatch).persist()
      batch.count()
      val t0 = System.nanoTime()
      StreamingNearDedup.processBatch(batch, store,
        shingleSize = 3, numHashes = 32, bands = 8,
        jaccardThreshold = 0.8, batchId = b, maxSegments = maxSegments)
      times(b) = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      segs(b) = StreamingNearDedup.listSegments(store).size
      bytes(b) = storeBytes(store)
      emitted(b) = StreamingNearDedup.emitted(spark, store).count()
      System.err.println(f"[rehearsal] batch $b%02d ${times(b)}%.2fs " +
        f"segments=${segs(b)} storeMB=${bytes(b) / 1e6}%.1f emitted=${emitted(b)}")
    }
    // flatness: mean of batches 1-5 (0 pays JIT + first-index build) vs
    // the last 5 — a trend with index size shows up as ratio >> 1
    val head = times.slice(1, 6).sum / 5
    val tail = times.takeRight(5).sum / 5
    val json =
      s"""{"metric":"stream_backpressure","batches":$nBatches,""" +
        s""""docs_per_batch":$docsPerBatch,""" +
        s""""batch_sec":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
        s""""segments":[${segs.mkString(",")}],""" +
        s""""store_mb":[${bytes.map(x => f"${x / 1e6}%.1f").mkString(",")}],""" +
        s""""emitted":[${emitted.mkString(",")}],""" +
        f""""head_mean_sec":$head%.2f,"tail_mean_sec":$tail%.2f,""" +
        f""""flat_ratio":${tail / head}%.2f,""" +
        s""""max_segments_seen":${segs.max},"bounded_state":${segs.max <= maxSegments}}"""
    println(json)
    outJson.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
