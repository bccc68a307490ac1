package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ExactSubstrOps
import graft.streaming.StreamingContamination

/** Guard-online parity: streaming contamination verdicts must equal the
  * batch verdicts regardless of micro-batch boundaries (the benchmark
  * side is static, so boundaries cannot matter), and both must agree
  * with the batch span-level decontamination audit on WHICH docs are
  * contaminated. */
class StreamingContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val passage = "a b c d e f g h i j" // 10 tokens → 3 dup 8-grams

  private def bench = Seq(
    (100L, s"x y $passage z w"),
    (101L, "completely different benchmark prompt tokens one two three")
  ).toDF("doc_id", "text")

  private def train = Seq(
    (1L, s"intro words $passage trailing suffix here"), // contaminated
    (2L, "clean document with enough tokens to carry several grams easily"),
    (3L, "short doc"), // below the gram floor → clean by definition
    (4L, s"$passage immediately leading the document body text")
  ).toDF("doc_id", "text")

  test("streaming verdicts equal batch verdicts across micro-batch boundaries") {
    val keys = ExactSubstrOps
      .benchGramKeys(bench, col("doc_id"), col("text")).persist()
    val batchVerdicts = StreamingContamination.flagBatch(train, keys)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap

    val dir = Files.createTempDirectory("graft_scontam")
    // two files → maxFilesPerTrigger(1) forces two micro-batches
    train.filter(col("doc_id") <= 2).repartition(1)
      .write.parquet(dir.resolve("in/p1").toString)
    train.filter(col("doc_id") > 2).repartition(1)
      .write.parquet(dir.resolve("in/p2").toString)
    val stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("in/*").toString)
    val q = StreamingContamination.start(stream, keys,
      dir.resolve("out").toString, dir.resolve("ckpt").toString)
    // AvailableNow is not exposed via start(); drain with processAllAvailable
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(dir.resolve("out").toString)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hit_grams"), r.getAs[Boolean]("contaminated")))).toMap
    assert(streamed == batchVerdicts)
    assert(streamed.size == 4)
    // the expected verdicts themselves
    assert(streamed(1L)._2 && streamed(4L)._2)
    assert(!streamed(2L)._2 && !streamed(3L)._2)
    assert(streamed(3L)._1 == 0L)
    keys.unpersist()
  }

  test("blocklist scan runs at INGEST: streaming tags equal batch tags; gate drops flagged docs") {
    // The stateless Aho–Corasick stage composes into a streaming query
    // unchanged (one automaton reference object per plan); verdicts
    // must be boundary-independent and equal the batch path's.
    val pats = Seq("passage", "a b c", "zz-never")
    val docs = Seq(
      (1L, s"intro words $passage trailing"), // hits "a b c"
      (2L, "clean document with a passage marker"), // hits "passage"
      (3L, "nothing to see"),
      (4L, s"the passage a b c overlaps")  // hits both
    ).toDF("doc_id", "text")
    val batchTags = graft.streaming.StreamingPrep.tagBlocklist(docs, pats)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Int](r.fieldIndex("blocklist_ids")).toList).toMap

    val dir = Files.createTempDirectory("graft_sblock")
    docs.filter(col("doc_id") <= 2).repartition(1)
      .write.parquet(dir.resolve("in/p1").toString)
    docs.filter(col("doc_id") > 2).repartition(1)
      .write.parquet(dir.resolve("in/p2").toString)
    val stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("in/*").toString)
    val q = graft.streaming.StreamingPrep.tagBlocklist(stream, pats)
      .writeStream.format("parquet")
      .option("path", dir.resolve("out").toString)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.read.parquet(dir.resolve("out").toString)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Int](r.fieldIndex("blocklist_ids")).toList).toMap
    assert(streamed == batchTags)
    assert(streamed(1L) == List(1) && streamed(2L) == List(0)
      && streamed(3L) == Nil && streamed(4L) == List(0, 1))
    // the gate form drops exactly the flagged docs
    assert(graft.streaming.StreamingPrep.dropBlocklisted(docs, pats)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("flagged docs are exactly the docs the batch decontamination audit spans") {
    val keys = ExactSubstrOps.benchGramKeys(bench, col("doc_id"), col("text"))
    val flagged = StreamingContamination.flagBatch(train, keys)
      .filter(col("contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val union = train.withColumn("is_bench", lit(false))
      .unionByName(bench.withColumn("is_bench", lit(true)))
    val audited = ExactSubstrOps.crossContamination(union,
        col("doc_id"), col("text"), col("is_bench"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == audited)
  }
}
