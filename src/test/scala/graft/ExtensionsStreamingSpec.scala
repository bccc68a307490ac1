package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.planner.{TimeBoundExtensions, UnboundedScanException}
import graft.streaming.{StreamingPrep, StreamingProfiles}

class ExtensionsStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming corpus prep: gates + redaction + dedup across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sprep")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("doc_id", "text").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("doc_id long, text string").parquet(in.toString)
      val q = StreamingPrep.cleanStream(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val good = "the cat and the dog sat in the garden and watched the birds for a while"
    land("b1", Seq(
      (1L, good + " mail jane@example.org today"),
      (2L, "!!!! #### ????"),                                // quality-gated
      (3L, "el gato y el perro en la casa es un animal que come y duerme bien hoy") // lang-gated
    ))
    runPass()
    val first = spark.read.parquet(out)
    assert(first.count() == 1)
    val t1 = first.select("text").as[String].collect().head
    assert(t1.contains("<EMAIL>") && !t1.contains("jane@example.org"))

    // differs from doc 1 only in the PII -> identical after redaction ->
    // cross-batch dedup on the redacted digest drops it; doc 5 is new
    land("b2", Seq(
      (4L, good + " mail bob@other.net today"),
      (5L, good + " and then the cat slept")
    ))
    runPass()
    val all = spark.read.parquet(out)
    assert(all.count() == 2)
    assert(all.select("docId").as[Long].collect().toSet == Set(1L, 5L))
  }

  test("streaming HTML ingest: extraction feeds the gates, chrome-only twins dedup") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_shtml")
    val in = base.resolve("in"); Files.createDirectory(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def page(id: Long, body: String): String =
      s"<html><head><title>Item $id</title><style>p{}</style></head><body>" +
        s"<nav>site nav item $id</nav><header>hdr $id</header>" +
        s"<div><p>$body</p></div><footer>foot $id</footer></body></html>"

    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("doc_id", "html").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def runPass(): Unit = {
      val stream = spark.readStream
        .schema("doc_id long, html string").parquet(in.toString)
      val q = StreamingPrep.cleanHtmlStream(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val good = "the cat and the dog sat in the garden and watched the birds for a while"
    land("b1", Seq(
      (1L, page(1L, good)),
      (2L, page(2L, "!!!! #### ????"))                     // quality-gated
    ))
    runPass()
    val first = spark.read.parquet(out)
    assert(first.count() == 1)
    // chrome stripped before the gates: the landed text is the body alone
    assert(first.select("text").as[String].collect().head == good)

    // doc 3 differs from doc 1 ONLY in chrome (ids in nav/header/footer)
    // -> identical extracted text -> cross-batch dedup drops it; doc 4's
    // body is new and survives
    land("b2", Seq(
      (3L, page(3L, good)),
      (4L, page(4L, good + " and then the cat slept"))
    ))
    runPass()
    val all = spark.read.parquet(out)
    assert(all.count() == 2)
    assert(all.select("docId").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("time-bound check rule: unbounded scan of watched path rejected, bounded passes") {
    val base = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val guarded = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new TimeBoundExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      guarded.conf.set("spark.graft.timeBound.paths", "events.parquet")
      guarded.conf.set("spark.graft.timeBound.column", "ts")
      val ev = Tables.load(guarded, SparkTestSession.sfDir, "events")

      // unbounded scan → rejected at analysis
      val ex = intercept[Exception] {
        ev.groupBy("event_type").count().collect()
      }
      assert(ex.isInstanceOf[UnboundedScanException] ||
        ex.getCause.isInstanceOf[UnboundedScanException] ||
        ex.getMessage.contains("must be bounded"))

      // time-bounded scan → allowed
      val n = ev.filter(col("ts") >= "2024-01-01").count()
      assert(n > 0)

      // other tables unaffected
      assert(Tables.load(guarded, SparkTestSession.sfDir, "nation").count() > 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("streaming watermarked profile: closed windows emit once, late state bounded") {
    val dir = Files.createTempDirectory("graft_sprof")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    import spark.implicits._

    // file-source streams need a flat dir of files; write then move
    def land(name: String, rows: Seq[(java.sql.Timestamp, Double)]): Unit = {
      val tmp = dir.resolve(s"stage_$name")
      rows.toDF("ts", "value").repartition(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, in.resolve(s"$name.parquet"))
    }

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    land("b1", Seq(
      (ts("2024-01-01 00:10:00"), 10.0),
      (ts("2024-01-01 00:50:00"), 30.0),
      (ts("2024-01-01 05:00:00"), 99.0))) // advances watermark past hour 0

    val schema = "ts timestamp, value double"
    def runPass(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in.toString)
      val q = StreamingProfiles.timeBucketProfile(stream, "ts", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runPass()
    // batch 2: watermark (from batch 1 max 05:00 - 2h lateness = 03:00)
    // closes the 00:00 window → it emits in this pass
    land("b2", Seq((ts("2024-01-01 06:00:00"), 5.0)))
    runPass()

    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getTimestamp(0) == ts("2024-01-01 00:00:00"))
    assert(r.getDouble(1) == 20.0 && r.getLong(4) == 2L) // avg(10,30), cnt 2
  }
}
