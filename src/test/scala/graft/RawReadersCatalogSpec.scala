package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.RawReaders
import graft.planner.CatalogOps

class RawReadersCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", StringType), StructField("b", LongType)))

  test("S3 csv encoding fallback: latin-1 bytes parse via fallback") {
    val dir = Files.createTempDirectory("graft_enc")
    // 0xE9 = é in latin-1; invalid as standalone UTF-8 byte
    Files.write(dir.resolve("x.csv"),
      ("a,b\n" + "café,1\n").getBytes("ISO-8859-1"))
    val df = RawReaders.csvWithEncodingFallback(spark, dir.toString, schema)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 1L)
  }

  test("S3 csv encoding probe: legit nulls in the first rows still accept UTF-8") {
    val dir = Files.createTempDirectory("graft_encnull")
    // every sampled row has a null column — the old anyNull probe would
    // have rejected UTF-8 and fallen through the whole encoding list
    Files.write(dir.resolve("x.csv"),
      ("a,b\n" + (1 to 10).map(i => s"r$i,\n").mkString).getBytes("UTF-8"))
    val df = RawReaders.csvWithEncodingFallback(spark, dir.toString, schema)
    assert(df.count() == 10)
    assert(df.filter(col("b").isNull).count() == 10)
  }

  test("jsonl quarantine: corrupt lines captured verbatim, missing fields stay clean") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.write(dir.resolve("x.jsonl"),
      ("""{"a":"ok1","b":1}""" + "\n" +
       """{"a":"ok2"}""" + "\n" +                  // missing field → null, NOT quarantined
       """{"a":"bad-type","b":"NaN-ish"}""" + "\n" + // b can't take LongType → quarantined
       """{"a":"trunc""" + "\n" +                  // malformed JSON → quarantined
       "not json at all\n").getBytes("UTF-8"))
    val (clean, quar) = RawReaders.jsonlQuarantined(spark, dir.toString, schema)
    assert(clean.count() == 2)
    assert(clean.filter(col("b").isNull).count() == 1)
    val raw = quar.collect().map(_.getString(0)).sorted
    assert(raw.length == 3)
    // the offending input survives verbatim — replayable after a fix
    assert(raw.contains("not json at all"))
    assert(raw.exists(_.contains("bad-type")))
    assert(raw.exists(_.contains("trunc")))
  }

  test("jsonl quarantine: embedded newlines round-trip (the reason JSONL beats CSV)") {
    val dir = Files.createTempDirectory("graft_jsonl_nl")
    import spark.implicits._
    val src = Seq(("line1\nline2\ttab", 7L), ("plain", 8L)).toDF("a", "b")
    src.coalesce(1).write.mode("overwrite").json(dir.resolve("d").toString)
    val (clean, quar) = RawReaders.jsonlQuarantined(spark, dir.resolve("d").toString, schema)
    assert(quar.count() == 0)
    val back = clean.orderBy("b").collect()
    assert(back(0).getString(0) == "line1\nline2\ttab")
    assert(back.length == 2)
  }

  test("jsonl quarantine: field names containing dots resolve literally") {
    val dir = Files.createTempDirectory("graft_jsonl_dot")
    Files.write(dir.resolve("x.jsonl"),
      ("""{"user.name":"ada","b":1}""" + "\n").getBytes("UTF-8"))
    val dotted = StructType(Seq(
      StructField("user.name", StringType), StructField("b", LongType)))
    val (clean, quar) = RawReaders.jsonlQuarantined(spark, dir.toString, dotted)
    assert(quar.count() == 0)
    val row = clean.collect().head
    assert(row.getString(0) == "ada" && row.getLong(1) == 1L)
  }

  test("jsonl quarantine: reserved corrupt column rejected in user schema") {
    val dir = Files.createTempDirectory("graft_jsonl_res")
    intercept[IllegalArgumentException] {
      RawReaders.jsonlQuarantined(spark, dir.toString,
        schema.add("_graft_corrupt", StringType))
    }
  }

  test("S4 parquet validated read: size bound and emptiness enforced") {
    val dir = Files.createTempDirectory("graft_val").toString
    Seq(("x", 1L)).toDF("a", "b").write.parquet(s"$dir/ok")
    assert(RawReaders.parquetValidated(spark, s"$dir/ok").count() == 1)
    intercept[IllegalArgumentException] {
      RawReaders.parquetValidated(spark, s"$dir/ok", maxBytes = 1L)
    }
  }

  test("S12/S13/S14/S2: existence, schema, drop, append lifecycle") {
    assert(!CatalogOps.tableExists(spark, "lifecycle_t"))
    CatalogOps.appendToView(spark, "lifecycle_t", Seq((1L, "a")).toDF("id", "s"))
    assert(CatalogOps.tableExists(spark, "lifecycle_t"))
    assert(CatalogOps.tableSchema(spark, "lifecycle_t").fieldNames.toSeq == Seq("id", "s"))
    CatalogOps.appendToView(spark, "lifecycle_t", Seq((2L, "b")).toDF("id", "s"))
    assert(spark.table("lifecycle_t").count() == 2)
    assert(CatalogOps.dropViewIfExists(spark, "lifecycle_t"))
    assert(!CatalogOps.tableExists(spark, "lifecycle_t"))
  }

  test("B8 cached time column returns the projection") {
    Tables.load(spark, SparkTestSession.sfDir, "events")
      .createOrReplaceTempView("events_b8")
    val ts = CatalogOps.cachedTimeColumn(spark, "events_b8", "ts")
    assert(ts.columns.toSeq == Seq("ts"))
    assert(ts.count() > 0)
    ts.unpersist()
    spark.catalog.dropTempView("events_b8")
  }
}
