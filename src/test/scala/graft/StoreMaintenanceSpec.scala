package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.StoreMaintenance

class StoreMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compact bin-packs a fragmented store without changing its contents") {
    val dir = Files.createTempDirectory("graft_compact").resolve("store")
    val df = (1 to 5000).map(i => (i.toLong, s"row $i", i * 1.5))
      .toDF("id", "s", "v")
    // fragment: tiny maxRecordsPerFile over many partitions
    df.repartition(8).write
      .option("maxRecordsPerFile", 100).parquet(dir.toString)
    val checksumBefore = spark.read.parquet(dir.toString)
      .agg(sum(xxhash64(col("id"), col("s"), col("v")))).as[Long].head()

    val stats = StoreMaintenance.compact(spark, dir.toString,
      targetBytes = 64L * 1024 * 1024)

    assert(stats.filesBefore > 40)
    assert(stats.filesAfter < stats.filesBefore / 4)
    assert(stats.rows == 5000)
    val after = spark.read.parquet(dir.toString)
    assert(after.count() == 5000)
    val checksumAfter = after
      .agg(sum(xxhash64(col("id"), col("s"), col("v")))).as[Long].head()
    assert(checksumAfter == checksumBefore) // order-independent content hash
  }

  test("compact preserves a partitioned layout") {
    val dir = Files.createTempDirectory("graft_compactp").resolve("store")
    val df = (1 to 2000).map(i => (i.toLong, i % 4, i * 1.0))
      .toDF("id", "part", "v")
    df.repartition(6).write.partitionBy("part")
      .option("maxRecordsPerFile", 50).parquet(dir.toString)

    val stats = StoreMaintenance.compact(spark, dir.toString,
      partitionCols = Seq("part"))

    assert(stats.filesAfter < stats.filesBefore)
    val after = spark.read.parquet(dir.toString)
    assert(after.count() == 2000)
    // partition pruning still works: a one-partition read touches one dir
    assert(after.filter(col("part") === 2).count() == 500)
    assert(Files.isDirectory(dir.resolve("part=2")))
  }

  test("readEvolved unions schemas and patches never-seen columns") {
    val dir = Files.createTempDirectory("graft_evolve").resolve("store")
    Seq((1L, "a")).toDF("id", "s").write.parquet(dir.toString + "/gen=1")
    Seq((2L, "b", 9.9)).toDF("id", "s", "score")
      .write.parquet(dir.toString + "/gen=2")

    val df = StoreMaintenance.readEvolved(spark, dir.toString,
      expect = Seq("score" -> DoubleType, "brand_new" -> DoubleType))
    assert(df.columns.toSet == Set("id", "s", "score", "brand_new", "gen"))
    val byId = df.collect().map(r => r.getLong(0) ->
      (Option(r.get(df.columns.indexOf("score"))))).toMap
    assert(byId(1L).isEmpty)          // old file: evolved column is NULL
    assert(byId(2L).contains(9.9))    // new file: real value survives
    assert(df.filter(col("brand_new").isNotNull).count() == 0)
  }
}
