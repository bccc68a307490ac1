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

  test("zorderKey interleaves bits (hand-computed)") {
    // a=5 (101), b=3 (011), 3 bits: positions 0..5 get
    // a0=1,b0=1,a1=0,b1=1,a2=1,b2=0 → 011011₂ = 27
    val got = Seq((5, 3)).toDF("a", "b")
      .select(StoreMaintenance.zorderKey(col("a"), col("b"), 3)).as[Long].head()
    assert(got == 27L)
  }

  test("InterleaveBits codegen matches the Column-composition form and survives ordering codegen") {
    import graft.etl.{StoreMaintenance => SM}
    // composition reference, rebuilt inline (the operator now uses the
    // loop-codegen expression)
    def foldKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int): org.apache.spark.sql.Column =
      (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
        acc
          .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
          .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
    val mismatches = grid.select(
        SM.zorderKey(col("x"), col("y"), 5).as("z1"),
        foldKey(col("x"), col("y"), 5).as("z2"))
      .filter(col("z1") =!= col("z2")).count()
    assert(mismatches == 0)
    // ordering-codegen path (GenerateOrdering has no interpreted
    // fallback — the round-4 pipe-margin lesson): sort ON the
    // expression and take the top row
    val top = grid.orderBy(SM.zorderKey(col("x"), col("y"), 5).desc, col("x"))
      .limit(1).collect()(0)
    assert((top.getInt(0), top.getInt(1)) == (31, 31))
  }

  test("zorder layout localizes two-dimensional range scans") {
    // 64×64 grid; a y-range query must touch every x-sorted file but
    // only the z-files whose contiguous z-range covers small y
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = grid.toDF("x", "y")
    val zdir = Files.createTempDirectory("graft_zorder").resolve("z")
    val xdir = Files.createTempDirectory("graft_zorder").resolve("x")
    StoreMaintenance.zorderWrite(df, "x", "y", bits = 6, numFiles = 8,
      path = zdir.toString)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(xdir.toString)

    // per-file bounding boxes, from the data itself (what parquet
    // footer min/max stats would expose to a scan planner)
    def filesHit(dir: String): Int = {
      val boxes = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
      // query: all x, y in [0, 15]
      boxes.count(r => r.getAs[Int]("y0") <= 15)
    }
    val zHit = filesHit(zdir.toString)
    val xHit = filesHit(xdir.toString)
    assert(xHit == 8, s"x-sorted layout should stripe y across all files, hit $xHit")
    // RangePartitioner boundaries come from sampling whose seed varies
    // with RDD id (= session history), so the exact file count drifts
    // run-to-run: the CLAIM is locality — a y-range query touches at
    // most ~half the z-ordered files where the x-sort touches all 8.
    // Ideal here is 2; ≤4 absorbs boundary drift without weakening the
    // locality claim below 2× vs the x-sorted stripe.
    assert(zHit <= 4 && zHit * 2 <= xHit,
      s"z-ordered layout should bound the y-range to few files, hit $zHit of 8 (x-sort hit $xHit)")
  }
}
