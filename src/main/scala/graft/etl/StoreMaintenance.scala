package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse maintenance for a parquet store: small-file compaction and
  * schema-evolution reads — the two operational concerns a long-lived
  * 100 TB store hits first.
  *
  * Streaming/incremental ingest (FileIngest, ParquetSink appends)
  * accretes many small files; scans then pay per-file open/footer costs
  * and lose row-group-sized reads. `compact` bin-packs a store in one
  * distributed rewrite. Producers also evolve schemas over time;
  * `readEvolved` reads the union schema so old files surface new
  * columns as NULL instead of failing the scan.
  */
object StoreMaintenance {

  case class CompactionStats(filesBefore: Long, filesAfter: Long,
                             rows: Long, bytes: Long)

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  /** Bin-pack a (flat or partitioned) parquet store toward
    * `targetBytes` per file. One distributed job: the store is read
    * once and rewritten with a `maxRecordsPerFile` derived from the
    * observed bytes-per-row, so each output file lands near the target
    * size regardless of row width; partition columns (if any) are
    * re-written with `partitionBy` so pruning layout is preserved.
    *
    * The swap is directory-level (tmp rewrite → move old aside → move
    * tmp in): safe for a single writer on a filesystem; an object-store
    * deployment would layer a manifest/table format on top — the
    * engine-side rewrite below is the part that must be distributed.
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val dir = Paths.get(path)
    val before = parquetFiles(dir)
    val totalBytes = before.map(Files.size(_)).sum
    val df = spark.read.parquet(path)
    val rows = df.count()
    val bytesPerRow = math.max(1L, totalBytes / math.max(1L, rows))
    val targetRows = math.max(1L, targetBytes / bytesPerRow)

    val tmp = Paths.get(path + "._compact_tmp")
    val writer0 = df.write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", targetRows)
    val writer = if (partitionCols.nonEmpty)
      writer0.partitionBy(partitionCols: _*) else writer0
    writer.parquet(tmp.toString)

    val bak = Paths.get(path + "._compact_bak")
    Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the old generation
    Files.walk(bak).iterator().asScala.toSeq.reverse.foreach(Files.delete)

    val after = parquetFiles(dir)
    CompactionStats(before.size.toLong, after.size.toLong, rows,
      after.map(Files.size(_)).sum)
  }

  /** Morton (Z-order) interleave of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Rows
    * close in Z-value are close in BOTH dimensions, which is what makes
    * sorting by this key a multi-dimensional clustering: after a
    * Z-ordered write, a range predicate on either (or both) columns
    * touches few files instead of striping across all of them. Pure
    * shift/mask arithmetic — codegen'd, no UDF. */
  def zorderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int): org.apache.spark.sql.Column =
    // one loop-codegen'd expression node (constant code size) instead
    // of the 6·bits-node shift/mask/or tree the Column-fold produced
    graft.functions.BitExpressions.interleaveBits(a, b, bits)

  /** Z-order-clustered rewrite: range-partition on the Morton key (so
    * each output file owns a CONTIGUOUS z-range → a compact region in
    * both dimensions), sort within partitions for tight parquet
    * row-group min/max stats, write `numFiles` files. At 100 TB this is
    * the layout that lets two-dimensional range scans (time × host,
    * user × day) skip most of the store from footer stats alone — a
    * single-column sort can only localize one of the two. */
  def zorderWrite(df: DataFrame, a: String, b: String, bits: Int,
                  numFiles: Int, path: String): Unit =
    df.withColumn("_z", zorderKey(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(path)

  /** Read a store whose files carry EVOLVED schemas: the scan exposes
    * the union of all file schemas (`mergeSchema`), and any column
    * listed in `expect` that no file carries at all is patched in as a
    * typed NULL (the P8 missing-column contract), so downstream
    * operators can rely on a stable shape. */
  def readEvolved(spark: SparkSession, path: String,
                  expect: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    expect.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d
      else d.withColumn(name, lit(null).cast(dt))
    }
  }
}
