package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw-input readers (reference: core/pipeline.py:223-251,
  * loaders/parquet_loader.py:150-166, utils/validators.py:58-119).
  */
object RawReaders {

  /** S3 — CSV read with multi-encoding fallback: try utf-8 → latin-1 →
    * cp1252, permissive parse (pipeline.py:223-240). A read "fails" for
    * an encoding when every row of a sample is corrupt; Spark's
    * PERMISSIVE mode nulls malformed columns instead of erroring, so the
    * probe checks that the sample parsed at all. */
  def csvWithEncodingFallback(spark: SparkSession, path: String,
                              schema: StructType,
                              encodings: Seq[String] = Seq("UTF-8", "ISO-8859-1", "windows-1252"),
                              header: Boolean = true): DataFrame = {
    val attempts = encodings.iterator.map { enc =>
      val df = spark.read
        .schema(schema)
        .option("header", header.toString)
        .option("encoding", enc)
        .option("mode", "PERMISSIVE")
        .csv(path)
      enc -> df
    }
    attempts
      .find { case (_, df) =>
        // cheap probe: the 10-row sample has at least one fully-parsed row
        val sample = df.limit(10).collect()
        sample.nonEmpty && sample.exists(r => !r.anyNull)
      }
      .map(_._2)
      .getOrElse(throw new IllegalArgumentException(
        s"no encoding in ${encodings.mkString(",")} could parse $path"))
  }

  /** S4 — parquet read with sample validation (n_rows=10 probe,
    * parquet_loader.py:150-166) and the reference's validation bounds:
    * ≥ 1 row, file size ≤ maxBytes (validators, conte_hpc.yaml:50-53). */
  def parquetValidated(spark: SparkSession, path: String,
                       maxBytes: Long = 10L << 30): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val size = fs.getContentSummary(p).getLength
    require(size <= maxBytes, s"$path exceeds max size ($size > $maxBytes)")
    val df = spark.read.parquet(path)
    require(df.limit(10).count() >= 1, s"$path is empty")
    df
  }
}
