package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw-input readers (reference: core/pipeline.py:223-251,
  * loaders/parquet_loader.py:150-166, utils/validators.py:58-119).
  */
object RawReaders {

  /** S3 — CSV read with multi-encoding fallback: try utf-8 → latin-1 →
    * cp1252, permissive parse (pipeline.py:223-240). A read "fails" for
    * an encoding when every sampled row is malformed; the probe looks at
    * `_corrupt_record` (decode/parse corruption only), NOT at whether the
    * row contains nulls — a source whose first rows carry legitimate null
    * columns must still be accepted on the first working encoding. */
  def csvWithEncodingFallback(spark: SparkSession, path: String,
                              schema: StructType,
                              encodings: Seq[String] = Seq("UTF-8", "ISO-8859-1", "windows-1252"),
                              header: Boolean = true): DataFrame = {
    val corruptCol = "_graft_corrupt"
    val probeSchema = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    encodings.iterator
      .find { enc =>
        // full-row probe: Spark forbids projecting ONLY the corrupt
        // column from a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        val probe = spark.read
          .schema(probeSchema)
          .option("header", header.toString)
          .option("encoding", enc)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corruptCol)
          .csv(path)
          .limit(10).collect()
        val idx = probeSchema.fieldIndex(corruptCol)
        probe.nonEmpty && probe.exists(_.isNullAt(idx))
      }
      .map { enc =>
        spark.read
          .schema(schema)
          .option("header", header.toString)
          .option("encoding", enc)
          .option("mode", "PERMISSIVE")
          .csv(path)
      }
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
