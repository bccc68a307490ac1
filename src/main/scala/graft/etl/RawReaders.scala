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

  /** JSONL (one JSON document per line — the lingua franca LLM corpora
    * actually arrive in) with an EXPLICIT schema and corrupt-line
    * quarantine. Returns (clean, quarantine):
    *
    *  - `clean`: rows that parsed against `schema` (PERMISSIVE — a line
    *    missing a field yields a null in that column, it is NOT
    *    quarantined; only lines that fail to parse as JSON, or whose
    *    values can't take the declared types, land in quarantine);
    *  - `quarantine`: the offending RAW lines verbatim (`raw_line`) so
    *    the bad input is auditable and replayable after a fix, instead
    *    of silently nulled or dropped.
    *
    * The schema is required, never inferred: schema inference is a full
    * extra pass over the input (at 100 TB, a second 100 TB scan before
    * the first useful row), and an inferred schema silently drifts with
    * the data. Implementation is `text` source + `from_json`, not the
    * raw JSON source: the JSON scan forbids corrupt-column-only
    * projections (QUERY_ONLY_CORRUPT_RECORD_COLUMN — its suggested
    * workaround is `.cache()`, a non-starter at corpus scale), and the
    * text row IS the verbatim raw line the quarantine contract
    * promises. Both returned frames are independent lazy scans —
    * nothing materializes driver-side. */
  def jsonlQuarantined(spark: SparkSession, path: String,
                       schema: StructType): (DataFrame, DataFrame) =
    parseJsonl(spark.read.text(path), schema)

  /** The [[jsonlQuarantined]] core over an already-read one-string-column
    * frame (`value`) — shared verbatim by the batch reader and the
    * streaming ingest ([[graft.streaming.FileIngest.jsonlToParquet]]),
    * so the two paths cannot drift. Blank lines are skipped (the JSON
    * line reader's semantics), not quarantined. */
  def parseJsonl(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json, length, trim}
    val corruptCol = "_graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not contain reserved column $corruptCol")
    val withCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = raw
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol)).as("r"))
    // getField, not col("r.name"): field names are taken LITERALLY, so
    // JSON keys containing dots (common in the wild) resolve correctly
    // instead of being parsed as nested paths
    val corrupt = col("r").getField(corruptCol)
    val clean = parsed.filter(corrupt.isNull)
      .select(schema.fieldNames.map(f => col("r").getField(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed.filter(corrupt.isNotNull)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
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
