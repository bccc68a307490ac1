package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * batch decode/feature-extract stages.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration
  * shape — is real and tested. The codec calls themselves are STUBBED
  * with a deterministic fake (this container has no image/audio
  * libraries); swap `decodeStub` for a real codec (e.g. JNI/ffmpeg or a
  * `mapInPandas` Python stage in a PySpark deployment) without touching
  * any of the surrounding plumbing.
  *
  * Scale notes: payloads stay in executor memory only for the duration
  * of one `mapPartitions` batch; `repartitionForPayloads` sizes
  * partitions by total payload bytes (not row count) so a 100 TB media
  * table does not OOM on skewed blob sizes.
  */
object MultimodalOps {

  /** Media row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Extracted-feature row produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Repartition by cumulative payload size so each partition carries at
    * most ~`targetBytes` of media (row-count partitioning would OOM on
    * mixed thumbnails/videos). */
  def repartitionForPayloads(df: DataFrame, targetBytes: Long = 256L << 20): DataFrame = {
    val stats = df.agg(
      coalesce(sum(length(col("payload"))), lit(0L)).as("bytes")).head()
    val totalBytes = stats.getLong(0)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }

  /** STUB decoder: deterministic fake "feature vector" derived from the
    * payload bytes (first `dim` bytes scaled to [0,1)). A real deployment
    * replaces ONLY this function with a codec; signature and batch shape
    * stay identical. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] =
    if (payload == null) null
    else Array.tabulate(math.min(dim, math.max(payload.length, 1))) { i =>
      if (payload.length == 0) 0.0f
      else (payload(i % payload.length) & 0xff) / 256.0f
    }

  /** Decode/feature-extract stage: batch iteration via `mapPartitions`
    * over the typed Dataset (the Scala analogue of a `mapInPandas`
    * batch UDF — one iterator pass, no per-row task overhead). */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    val enc: Encoder[Row] = Encoders.row(featureSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0 else payload.length,
            decodeStub(payload, dim))
        }
      }(enc)
  }

  /** Frame-sampling plan for video: every `everyMs` milliseconds of the
    * clip becomes one (media_id, frame_idx, ts_ms) row — the explode is
    * pure column arithmetic; actual frame extraction is the stubbed
    * decode above. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(0L)) - 1, lit(0L)),
          lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast(LongType))
}
