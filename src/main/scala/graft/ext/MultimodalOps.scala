package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * batch decode/feature-extract stages.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration
  * shape — is real and tested. IMAGES decode for real via the JDK's
  * `javax.imageio` (PNG/JPEG/GIF/BMP — `extractImageFeatures`); audio/
  * video codecs are not available in a pure-JVM container, so those
  * stay behind the deterministic `decodeStub` fake — swap it for a
  * JNI/ffmpeg or `mapInPandas` stage without touching the plumbing.
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

  /** Row produced by the REAL image-decode stage: decoded dimensions +
    * per-channel mean intensities ([r,g,b] in [0,1]); nulls when the
    * payload is absent or not a decodable image. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
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

  /** REAL image decode via `javax.imageio` (pure-JVM PNG/JPEG/GIF/BMP
    * readers ship with the JDK — no native codec needed). Returns
    * (width, height, [meanR, meanG, meanB]) or None for null/undecodable
    * payloads. Executor-side only; one decode per row inside a
    * `mapPartitions` batch. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      // channel means via a coarse stride so huge images stay O(1024²)
      val stride = math.max(1, math.max(w, h) / 1024)
      var (r, g, b, n) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
          n += 1; x += stride
        }
        y += stride
      }
      Some((w, h, Array((r.toDouble / n / 255.0).toFloat,
        (g.toDouble / n / 255.0).toFloat, (b.toDouble / n / 255.0).toFloat)))
    } catch { case _: Exception => None }
  }

  /** Image decode/feature stage over the SAME `mapPartitions` plumbing
    * as `extractFeatures` — the stub decoder swapped for the real
    * `javax.imageio` path. Non-image kinds and undecodable payloads
    * yield null width/height/feature rows (kept, so callers can audit
    * decode failures), never exceptions. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc: Encoder[Row] = Encoders.row(imageFeatureSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0 else payload.length
          val decoded =
            if (r.getAs[String]("kind") == "image") decodeImage(payload) else None
          decoded match {
            case Some((w, h, feat)) =>
              Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), nBytes,
                w, h, feat)
            case None =>
              Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), nBytes,
                null, null, null)
          }
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
