package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * batch decode/feature-extract stages.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration
  * shape — is real and tested. IMAGES decode (`javax.imageio`) AND
  * resize (`Graphics2D`, headless) for real via the JDK's pure-JVM
  * PNG/JPEG/GIF/BMP/TIFF/WBMP codecs (compressed formats included —
  * JPEG/TIFF round-trips are spec-pinned on this exact headless JDK,
  * no native codec involved); AUDIO decodes for real for uncompressed
  * WAV/AIFF/AU via `javax.sound.sampled` (PCM needs no native codec).
  * Only compressed audio and VIDEO stay behind the deterministic
  * `decodeStub` fake — swap it for a JNI/ffmpeg or `mapInPandas`
  * stage without touching the plumbing.
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

  /** Row produced by the image-resize stage: re-encoded payload at the
    * target dimensions (PNG), nulls for undecodable/non-image rows. */
  val resizedImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Row produced by the REAL audio-decode stage: PCM stream properties +
    * per-channel RMS amplitude in [0,1]; nulls when the payload is absent
    * or not a decodable (uncompressed WAV/AIFF/AU) audio container. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
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
  /** Shared decode preamble for every image stage (mean features,
    * dHash, resize): null/empty guard, ImageIO decode, undecodable →
    * None — ONE place for a future decode-hardening change. */
  // ImageIO's default stream cache is DISK-BACKED: every decode/encode
  // writes the byte stream to a temp file first. On a 32-core executor
  // that is 32 threads contending on temp-file creation per row — the
  // in-memory cache is strictly better for our byte-array payloads.
  // (Executor-side objects re-run this initializer per JVM, which is
  // exactly the scope the flag has.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Audio decoder SPIs resolved ONCE per JVM: AudioSystem's registry
    * lookup is synchronized, so calling `getAudioInputStream` per row
    * SERIALIZES a 32-thread decode stage (measured: the q208 x10
    * fingerprint pass ran at single-core speed). The providers here are
    * the same JDK reader classes AudioSystem would pick. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    // PCM container readers (WAVE/AIFF/AU) FIRST: the JDK's ServiceLoader
    // order leads with SoftMidiAudioFileReader, whose sniff routes every
    // payload through the GLOBALLY-SYNCHRONIZED
    // JSSecurityManager.getProviders — a 32-thread decode stage ran at
    // single-core speed with every thread BLOCKED on that class lock
    // (jstack-verified). With the MIDI reader last, a PCM payload never
    // reaches it.
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
      .sortBy(r => if (r.getClass.getName.contains("Midi")) 1 else 0)
  }

  private def openAudio(payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return Some(it.next().getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => () }
    }
    None
  }

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.isEmpty) return None
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .filter(img => img.getWidth >= 1 && img.getHeight >= 1)
    } catch { case _: Exception => None }
  }

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    try readImage(payload).map { img =>
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
      (w, h, Array((r.toDouble / n / 255.0).toFloat,
        (g.toDouble / n / 255.0).toFloat, (b.toDouble / n / 255.0).toFloat))
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

  /** 64-bit difference hash (dHash) — the standard cheap perceptual
    * fingerprint for image near-dup (Krawetz's dHash): box-average the
    * luma onto a 9×8 grid, one bit per horizontal neighbor pair
    * (left < right). All arithmetic is EXACT integers — luma is the
    * ITU-R 601 weighted sum ×1000, cell means compare by
    * cross-multiplied (sum, count) pairs, no division — so the hash is
    * deterministic across JVMs and identical across lossless encodes
    * of the same pixels (PNG and BMP of one image hash the same;
    * spec-pinned). Huge images sample with [[decodeImage]]'s stride
    * cap (O(1024²) work per image). None for null/undecodable. */
  def dhashImage(payload: Array[Byte]): Option[Long] = {
    try readImage(payload).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val stride = math.max(1, math.max(w, h) / 1024)
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val gy = (y * 8L / h).toInt
        var x = 0
        while (x < w) {
          val gx = (x * 9L / w).toInt
          val px = img.getRGB(x, y)
          sums(gy)(gx) += 299L * ((px >> 16) & 0xff) +
            587L * ((px >> 8) & 0xff) + 114L * (px & 0xff)
          cnts(gy)(gx) += 1
          x += stride
        }
        y += stride
      }
      // empty cells (w < 9, stride gaps) compare as 0·n < 0·m = false —
      // still deterministic, never a throw
      var bits = 0L
      var gy = 0
      var i = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (sums(gy)(gx) * cnts(gy)(gx + 1) <
              sums(gy)(gx + 1) * cnts(gy)(gx)) bits |= (1L << i)
          i += 1; gx += 1
        }
        gy += 1
      }
      bits
    } catch { case _: Exception => None }
  }

  /** Render a 9×8 black/white BMP whose pixel (y, x) is bit
    * ((y·9 + x) mod 64) of `bits` — white for 1, black for 0. Gate
    * fixture for the image near-dup pipeline: with exactly one pixel
    * per dHash grid cell (and stride 1 at this size), the perceptual
    * hash of the ENCODED image is analytically predictable — dHash bit
    * i (row gy, col gx) is set iff pixel bit ((gy·9+gx) mod 64) <
    * pixel bit ((gy·9+gx+1) mod 64) — so a relational oracle with no
    * image codec can replay decode → dHash → block join end to end
    * (the q199 replay pattern applied to the image arm). */
  def renderPatternImage(bits: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val on = ((bits >>> ((y * 9 + x) % 64)) & 1L) == 1L
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Shared fixture-render plumbing for the media gates: a
    * `(media_id, bits)` frame becomes the `(media_id, kind, payload)`
    * shape the fingerprint stages consume — executor-side encode, same
    * `mapPartitions` shape as the real decode stages. One body for the
    * image and audio arms so schema/encoder changes cannot diverge. */
  private def renderFixtures(df: DataFrame,
                             render: (String, Long) => Array[Byte]): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc: Encoder[Row] = Encoders.row(schema)
    df.select(col("media_id").cast(LongType), col("kind").cast(StringType),
        col("bits").cast(LongType))
      .mapPartitions { rows =>
        // schema-ful rows: a downstream mapPartitions fused into the
        // same stage receives these objects directly (Spark elides the
        // serialize/deserialize pair) and reads fields BY NAME
        rows.map(r => new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](r.getLong(0), r.getString(1),
            render(r.getString(1), r.getLong(2))), schema): Row)
      }(enc)
  }

  /** Shared fingerprint-stage plumbing: the per-row `fp` dispatches on
    * kind; kinds it declines and undecodable payloads keep a null in
    * `outCol` (auditable, never dropped silently). ONE body for the
    * single-kind stages AND the mixed ingest pass. */
  private def fingerprintStage(media: DataFrame, outCol: String,
                               fp: (String, Array[Byte]) => Option[Long]): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField(outCol, LongType, nullable = true)))
    val enc: Encoder[Row] = Encoders.row(schema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0 else payload.length
          val v = fp(r.getAs[String]("kind"), payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), nBytes,
            v.map(java.lang.Long.valueOf).orNull)
        }
      }(enc)
  }

  /** [[renderPatternImage]] over a `(media_id, bits)` frame, emitting
    * the `(media_id, kind, payload)` shape [[imageDhashes]] consumes. */
  def renderPatternImages(df: DataFrame): DataFrame =
    renderFixtures(df.withColumn("kind", lit("image")),
      (_, b) => renderPatternImage(b))

  /** Row produced by the dHash stage. */
  val imageDhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = true)))

  /** dHash stage over the standard `mapPartitions` plumbing: image rows
    * get their 64-bit perceptual fingerprint; non-image/undecodable
    * rows keep a null dhash (auditable, never dropped silently). */
  def imageDhashes(spark: SparkSession, media: DataFrame): DataFrame =
    fingerprintStage(media, "dhash",
      (k, p) => if (k == "image") dhashImage(p) else None)

  /** Perceptual image near-dup pairs: dHash per image, then EXACTLY the
    * SimHash block machinery — the 64-bit fingerprint meets the
    * `(doc_id, simhash)` contract, so the pigeonhole block join, the
    * hamming verify, and the hot-bucket guard apply unchanged (one
    * similarity engine, two signal sources). Returns
    * (id_a, id_b, hamming, capped) over media ids. Requires
    * maxHamming < bands for pigeonhole completeness. */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBucketSize: Int = 64): DataFrame = {
    import graft.QueryCaches.Pinned
    // pinned: the block join's a/b branches and the occupancy window
    // each re-read the signature frame — without the pin the whole
    // decode+hash chain executes 3-4x per run (measured 13 s -> ~2 s
    // at x10), and image decode is the expensive stage by far
    val sigs = imageDhashes(spark, media)
      .filter(col("dhash").isNotNull)
      .select(col("media_id").as("doc_id"), col("dhash").as("simhash"))
      .pin()
    sigs.count() // EAGER: persist alone is lazy, and the block join's
    // branches evaluate as concurrent subqueries — each would race past
    // the empty cache and re-run the decode chain (stage metrics showed
    // 5 parquet scans per execution before this count)
    DedupOps.cappedSimhashPairsFromSignatures(sigs,
      maxHamming, bands, maxBucketSize)
  }

  /** REAL image resize via headless `Graphics2D` (bilinear), re-encoded
    * as PNG. Executor-side only, one decode+render per row; returns None
    * for null/undecodable payloads. */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    try readImage(payload).map { img =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch { case _: Exception => None }
  }

  /** Resize stage over the same `mapPartitions` plumbing: image rows get
    * a re-encoded payload at (targetW, targetH); non-image/undecodable
    * rows are kept with null payload so callers can audit failures. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): DataFrame = {
    val enc: Encoder[Row] = Encoders.row(resizedImageSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = r.getAs[String]("kind")
          val resized =
            if (kind == "image") resizeImage(r.getAs[Array[Byte]]("payload"), targetW, targetH)
            else None
          resized match {
            case Some(bytes) => Row(r.getAs[Long]("media_id"), kind, bytes, targetW, targetH)
            case None        => Row(r.getAs[Long]("media_id"), kind, null, null, null)
          }
        }
      }(enc)
  }

  /** REAL audio decode via `javax.sound.sampled` (the JDK ships pure-JVM
    * readers for uncompressed WAV/AIFF/AU — PCM needs no native codec).
    * Returns (sampleRate, channels, durationMs, perChannelRms[0..1]) or
    * None for null/undecodable/compressed payloads. Handles signed and
    * unsigned PCM at 8 and 16 bits, both endiannesses. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = openAudio(payload).getOrElse(return None)
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        if ((!signed && !unsigned) || (bits != 8 && bits != 16) || channels < 1) return None
        val bytes = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val frames = bytes.length / frameBytes
        if (frames == 0) return None
        val sumSq = new Array[Double](channels)
        var f = 0
        while (f < frames) {
          var c = 0
          while (c < channels) {
            val off = f * frameBytes + c * bytesPerSample
            val raw =
              if (bits == 8) {
                if (signed) bytes(off).toInt / 128.0
                else ((bytes(off) & 0xff) - 128) / 128.0
              } else {
                val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                val v = ((bytes(hi).toInt << 8) | (bytes(lo) & 0xff))
                (if (signed) v else (v & 0xffff) - 32768) / 32768.0
              }
            sumSq(c) += raw * raw
            c += 1
          }
          f += 1
        }
        val rms = sumSq.map(s => math.sqrt(s / frames).toFloat)
        val durationMs = math.round(frames * 1000.0 / fmt.getSampleRate)
        Some((fmt.getSampleRate.toInt, channels, durationMs, rms))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** 64-bit audio fingerprint over the REAL decode path — the audio
    * analogue of [[dhashImage]]: the PCM sample stream splits into 65
    * frames on integer boundaries (frame f covers samples
    * [f·n/65, (f+1)·n/65)), each frame's energy is the EXACT integer
    * sum of squared raw sample values summed across channels (no
    * division, no sqrt — deterministic across JVMs and lossless
    * containers), and fingerprint bit i is set iff
    * energy(frame i) < energy(frame i+1) compared by cross-multiplied
    * (sum, count) pairs — a loudness-DELTA signature that meets the
    * `(doc_id, simhash)` contract, so the SimHash block join, hamming
    * verify, and hot-bucket guard serve audio unchanged. Signed and
    * unsigned PCM at 8/16 bits via javax.sound (WAV/AIFF/AU); None for
    * null/undecodable/compressed payloads. Frames longer than 60k
    * samples compare via BigInt (the cross product would overflow a
    * long around 2⁶³). */
  def audioFingerprint(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = openAudio(payload).getOrElse(return None)
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        if ((!signed && !unsigned) || (bits != 8 && bits != 16) || channels < 1) return None
        val bytes = ais.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * channels
        val n = bytes.length / frameBytes
        if (n < 65) return None // needs one sample per energy frame
        val sums = new Array[Long](65)
        val cnts = new Array[Long](65)
        var f = 0
        while (f < n) {
          val g = (f * 65L / n).toInt
          var c = 0
          var e = 0L
          while (c < channels) {
            val off = f * frameBytes + c * bytesPerSample
            val raw: Long =
              if (bits == 8) {
                if (signed) bytes(off).toLong else (bytes(off) & 0xff).toLong - 128L
              } else {
                val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                val v = (bytes(hi).toInt << 8) | (bytes(lo) & 0xff)
                if (signed) v.toLong else (v & 0xffff).toLong - 32768L
              }
            e += raw * raw
            c += 1
          }
          sums(g) += e
          cnts(g) += 1
          f += 1
        }
        // cross-product overflow guard: sums(g) <= cnts(g)*channels*2^30
        // (16-bit worst case), so sums(i)*cnts(j) <= cnt^2*channels*2^30;
        // stay in Long only while that is provably under 2^62 — the old
        // fixed 60k cutoff ignored CHANNELS and a >=3-channel 16-bit clip
        // near the cutoff could wrap negative and silently flip bits
        val cmax = cnts.max.toDouble
        val big = cmax * cmax * channels * (1L << 30).toDouble >= (1L << 62).toDouble
        var out = 0L
        var i = 0
        while (i < 64) {
          val less =
            if (big) BigInt(sums(i)) * cnts(i + 1) < BigInt(sums(i + 1)) * cnts(i)
            else sums(i) * cnts(i + 1) < sums(i + 1) * cnts(i)
          if (less) out |= (1L << i)
          i += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Fingerprint stage over the standard `mapPartitions` plumbing:
    * audio rows get their 64-bit loudness-delta fingerprint;
    * non-audio/undecodable rows keep a null (auditable, never dropped
    * silently). */
  def audioFingerprints(spark: SparkSession, media: DataFrame): DataFrame =
    fingerprintStage(media, "afp",
      (k, p) => if (k == "audio") audioFingerprint(p) else None)

  /** ONE ingest-time fingerprint pass over MIXED media: image rows get
    * [[dhashImage]], audio rows [[audioFingerprint]], anything else —
    * and every undecodable payload — an auditable null `fingerprint`.
    * Stateless, so it composes identically into batch jobs and
    * Structured Streaming ingest (see
    * [[graft.streaming.StreamingPrep.fingerprintMedia]]); a downstream
    * exact-dup gate keys on (kind, fingerprint), the near-dup path
    * feeds the same column to the guarded block join. */
  def mediaFingerprints(media: DataFrame): DataFrame =
    fingerprintStage(media, "fingerprint", {
      case ("image", p) => dhashImage(p)
      case ("audio", p) => audioFingerprint(p)
      case _            => None
    })

  /** Perceptual audio near-dup pairs: [[audioFingerprint]] per clip,
    * then EXACTLY the SimHash block machinery ([[imageNearDupPairs]]'s
    * contract — one similarity engine, three signal sources). Returns
    * (id_a, id_b, hamming, capped) over media ids. */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBucketSize: Int = 64): DataFrame = {
    import graft.QueryCaches.Pinned
    // pinned for the same reason as imageNearDupPairs — worse here:
    // javax.sound's SPI lookup is JVM-synchronized, so re-decoding per
    // join branch also serializes the 32 cores (measured 32 s -> ~3 s
    // at x10 from this pin alone)
    val sigs = audioFingerprints(spark, media)
      .filter(col("afp").isNotNull)
      .select(col("media_id").as("doc_id"), col("afp").as("simhash"))
      .pin()
    sigs.count() // EAGER — same reason as imageNearDupPairs
    DedupOps.cappedSimhashPairsFromSignatures(sigs,
      maxHamming, bands, maxBucketSize)
  }

  /** Render a 520-sample 8-bit unsigned mono WAV whose 65 constant-
    * amplitude frames encode `bits`: frame f is loud (amplitude 100)
    * when pattern bit (f mod 64) is set, quiet (amplitude 10)
    * otherwise. Gate fixture for the audio near-dup pipeline: with
    * 8 samples per energy frame the fingerprint of the ENCODED bytes
    * is closed-form — bit i = patbit(i mod 64) < patbit((i+1) mod 64)
    * (frame 64 wraps to pattern bit 0) — so a relational oracle with
    * no audio codec can replay decode → fingerprint → block join end
    * to end (the q206 image pattern applied to the audio arm). */
  def renderToneWav(bits: Long): Array[Byte] = {
    val n = 65 * 8
    // hand-built 44-byte RIFF/WAVE header + unsigned 8-bit mono PCM:
    // AudioSystem.write would route through the same JVM-synchronized
    // writer registry the reader fix above avoids — rendering 50k
    // fixtures via the registry serialized the whole stage (the DECODE
    // side, which is what the gate tests, still uses the real SPI
    // reader). Fixture-spec pin: decode(render(bits)) ≡ closed form.
    val out = new Array[Byte](44 + n)
    def ascii(off: Int, s: String): Unit =
      { var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 } }
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def le16(off: Int, v: Int): Unit =
      { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    ascii(0, "RIFF"); le32(4, 36 + n); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, 1); le32(24, 8000); le32(28, 8000)  // mono, 8 kHz, byteRate
    le16(32, 1); le16(34, 8)                     // blockAlign, 8-bit
    ascii(36, "data"); le32(40, n)
    var f = 0
    while (f < 65) {
      val amp = if (((bits >>> (f % 64)) & 1L) == 1L) 100 else 10
      var i = 0
      while (i < 8) { out(44 + f * 8 + i) = (128 + amp).toByte; i += 1 }
      f += 1
    }
    out
  }

  /** [[renderToneWav]] over a `(media_id, bits)` frame, emitting the
    * `(media_id, kind, payload)` shape [[audioFingerprints]] consumes. */
  def renderToneWavs(df: DataFrame): DataFrame =
    renderFixtures(df.withColumn("kind", lit("audio")),
      (_, b) => renderToneWav(b))

  /** Mixed gate fixture over a `(media_id, kind, bits)` frame — ONE
    * render pass: image/audio rows get their closed-form fixture, any
    * other kind a small opaque payload (no fingerprint path). Built for
    * q209, which gates [[mediaFingerprints]]' kind dispatch without
    * scanning the corpus once per modality. */
  def renderMixedFixtures(df: DataFrame): DataFrame =
    renderFixtures(df, {
      case ("image", b) => renderPatternImage(b)
      case ("audio", b) => renderToneWav(b)
      case _            => Array[Byte](9, 9, 9)
    })

  /** Audio decode/feature stage over the same `mapPartitions` plumbing
    * as `extractImageFeatures`. Non-audio kinds and undecodable payloads
    * yield null property/feature rows (kept, for failure audits). */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc: Encoder[Row] = Encoders.row(audioFeatureSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0 else payload.length
          val decoded =
            if (r.getAs[String]("kind") == "audio") decodeAudio(payload) else None
          decoded match {
            case Some((rate, ch, durMs, feat)) =>
              Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), nBytes,
                rate, ch, durMs, feat)
            case None =>
              Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), nBytes,
                null, null, null, null)
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
