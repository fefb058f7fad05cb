package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media ride
  * as opaque `binary` columns with typed metadata, and decode /
  * feature-extract / resize / frame-sample run as partition-mapped batch
  * transforms (the Scala equivalent of pandas-UDF `mapInPandas`).
  *
  * The IMAGE codec is real: `ImageCodec` decodes PNG/JPEG bytes with
  * javax.imageio (JDK built-in) into genuine pixel-luma features. The
  * AUDIO codec is real for WAV/PCM: `AudioCodec` decodes with
  * javax.sound.sampled (also JDK built-in) into per-window RMS-energy
  * features. Only VIDEO remains STUBBED behind `StubCodec`, a
  * deterministic content-hash fake (no video codec ships with the JDK
  * and the container has no external media libraries). Everything
  * Spark-side is real and tested: schema, encoders, batch shape (rows
  * decoded in bounded per-partition batches), partition mapping, and
  * the explode for frame sampling. Swapping StubCodec for a real
  * decoder changes no plan shape.
  */
object Multimodal {

  /** media table schema: one row per asset, bytes + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = true)))

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Option[Int], height: Option[Int])

  final case class MediaFeatures(
      media_id: Long, kind: String, embedding: Array[Float],
      decode_batch: Int)

  /** ???-equivalent stub codec for VIDEO (no video codec ships with the
    * JDK and the container has no external media libraries), and the
    * degraded-asset fallback for the real codecs: deterministic
    * pseudo-features from the content bytes. The signature (batch of
    * byte arrays in, batch of features out) is what a vectorized codec
    * needs.
    */
  object StubCodec {
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = if (bytes == null) 0 else java.util.Arrays.hashCode(bytes)
      Array.tabulate(dim)(i =>
        (((h * 31 + i * 2654435761L) % 1000).toFloat / 1000.0f))
    }
  }

  /** REAL image decode via javax.imageio (ships in the JDK, headless-
    * safe for PNG/JPEG/GIF/BMP): feature = mean luma (Rec.601 weights,
    * scaled to [0,1]) over `dim` vertical strips of the image — a crude
    * but genuine pixel statistic. Undecodable bytes (null, corrupt, or a
    * format ImageIO lacks) fall back to the stub features so a bad asset
    * degrades instead of failing the partition.
    */
  object ImageCodec {
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img =
        try {
          if (bytes == null) null
          else javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
        } catch {
          // JDK decoders throw RuntimeExceptions too (CMMException on a
          // corrupt ICC profile, AIOOBE on truncated scanlines) — a bad
          // asset must degrade to stub features, never fail the task
          case scala.util.control.NonFatal(_) => null
        }
      if (img == null) StubCodec.embed(bytes, dim)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 255
            val g = (rgb >> 8) & 255
            val b = rgb & 255
            val cell = math.min(dim - 1, x * dim / w)
            sums(cell) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        Array.tabulate(dim)(i =>
          if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
      }
    }
  }

  /** REAL audio decode via javax.sound.sampled (ships in the JDK;
    * WAV/AIFF/AU containers, any PCM layout the JDK can convert):
    * feature = RMS energy (samples normalized to [-1,1]) over `dim`
    * equal time windows — the audio analog of the image luma strips.
    * Undecodable bytes (null, corrupt, or a compressed format the JDK
    * lacks, e.g. MP3) fall back to the stub features so a bad asset
    * degrades instead of failing the partition.
    */
  object AudioCodec {
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val samples: Array[Double] =
        try {
          if (bytes == null) null
          else {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            // normalize every input to 16-bit signed little-endian PCM
            val fmt = ais.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              fmt.getSampleRate, 16, fmt.getChannels, true, false)
            val pcm = javax.sound.sampled.AudioSystem
              .getAudioInputStream(target, ais)
            val raw = pcm.readAllBytes()
            val n = raw.length / 2
            val out = new Array[Double](n)
            var i = 0
            while (i < n) {
              val lo = raw(2 * i) & 0xff
              val hi = raw(2 * i + 1).toInt
              out(i) = ((hi << 8) | lo) / 32768.0
              i += 1
            }
            out
          }
        } catch {
          case scala.util.control.NonFatal(_) => null
        }
      if (samples == null || samples.length == 0) StubCodec.embed(bytes, dim)
      else {
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var i = 0
        while (i < samples.length) {
          val cell = math.min(dim - 1, (i.toLong * dim / samples.length).toInt)
          sums(cell) += samples(i) * samples(i)
          counts(cell) += 1
          i += 1
        }
        Array.tabulate(dim)(i =>
          if (counts(i) == 0) 0.0f
          else math.sqrt(sums(i) / counts(i)).toFloat)
      }
    }
  }

  /** 64-bit perceptual difference hash (dHash) from REAL pixels: decode
    * (javax.imageio), block-average the luma onto a 9x8 grid, then bit
    * (y*8+x) = cell(x,y) < cell(x+1,y) — each bit a horizontal gradient
    * sign. Gradient SIGNS survive re-encoding, mild recompression and
    * brightness shifts, which is what makes dHash the standard cheap
    * image near-dup fingerprint (content hashes catch only byte-exact
    * copies). Undecodable bytes yield None — a bad asset can't fake a
    * fingerprint and pollute a dedup bucket.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try {
        if (bytes == null) null
        else javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w == 0 || h == 0) return None
      val gw = 9
      val gh = 8
      val sums = Array.ofDim[Double](gw, gh)
      val counts = Array.ofDim[Long](gw, gh)
      var y = 0
      while (y < h) {
        val cy = math.min(gh - 1, y * gh / h)
        var x = 0
        while (x < w) {
          val cx = math.min(gw - 1, x * gw / w)
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 255
          val g = (rgb >> 8) & 255
          val b = rgb & 255
          sums(cx)(cy) += 0.299 * r + 0.587 * g + 0.114 * b
          counts(cx)(cy) += 1
          x += 1
        }
        y += 1
      }
      def cell(cx: Int, cy: Int): Double =
        if (counts(cx)(cy) == 0) 0.0 else sums(cx)(cy) / counts(cx)(cy)
      var bits = 0L
      var cy = 0
      while (cy < gh) {
        var cx = 0
        while (cx < 8) {
          if (cell(cx, cy) < cell(cx + 1, cy)) bits |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      Some(bits)
    }
  }

  /** per-kind dispatch: real pixels for images, real PCM for audio,
    * stub for video
    */
  private def embedRow(kind: String, bytes: Array[Byte], dim: Int): Array[Float] =
    kind match {
      case "image" => ImageCodec.embed(bytes, dim)
      case "audio" => AudioCodec.embed(bytes, dim)
      case _ => StubCodec.embed(bytes, dim)
    }

  /** Feature extraction over the binary column, batched per partition —
    * the `mapInPandas` shape: rows are pulled BatchSize at a time (never
    * the whole partition in memory) and decoded per asset within the
    * batch, with per-kind dispatch; the grouped iteration is what bounds
    * memory and amortizes per-row iterator overhead.
    */
  val BatchSize = 64

  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val inEnc: org.apache.spark.sql.Encoder[MediaRow] =
      Encoders.product[MediaRow]
    implicit val outEnc: org.apache.spark.sql.Encoder[MediaFeatures] =
      Encoders.product[MediaFeatures]
    df.select(col("media_id"), col("kind"), col("bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).zipWithIndex.flatMap { case (batch, bi) =>
          val feats = batch.map(r => embedRow(r.kind, r.bytes, dim))
          batch.lazyZip(feats).map { (r, f) =>
            MediaFeatures(r.media_id, r.kind, f, bi)
          }
        }
      }
  }

  /** Perceptual near-dup pair mining over the image rows — the
    * multimodal twin of `dedup_simhash_pairs`, same LSH-banding
    * skeleton on a different fingerprint: decode each image ONCE into
    * its 64-bit dHash (batched partition map, no shuffle), band the
    * hash as 4x16-bit keys, self-join per (band, key), keep a pair only
    * in its FIRST matching band (no distinct pass), verify
    * bit_count(xor) <= maxHamming. Pigeonhole: any pair within hamming
    * <= 3 shares at least one intact 16-bit band, so recall is exact
    * there; the bucket cap kills adversarial monochrome-corpus blowup
    * exactly like the text path. At 100 TB the decode pass dominates
    * and is embarrassingly parallel; everything after it moves one
    * (long, long) per image.
    */
  final case class ImageHash(media_id: Long, dhash: Long)

  val DHashBands = 4
  val DHashBandBits = 16
  val DHashMaxBucket = 256

  def imageHashes(df: DataFrame): Dataset[ImageHash] = {
    implicit val inEnc: org.apache.spark.sql.Encoder[MediaRow] =
      Encoders.product[MediaRow]
    implicit val outEnc: org.apache.spark.sql.Encoder[ImageHash] =
      Encoders.product[ImageHash]
    df.filter(col("kind") === "image")
      .select(col("media_id"), col("kind"), col("bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.flatMap(r =>
            dHash(r.bytes).map(hv => ImageHash(r.media_id, hv)))
        }
      }
  }

  def imageNearDupPairs(df: DataFrame, maxHamming: Int = 6): DataFrame = {
    val mask = (1L << DHashBandBits) - 1
    def bandOf(c: org.apache.spark.sql.Column, b: Int) =
      shiftright(c, DHashBandBits * b).bitwiseAND(lit(mask))
    val wsz = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "key")
    val bands = imageHashes(df).toDF()
      .select(col("media_id"), col("dhash"),
        posexplode(array((0 until DHashBands).map(b =>
          bandOf(col("dhash"), b)): _*)).as(Seq("band", "key")))
      .withColumn("bsz", count(lit(1)).over(wsz))
      .filter(col("bsz") <= DHashMaxBucket)
      .drop("bsz")
    val a = bands.select(col("band"), col("key"),
      col("media_id").as("a_id"), col("dhash").as("fa"))
    val b = bands.select(col("band"), col("key"),
      col("media_id").as("b_id"), col("dhash").as("fb"))
    val firstMatch = (0 until DHashBands).map { i =>
      (0 until i).map(j => bandOf(col("fa"), j) =!= bandOf(col("fb"), j))
        .foldLeft(col("band") === i)(_ && _)
    }.reduce(_ || _)
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id") && firstMatch)
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }

  /** Resize: metadata-only transform (keeps bytes opaque — the cheap
    * path when only downstream bookkeeping needs the new dimensions).
    * Pure column ops — codegen'd. [[resizeImages]] is the real-pixels
    * variant.
    */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms")))

  /** REAL image resize: decodes image bytes (javax.imageio), scales the
    * pixels with Graphics2D bilinear interpolation (java.awt, JDK
    * built-in, headless-safe), re-encodes as PNG, and rewrites the meta
    * dimensions. Non-image rows and undecodable assets pass through
    * UNCHANGED (bytes and meta both) — a bad asset degrades, never
    * fails the partition, mirroring the decode fallback above. Same
    * bounded per-partition batching as [[extractFeatures]]; output rows
    * keep the media schema, so the transform composes with everything
    * downstream.
    */
  final case class MediaMeta(
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Long])
  final case class MediaAsset(
      media_id: Long, kind: String, bytes: Array[Byte],
      meta: Option[MediaMeta])

  /** one asset: decoded-scaled-reencoded PNG, or None when the bytes
    * aren't a decodable image
    */
  private def resizeOne(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img =
      try {
        if (bytes == null) null
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      Some(baos.toByteArray)
    }
  }

  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaAsset] =
      Encoders.product[MediaAsset]
    df.as[MediaAsset]
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            if (r.kind != "image") r
            else resizeOne(r.bytes, w, h) match {
              case Some(b) =>
                r.copy(bytes = b, meta = Some(MediaMeta(
                  Some(w), Some(h),
                  r.meta.flatMap(_.sample_rate),
                  r.meta.flatMap(_.duration_ms))))
              case None => r // undecodable: pass through unchanged
            }
          }
        }
      }
      .toDF()
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals, exploded from the duration metadata — the
    * pattern that turns 1 video row into N frame rows without a shuffle.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L),
          greatest(col("meta.duration_ms") - 1, lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"),
        // stub frame payload: a real codec would decode the frame here
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("frame_ts_ms").cast("string"))).as("frame_stub_id"))

  /** Builder for test/demo data (no media files in the container). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      org.apache.spark.sql.Row(
        i.toLong, kind,
        Array.tabulate[Byte](32 + i % 16)(j => ((i * 31 + j) % 127).toByte),
        org.apache.spark.sql.Row(
          if (kind == "image") Int.box(640) else null,
          if (kind == "image") Int.box(480) else null,
          if (kind == "audio") Int.box(16000) else null,
          if (kind == "video") Long.box(10000L) else null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
