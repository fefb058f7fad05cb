package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, batched partition mapping (the
  * mapInPandas shape), metadata transforms, frame-sampling explode.
  * Codec output is a deterministic stub; plan shape and batching are the
  * real assertions.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val media = Multimodal.syntheticMedia(spark, 300)

  test("schema matches the declared media table shape") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.rdd.getNumPartitions == 4)
  }

  test("feature extraction is batched per partition and deterministic") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.embedding.length == 8))
    // batch shape: 300 rows over 4 partitions (75 each) with BatchSize
    // 64 => batch indices {0, 1} per partition, never one-call-per-row
    assert(rows.map(_.decode_batch).toSet == Set(0, 1))
    // deterministic: same input bytes => same stub features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(rows.sortBy(_.media_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.embedding.toSeq).toSeq)
  }

  test("no shuffle in the extract plan — pure partition map") {
    val feats = Multimodal.extractFeatures(media, dim = 4)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("resizeMeta rewrites only metadata") {
    val resized = Multimodal.resizeMeta(media, 128, 128)
    val img = resized.filter(col("kind") === "image")
      .select("meta.width", "meta.height").distinct().collect()
    assert(img.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((128, 128)))
    assert(resized.count() == 300)
  }

  test("audio decode is real: a generated WAV yields RMS-energy features") {
    // 16 kHz mono 16-bit PCM, 8000 samples: silent first half, loud
    // 440 Hz square wave second half
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    (n / 2 until n).foreach { i =>
      val v: Int = if ((i * 440 * 2 / 16000) % 2 == 0) 16000 else -16000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    val feats = Multimodal.AudioCodec.embed(wav, dim = 8)
    assert(feats.length == 8)
    // silent windows ~0 energy; loud windows ~0.49 (16000/32768 square)
    assert(feats.take(4).forall(_ < 0.01f), feats.toSeq)
    assert(feats.drop(4).forall(_ > 0.4f), feats.toSeq)
    // corrupt bytes degrade to the deterministic stub, never throw
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    assert(Multimodal.AudioCodec.embed(junk, 8).toSeq ==
      Multimodal.StubCodec.embed(junk, 8).toSeq)
    // and through the Spark lineage: an audio row carrying the WAV bytes
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, "audio", wav,
          org.apache.spark.sql.Row(null, null, Int.box(16000), null))), 1),
      Multimodal.mediaSchema)
    val viaSpark = Multimodal.extractFeatures(df, dim = 8).collect().head
    assert(viaSpark.embedding.toSeq == feats.toSeq)
  }

  test("image decode is real: a generated PNG yields pixel-luma features") {
    import java.awt.image.BufferedImage
    // 64x8 PNG: left half pure black, right half pure white
    val img = new BufferedImage(64, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val feats = Multimodal.ImageCodec.embed(png, dim = 8)
    // 8 vertical strips: first 4 all-black (luma 0), last 4 all-white
    // (luma 1) — values only a genuine pixel decode can produce
    assert(feats.take(4).forall(v => math.abs(v) < 1e-3), feats.toSeq)
    assert(feats.drop(4).forall(v => math.abs(v - 1.0f) < 1e-3), feats.toSeq)

    // and through the Spark lineage: an image row carrying the PNG bytes
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, "image", png,
          org.apache.spark.sql.Row(Int.box(64), Int.box(8), null, null)),
        // corrupt bytes must fall back to stub features, not fail
        org.apache.spark.sql.Row(1L, "image", Array[Byte](1, 2, 3),
          org.apache.spark.sql.Row(null, null, null, null))), 1),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(df, dim = 8).collect()
      .sortBy(_.media_id)
    assert(out(0).embedding.toSeq == feats.toSeq)
    assert(out(1).embedding.toSeq ==
      Multimodal.StubCodec.embed(Array[Byte](1, 2, 3), 8).toSeq)
  }

  test("resizeImages rewrites pixels: output decodes at the target size") {
    import java.awt.image.BufferedImage
    // 64x8 black-left / white-right PNG, as in the decode test
    val img = new BufferedImage(64, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val junk = Array[Byte](1, 2, 3)
    val wav = Array[Byte](9, 9)

    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, "image", png,
          org.apache.spark.sql.Row(Int.box(64), Int.box(8), null, null)),
        org.apache.spark.sql.Row(1L, "image", junk,
          org.apache.spark.sql.Row(null, null, null, null)),
        org.apache.spark.sql.Row(2L, "audio", wav,
          org.apache.spark.sql.Row(null, null, Int.box(16000), null))), 1),
      Multimodal.mediaSchema)

    implicit val enc: org.apache.spark.sql.Encoder[Multimodal.MediaAsset] =
      org.apache.spark.sql.Encoders.product[Multimodal.MediaAsset]
    val out = Multimodal.resizeImages(df, 16, 16)
      .as[Multimodal.MediaAsset].collect().sortBy(_.media_id)

    // decodable image: bytes re-encoded, meta rewritten, pixels really 16x16
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).bytes))
    assert(decoded.getWidth == 16 && decoded.getHeight == 16)
    assert(out(0).meta.exists(m => m.width.contains(16) && m.height.contains(16)))
    // content survives the scale: left columns dark, right columns light
    def luma(rgb: Int): Double =
      (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)) / 255.0
    val left = (0 until 16).map(y => luma(decoded.getRGB(1, y))).sum / 16
    val right = (0 until 16).map(y => luma(decoded.getRGB(14, y))).sum / 16
    assert(left < 0.2 && right > 0.8, s"left=$left right=$right")
    // undecodable image and non-image rows pass through untouched
    assert(out(1).bytes.toSeq == junk.toSeq && out(1).meta.exists(_.width.isEmpty))
    assert(out(2).bytes.toSeq == wav.toSeq && out(2).kind == "audio")
    // plan shape: pure partition map, no shuffle
    val plan = Multimodal.resizeImages(df, 16, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("frame sampling explodes videos into frame rows") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val nVideos = media.filter(col("kind") === "video").count()
    // duration 10000ms @ 1/s => 10 frames per video
    assert(frames.count() == nVideos * 10)
    assert(frames.columns.toSeq ==
      Seq("media_id", "frame_ts_ms", "frame_stub_id"))
  }

  test("dHash near-dup pairs: perturbed copy found, distinct image not") {
    import java.awt.image.BufferedImage
    // deterministic 32x32 gradient-ish base image
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val base = png((x, y) => gray(x * 8 % 256))
    // near-dup: same gradient, a single 2x2 block brightened slightly —
    // most gradient signs survive
    val tweaked = png((x, y) =>
      if (x < 2 && y < 2) gray(40) else gray(x * 8 % 256))
    // structurally different: vertical gradient instead of horizontal
    val other = png((x, y) => gray(y * 8 % 256))
    // and one undecodable asset — must vanish, not pair
    val junk = Array[Byte](9, 9, 9)

    val h0 = Multimodal.dHash(base)
    val h1 = Multimodal.dHash(tweaked)
    val h2 = Multimodal.dHash(other)
    assert(h0.isDefined && h1.isDefined && h2.isDefined)
    assert(Multimodal.dHash(junk).isEmpty)
    assert(java.lang.Long.bitCount(h0.get ^ h1.get) <= 6,
      s"near-dup hamming ${java.lang.Long.bitCount(h0.get ^ h1.get)}")
    assert(java.lang.Long.bitCount(h0.get ^ h2.get) > 6,
      s"distinct hamming ${java.lang.Long.bitCount(h0.get ^ h2.get)}")

    val rows = Seq(
      (0L, base), (1L, tweaked), (2L, other), (3L, junk)).map {
      case (id, b) => org.apache.spark.sql.Row(id, "image", b,
        org.apache.spark.sql.Row(Int.box(32), Int.box(32), null, null))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val pairs = Multimodal.imageNearDupPairs(df, maxHamming = 6).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)),
      pairs.mkString(","))
    // each surviving pair appears exactly once (first-match-band dedup)
    assert(pairs.length == pairs.map(r => (r.getLong(0), r.getLong(1)))
      .distinct.length)
  }
}
