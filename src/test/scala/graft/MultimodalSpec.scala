package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.ImageCodec

class MultimodalSpec extends AnyFunSuite {
  import SparkFixture.spark
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private lazy val media = MultimodalOps.syntheticMedia(spark, 30).cache()

  test("synthetic media: deterministic, all kinds present, binary payloads") {
    val a = media.collect().map(m => (m.media_id, m.bytes.toSeq)).toMap
    val b = MultimodalOps.syntheticMedia(spark, 30).collect()
      .map(m => (m.media_id, m.bytes.toSeq)).toMap
    assert(a == b)
    assert(media.collect().map(_.kind).toSet == Set("image", "audio", "video"))
    // video: opaque sha payloads; images: real PNGs; audio: real WAVs
    media.collect().foreach { m =>
      if (m.kind == "image") assert(m.bytes.length > 100)
      else if (m.kind == "audio")
        assert(m.bytes.length > 2 * 16000 * 2) // >= 2 s of 16 kHz 16-bit PCM
      else assert(m.bytes.length == 512)
    }
  }

  test("audio rows are REAL WAVs: known planted clip decodes to exact known samples") {
    import graft.multimodal.MultimodalOps.AudioCodec
    val m = media.filter(_.media_id == 1L).collect().head
    assert(m.kind == "audio")
    // RIFF/WAVE magic
    assert(m.bytes(0) == 'R'.toByte && m.bytes(1) == 'I'.toByte &&
      m.bytes(2) == 'F'.toByte && m.bytes(3) == 'F'.toByte &&
      m.bytes(8) == 'W'.toByte && m.bytes(11) == 'E'.toByte)
    val (samples, rate) = AudioCodec.decodeWav(m.bytes)
    assert(rate == m.meta.sample_rate.get)
    assert(samples.length == rate.toLong * m.meta.duration_ms.get / 1000)
    var t = 0
    while (t < samples.length) {
      assert(samples(t) == AudioCodec.syntheticSample(1L, t), s"sample $t")
      t += 1
    }
  }

  test("WAV encode/decode round-trips PCM losslessly; features are exact") {
    import graft.multimodal.MultimodalOps.AudioCodec
    val src = Array[Short](0, 100, -100, 32767, -32768, 5, -5, 0)
    val (back, rate) = AudioCodec.decodeWav(AudioCodec.encodeWav(src, 8000))
    assert(rate == 8000 && back.toSeq == src.toSeq)
    val f = AudioCodec.features(src)
    // peak = 32768/32768 = 1; zero crossings: sign flips at
    // 100→-100, -100→32767, 32767→-32768, -32768→5, 5→-5, -5→0 = 6/8
    assert(f(2) == 1.0f)
    assert(f(1) == 6.0f / 8)
    // constant signal: zero entropy, rms == mean == peak
    val flat = Array.fill[Short](1000)(1024)
    assert(AudioCodec.entropy(flat) == 0.0)
    val ff = AudioCodec.features(flat)
    assert(ff(0) == ff(2) && ff(2) == ff(3) && ff(3) == 1024.0f / 32768)
  }

  test("image rows are REAL PNGs: known planted image decodes to exact known pixels") {
    // media_id 0, 3, 6, ... are images; decode a stored row and check
    // every pixel equals the planted formula
    val m = media.filter(_.media_id == 3L).collect().head
    assert(m.kind == "image")
    // PNG magic
    assert((m.bytes(0) & 0xff) == 0x89 && m.bytes(1) == 'P'.toByte &&
      m.bytes(2) == 'N'.toByte && m.bytes(3) == 'G'.toByte)
    val img = ImageCodec.decode(m.bytes)
    assert(img.getWidth == m.meta.width.get && img.getHeight == m.meta.height.get)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((img.getRGB(x, y) & 0xffffff) == ImageCodec.syntheticRgb(3L, x, y),
        s"pixel ($x,$y)")
  }

  test("PNG encode/decode round-trips a raster losslessly") {
    val src = ImageCodec.syntheticImage(42L, 17, 9)
    val back = ImageCodec.decode(ImageCodec.encodePng(src))
    assert(back.getWidth == 17 && back.getHeight == 9)
    for (y <- 0 until 9; x <- 0 until 17)
      assert((back.getRGB(x, y) & 0xffffff) == (src.getRGB(x, y) & 0xffffff))
  }

  test("feature extraction: partition-parallel, fixed 8-dim output, entropy bounded") {
    val f = MultimodalOps.extractFeatures(media.repartition(4)).collect()
    assert(f.length == 30)
    assert(f.forall(_.features.length == 8))
    assert(f.forall(x => x.byte_entropy > 0.0 && x.byte_entropy <= 8.0))
    val byId = media.collect().map(m => m.media_id -> m).toMap
    assert(f.forall(x => x.n_bytes == byId(x.media_id).bytes.length))
  }

  test("image features come from true pixels: exact means on a planted raster") {
    import spark.implicits._
    // 2×2 planted raster with hand-computable channel sums
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val row = MultimodalOps.MediaRow(99L, "image", ImageCodec.encodePng(img),
      MultimodalOps.MediaMeta(Some(2), Some(2), None, None, Some("png")))
    val f = MultimodalOps.extractFeatures(spark.createDataset(Seq(row))).collect().head
    // channel means: R = (255+0+0+255)/4/255 = 0.5; same for G and B
    assert(f.features(0) == 0.5f && f.features(1) == 0.5f && f.features(2) == 0.5f)
    // luma: 601 integer luma of pure R/G/B/white = 76, 149, 29, 255
    val expLum = ((76L + 149L + 29L + 255L).toDouble / 4 / 255.0).toFloat
    assert(f.features(3) == expLum)
    // quadrants are single pixels (w/2 = h/2 = 1): TL=R, TR=G, BL=B, BR=white
    assert(f.features(4) == (76.0 / 255.0).toFloat)
    assert(f.features(5) == (149.0 / 255.0).toFloat)
    assert(f.features(6) == (29.0 / 255.0).toFloat)
    assert(f.features(7) == 1.0f)
    // 4 distinct luma values, one pixel each → entropy = log2(4) = 2 bits
    assert(f.byte_entropy == 2.0)
  }

  test("frame sampling: one row per frame, only for video, offsets monotone") {
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000).collect()
    val videos = media.filter(_.kind == "video").collect()
    val expected = videos.map(_.meta.duration_ms.get / 1000).sum
    assert(frames.length == expected)
    frames.groupBy(_.media_id).values.foreach { fs =>
      val offs = fs.sortBy(_.frame_idx).map(_.offset_ms)
      assert(offs.toSeq == offs.sorted.toSeq)
    }
  }

  test("resize caps the max dimension and preserves aspect-free smaller media") {
    val r = MultimodalOps.resize(media, maxDim = 64).collect()
    r.filter(_.meta.width.isDefined).foreach { m =>
      assert(math.max(m.meta.width.get, m.meta.height.getOrElse(0)) <= 64)
    }
    assert(r.length == 30)
  }

  test("image resize really transcodes: decoded output pixels are the exact nearest-neighbor resample") {
    import spark.implicits._
    val id = 9L // 96×64 source (64 + (9%4)·32 = 96)
    val srcRow = media.filter(_.media_id == id).collect().head
    val out = MultimodalOps.resize(spark.createDataset(Seq(srcRow)), maxDim = 48)
      .collect().head
    assert(out.meta.width.contains(48) && out.meta.height.contains(32))
    val img = ImageCodec.decode(out.bytes)
    assert(img.getWidth == 48 && img.getHeight == 32)
    // nearest-neighbor mapping src = dst * srcDim / dstDim, against the
    // planted formula — true pixel-space verification end to end
    for (y <- 0 until 32; x <- 0 until 48) {
      val sx = x * 96 / 48; val sy = y * 64 / 32
      assert((img.getRGB(x, y) & 0xffffff) == ImageCodec.syntheticRgb(id, sx, sy),
        s"pixel ($x,$y)")
    }
    // and the bytes actually shrank (re-encode, not metadata rewrite)
    assert(out.bytes.length < srcRow.bytes.length)
  }

  test("media stats aggregates per kind") {
    val stats = MultimodalOps.mediaStats(MultimodalOps.extractFeatures(media)).collect()
    assert(stats.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getAs[Long]("n")).sum == 30)
  }
}
