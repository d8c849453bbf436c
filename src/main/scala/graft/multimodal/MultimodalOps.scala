package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for LLM-data pipelines: image/audio/video
  * as opaque `binary` columns + typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling implemented as
  * per-partition batch transforms (`mapPartitions` over a typed Dataset
  * — the Scala analogue of `mapInPandas`: one iterator per partition,
  * executor-local batching, no driver involvement).
  *
  * The IMAGE path is REAL: fixture rows carry genuine PNG bytes
  * (ImageIO-encoded), and decode / pixel features / entropy / resize
  * run over true decoded pixels via [[ImageCodec]] (`javax.imageio`
  * ships in every JDK — PNG/JPEG/BMP/GIF). The AUDIO path is REAL
  * too: fixture rows carry genuine 16-bit PCM WAV bytes, and decode /
  * sample features / entropy run over true decoded samples via
  * [[AudioCodec]] (`javax.sound.sampled`, also in every JDK —
  * WAV/AIFF/AU PCM). Only VIDEO stays behind the declared
  * deterministic [[StubCodec]] boundary (the JDK has no video codec;
  * that call is the swap point for javacv/ffmpeg in production) — the
  * distributed plumbing around it (schema, lazy binary scan,
  * partition-parallel batches, explode-shaped frame fan-out) is
  * identical either way.
  *
  * Scale notes: binaries ride the columnar scan untouched until the
  * map stage (no shuffle); decode + feature extraction is embarrassingly
  * parallel; `repartition` only to rebalance skewed media sizes.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("format", StringType))))))

  case class MediaMeta(width: Option[Int], height: Option[Int],
    sample_rate: Option[Int], duration_ms: Option[Int], format: Option[String])
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    byte_entropy: Double, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Int, frame_bytes: Array[Byte])

  /** REAL image codec over `javax.imageio` — decodes true pixels,
    * computes pixel-space features, and re-encodes resizes as PNG.
    * Every computation accumulates INTEGER pixel sums (exact longs)
    * before one final float division, so features are bit-deterministic
    * across partitionings and runs; PNG encode is deterministic too
    * (fixed raster → fixed deflate stream), which DeterminismSpec and
    * the q_media_resize oracle both rely on. */
  object ImageCodec {
    // never spill decode scratch to disk-backed stream caches: a per-task
    // ImageIO tmp file would serialize decodes at scale
    ImageIO.setUseCache(false)

    /** Deterministic synthetic image: pixel (x, y) of image `id` is a
      * fixed modular function of (id, x, y) — bright, structured, and
      * exactly recomputable in specs. */
    def syntheticImage(id: Long, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, syntheticRgb(id, x, y))
          x += 1
        }
        y += 1
      }
      img
    }

    /** The planted-pixel formula, exposed so specs can assert decoded
      * pixels equal it exactly. */
    def syntheticRgb(id: Long, x: Int, y: Int): Int = {
      val r = ((x * 7 + y * 13 + id * 31) % 256).toInt
      val g = ((x * 3 + y * 5 + id * 17) % 256).toInt
      val b = ((x * 11 + y * 2 + id * 43) % 256).toInt
      (r << 16) | (g << 8) | b
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream(1 << 12)
      if (!ImageIO.write(img, "png", bos))
        throw new IllegalStateException("no PNG writer available")
      bos.toByteArray
    }

    /** Decode or fail LOUDLY — an image-kind row whose bytes don't
      * decode is corrupt data, not a row to silently skip. */
    def decode(bytes: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"image bytes (${bytes.length} B) do not decode via ImageIO")
      img
    }

    /** Integer ITU-R 601 luma (0..255): (299 r + 587 g + 114 b) / 1000 —
      * integer arithmetic end to end. */
    def luma(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }

    /** Shannon entropy (bits) of the 256-bin luma histogram — a real
      * pixel-space quality signal (flat images → 0, textured → high). */
    def entropy(img: BufferedImage): Double = {
      val counts = new Array[Long](256)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { counts(luma(img.getRGB(x, y))) += 1; x += 1 }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      var e = 0.0
      var i = 0
      while (i < 256) {
        if (counts(i) > 0) { val p = counts(i) / n; e -= p * math.log(p) / math.log(2) }
        i += 1
      }
      e
    }

    /** 8-dim pixel feature vector: mean R, G, B, luma (each /255), then
      * the four quadrant luma means (/255) — the cheap perceptual
      * signature the similarity/dedup queries embed. Integer sums per
      * channel/quadrant, one float division each at the end. */
    def features(img: BufferedImage): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight
      var sr, sg, sb, sl = 0L
      val qs = new Array[Long](4)
      val qn = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          val l = luma(rgb)
          sl += l
          val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
          qs(q) += l; qn(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val out = new Array[Float](8)
      if (n > 0) {
        out(0) = (sr.toDouble / n / 255.0).toFloat
        out(1) = (sg.toDouble / n / 255.0).toFloat
        out(2) = (sb.toDouble / n / 255.0).toFloat
        out(3) = (sl.toDouble / n / 255.0).toFloat
        var q = 0
        while (q < 4) {
          if (qn(q) > 0) out(4 + q) = (qs(q).toDouble / qn(q) / 255.0).toFloat
          q += 1
        }
      }
      out
    }

    /** Nearest-neighbor resample with explicit integer source mapping
      * (src = dst * srcDim / dstDim) — no Graphics2D rendering pipeline,
      * so the output raster is exactly specified and spec-assertable. */
    def resizeNearest(img: BufferedImage, nw: Int, nh: Int): BufferedImage = {
      val w = img.getWidth; val h = img.getHeight
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < nh) {
        val sy = (y.toLong * h / nh).toInt
        var x = 0
        while (x < nw) {
          out.setRGB(x, y, img.getRGB((x.toLong * w / nw).toInt, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL audio codec over `javax.sound.sampled` (ships in every JDK
    * — WAV/AIFF/AU containers, PCM encodings). Decodes true 16-bit PCM
    * samples and computes sample-space features with integer
    * accumulators (exact longs) before one final double division, so
    * results are bit-deterministic across partitionings and runs; the
    * RIFF/WAVE encode of a fixed sample array is a fixed byte stream,
    * which DeterminismSpec and the media oracles rely on. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** The planted-sample formula (16-bit mono): sample t of clip `id`
      * is an integer sum of an id-derived square wave and sawtooth —
      * textured, bounded, and exactly recomputable in specs. */
    def syntheticSample(id: Long, t: Int): Short = {
      val p1 = (32 + (id % 7) * 8).toInt
      val p2 = (96 + (id % 5) * 32).toInt
      val sq = if ((t / p1) % 2 == 0) 6000 else -6000
      val saw = (t % p2) * 8000 / p2 - 4000
      (sq + saw).toShort
    }

    def syntheticPcm(id: Long, sampleRate: Int, durationMs: Int): Array[Short] = {
      val n = (sampleRate.toLong * durationMs / 1000).toInt
      Array.tabulate(n)(t => syntheticSample(id, t))
    }

    /** Encode 16-bit signed little-endian mono PCM as WAV. */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream(raw.length + 64)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode or fail LOUDLY — an audio-kind row whose bytes don't
      * decode is corrupt data, not a row to silently skip. Accepts any
      * 16-bit signed PCM container the JDK reads (WAV/AIFF/AU);
      * multi-channel input downmixes by integer average. Returns
      * (mono samples, sample rate). */
    def decodeWav(bytes: Array[Byte]): (Array[Short], Int) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.getEncoding !=
          AudioFormat.Encoding.PCM_SIGNED)
        throw new IllegalArgumentException(
          s"audio bytes are ${f.getEncoding}/${f.getSampleSizeInBits}-bit; " +
            "expected 16-bit signed PCM")
      val all = ais.readAllBytes()
      val ch = f.getChannels
      val n = all.length / 2 / ch
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        var acc = 0
        var c = 0
        while (c < ch) {
          val o = (i * ch + c) * 2
          val s =
            if (f.isBigEndian) ((all(o) << 8) | (all(o + 1) & 0xff)).toShort
            else ((all(o + 1) << 8) | (all(o) & 0xff)).toShort
          acc += s
          c += 1
        }
        out(i) = (acc / ch).toShort
        i += 1
      }
      (out, f.getSampleRate.toInt)
    }

    /** Shannon entropy (bits) of the 256-bin histogram over the high
      * byte of each sample — the sample-space texture signal (silence
      * → 0, rich waveforms → high). */
    def entropy(samples: Array[Short]): Double = {
      if (samples.isEmpty) return 0.0
      val counts = new Array[Long](256)
      var i = 0
      while (i < samples.length) {
        counts(((samples(i) >> 8) & 0xff)) += 1
        i += 1
      }
      val n = samples.length.toDouble
      var e = 0.0
      var b = 0
      while (b < 256) {
        if (counts(b) > 0) { val p = counts(b) / n; e -= p * math.log(p) / math.log(2) }
        b += 1
      }
      e
    }

    /** 8-dim sample feature vector: RMS, zero-crossing rate, peak,
      * mean |amplitude| (each normalized to [0,1]), then the four
      * time-quarter mean |amplitude|s — the temporal analogue of the
      * image quadrant features. Integer sums (sum of squares fits a
      * long for any clip under ~2^33 samples), one division each. */
    def features(samples: Array[Short]): Array[Float] = {
      val n = samples.length
      val out = new Array[Float](8)
      if (n == 0) return out
      var sumSq = 0L
      var sumAbs = 0L
      var peak = 0L
      var zc = 0L
      val qs = new Array[Long](4)
      val qn = new Array[Long](4)
      var i = 0
      while (i < n) {
        val s = samples(i).toLong
        sumSq += s * s
        val a = math.abs(s)
        sumAbs += a
        if (a > peak) peak = a
        if (i > 0 && ((samples(i - 1) < 0 && s >= 0) || (samples(i - 1) >= 0 && s < 0)))
          zc += 1
        val q = math.min(3, i * 4 / n)
        qs(q) += a; qn(q) += 1
        i += 1
      }
      out(0) = (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat
      out(1) = (zc.toDouble / n).toFloat
      out(2) = (peak.toDouble / 32768.0).toFloat
      out(3) = (sumAbs.toDouble / n / 32768.0).toFloat
      var q = 0
      while (q < 4) {
        if (qn(q) > 0) out(4 + q) = (qs(q).toDouble / qn(q) / 32768.0).toFloat
        q += 1
      }
      out
    }
  }

  /** STUB codec boundary for VIDEO only (the JDK has no video codec;
    * swap for javacv/ffmpeg in production). Deterministic fakes so
    * tests and the driver can exercise the distributed plumbing end to
    * end. Image and audio calls never come here. */
  object StubCodec {
    /** STUB: a real implementation decodes samples; this derives a
      * deterministic 8-dim feature vector from the raw bytes. */
    def extractFeatures(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { out(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      if (bytes.length > 0) out.indices.foreach(j => out(j) /= bytes.length)
      out
    }

    /** STUB: byte-level Shannon entropy stands in for a perceptual
      * quality score. */
    def entropy(bytes: Array[Byte]): Double = {
      if (bytes.isEmpty) return 0.0
      val counts = new Array[Long](256)
      bytes.foreach(b => counts(b & 0xff) += 1)
      val n = bytes.length.toDouble
      counts.filter(_ > 0).map { c => val p = c / n; -p * math.log(p) / math.log(2) }.sum
    }

    /** STUB: a real implementation seeks to keyframes; this slices the
      * byte stream at fixed offsets. */
    def sampleFrames(bytes: Array[Byte], everyMs: Int, durationMs: Int): Seq[(Int, Int, Array[Byte])] = {
      if (durationMs <= 0 || everyMs <= 0) return Seq.empty
      val n = math.max(1, durationMs / everyMs)
      (0 until n).map { i =>
        val off = i * everyMs
        val sliceStart = if (durationMs == 0) 0 else (bytes.length.toLong * off / durationMs).toInt
        val slice = bytes.slice(sliceStart, math.min(bytes.length, sliceStart + 64))
        (i, off, slice)
      }
    }
  }

  /** Deterministic synthetic media table. IMAGE rows carry REAL PNG
    * bytes (ImageIO-encoded deterministic rasters); AUDIO rows carry
    * REAL WAV bytes (16-bit PCM mono, planted integer waveforms);
    * video rows keep sha-derived opaque payloads behind the stub
    * boundary. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(((i % 3) + 3 % 3).toInt % 3)
      kind match {
        case "image" =>
          val w = 64 + (i % 4).toInt * 32
          val h = 64
          val bytes = ImageCodec.encodePng(ImageCodec.syntheticImage(i, w, h))
          MediaRow(i, kind, bytes, MediaMeta(Some(w), Some(h), None, None, Some("png")))
        case "audio" =>
          val rate = 16000
          val durMs = 2000 + (i % 5).toInt * 500
          val bytes = AudioCodec.encodeWav(AudioCodec.syntheticPcm(i, rate, durMs), rate)
          MediaRow(i, kind, bytes, MediaMeta(None, None, Some(rate), Some(durMs), Some("wav")))
        case _ =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val bytes = (0 until 16).flatMap(j => md.digest(s"$i:$j".getBytes("UTF-8"))).toArray
          MediaRow(i, kind, bytes,
            MediaMeta(Some(128), Some(72), None, Some(4000 + (i % 3).toInt * 1000), Some("mp4")))
      }
    }
  }

  /** Feature extraction: per-partition batch map (mapInPandas-shaped) —
    * each task walks its partition's binaries once, no shuffle. Images
    * decode to real pixels ([[ImageCodec]]); audio decodes to real PCM
    * samples ([[AudioCodec]]); video goes through the stub boundary. */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = Option(m.bytes).getOrElse(Array.emptyByteArray)
        if (m.kind == "image" && b.nonEmpty) {
          val img = ImageCodec.decode(b)
          MediaFeatures(m.media_id, m.kind, b.length.toLong,
            ImageCodec.entropy(img), ImageCodec.features(img))
        } else if (m.kind == "audio" && b.nonEmpty) {
          val (samples, _) = AudioCodec.decodeWav(b)
          MediaFeatures(m.media_id, m.kind, b.length.toLong,
            AudioCodec.entropy(samples), AudioCodec.features(samples))
        } else {
          MediaFeatures(m.media_id, m.kind, b.length.toLong,
            StubCodec.entropy(b), StubCodec.extractFeatures(b))
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (UDTF/explode-shaped fan-out, stays partition-local). Video only —
    * stub boundary (no JDK video codec). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val dur = m.meta.duration_ms.getOrElse(0)
      StubCodec.sampleFrames(Option(m.bytes).getOrElse(Array.emptyByteArray), everyMs, dur)
        .map { case (idx, off, fb) => Frame(m.media_id, idx, off, fb) }
    }
  }

  /** Resize. IMAGES do the real thing: decode → nearest-neighbor
    * resample to max dimension `maxDim` (aspect preserved, truncating
    * scale, matching the metadata arithmetic) → re-encode PNG; bytes
    * AND meta both change. Audio passes through; video (no JDK codec)
    * gets the metadata-level transform — the documented stub half. */
  def resize(media: Dataset[MediaRow], maxDim: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image" && m.bytes != null && m.bytes.nonEmpty) {
          val img = ImageCodec.decode(m.bytes)
          val w = img.getWidth; val h = img.getHeight
          if (math.max(w, h) > maxDim) {
            val scale = maxDim.toDouble / math.max(w, h)
            val out = ImageCodec.resizeNearest(img,
              math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            m.copy(bytes = ImageCodec.encodePng(out),
              meta = m.meta.copy(width = Some(out.getWidth), height = Some(out.getHeight)))
          } else m
        } else (m.meta.width, m.meta.height) match {
          case (Some(w), Some(h)) if math.max(w, h) > maxDim =>
            val scale = maxDim.toDouble / math.max(w, h)
            m.copy(meta = m.meta.copy(width = Some((w * scale).toInt),
              height = Some((h * scale).toInt)))
          case _ => m
        }
      }
    }
  }

  /** Aggregate stats per kind — the downstream "is this corpus healthy"
    * query a pipeline would run after extraction. */
  def mediaStats(features: Dataset[MediaFeatures]): DataFrame =
    features.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("byte_entropy")).as("min_entropy"),
        max(col("byte_entropy")).as("max_entropy"))
      .orderBy(col("kind"))
}
