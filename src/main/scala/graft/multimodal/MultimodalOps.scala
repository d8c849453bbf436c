package graft.multimodal

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
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment — see [[StubCodec]]) with deterministic fakes; everything
  * Spark-side is real: schema, lazy binary scan, partition-parallel
  * execution, feature schema, explode-shaped frame sampling.
  *
  * Scale notes: binaries ride the columnar scan untouched until the
  * map stage (no shuffle); feature extraction is embarrassingly
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

  /** STUB codec boundary — swap for real decoders (javacv/ffmpeg/ImageIO)
    * in production. Deterministic fakes so tests and the driver can
    * exercise the distributed plumbing end-to-end. */
  object StubCodec {
    /** STUB: a real implementation decodes pixels/samples; this derives
      * a deterministic 8-dim feature vector from the raw bytes. */
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

  /** Deterministic synthetic media table (sha-derived bytes) — the test
    * corpus has no binary table, so the fixture is generated. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(((i % 3) + 3 % 3).toInt % 3)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val bytes = (0 until 16).flatMap(j => md.digest(s"$i:$j".getBytes("UTF-8"))).toArray
      val meta = kind match {
        case "image" => MediaMeta(Some(64 + (i % 4).toInt * 32), Some(64), None, None, Some("png"))
        case "audio" => MediaMeta(None, None, Some(16000), Some(2000 + (i % 5).toInt * 500), Some("wav"))
        case _ => MediaMeta(Some(128), Some(72), None, Some(4000 + (i % 3).toInt * 1000), Some("mp4"))
      }
      MediaRow(i, kind, bytes, meta)
    }
  }

  /** Feature extraction: per-partition batch map (mapInPandas-shaped) —
    * each task walks its partition's binaries once, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = Option(m.bytes).getOrElse(Array.emptyByteArray)
        MediaFeatures(m.media_id, m.kind, b.length.toLong,
          StubCodec.entropy(b), StubCodec.extractFeatures(b))
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (UDTF/explode-shaped fan-out, stays partition-local). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val dur = m.meta.duration_ms.getOrElse(0)
      StubCodec.sampleFrames(Option(m.bytes).getOrElse(Array.emptyByteArray), everyMs, dur)
        .map { case (idx, off, fb) => Frame(m.media_id, idx, off, fb) }
    }
  }

  /** Resize: metadata-level transform (a real impl would re-encode
    * bytes; the stub rewrites the typed meta struct and passes bytes
    * through — the plumbing a real codec would use). */
  def resize(media: Dataset[MediaRow], maxDim: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      (m.meta.width, m.meta.height) match {
        case (Some(w), Some(h)) if math.max(w, h) > maxDim =>
          val scale = maxDim.toDouble / math.max(w, h)
          m.copy(meta = m.meta.copy(width = Some((w * scale).toInt), height = Some((h * scale).toInt)))
        case _ => m
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
