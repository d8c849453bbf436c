package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

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
    assert(media.collect().forall(_.bytes.length == 512))
  }

  test("feature extraction: partition-parallel, fixed 8-dim output, entropy bounded") {
    val f = MultimodalOps.extractFeatures(media.repartition(4)).collect()
    assert(f.length == 30)
    assert(f.forall(_.features.length == 8))
    assert(f.forall(x => x.byte_entropy > 0.0 && x.byte_entropy <= 8.0))
    assert(f.forall(_.n_bytes == 512))
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

  test("media stats aggregates per kind") {
    val stats = MultimodalOps.mediaStats(MultimodalOps.extractFeatures(media)).collect()
    assert(stats.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getAs[Long]("n")).sum == 30)
  }
}
