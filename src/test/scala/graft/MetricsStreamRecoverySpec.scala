package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.obs.Metrics

class MetricsStreamRecoverySpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}
  import spark.implicits._

  test("metrics collector reports rows/bytes/shuffle for a query") {
    val (cnt, rep) = Metrics.measure(spark) {
      graft.ops.Relational.q1Pricing(spark, sf).count()
    }
    assert(cnt == 6)
    assert(rep.tasks > 0 && rep.failedTasks == 0)
    assert(rep.recordsRead >= 6000, s"records=${rep.recordsRead}") // full lineitem scanned
    assert(rep.bytesRead > 0 && rep.shuffleBytesWritten > 0)
  }

  test("streaming file-sink with checkpoint recovers exactly-once across restarts") {
    val root = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(in).mkdirs()

    def addBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00"), "t"))
        .toDF("event_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(in)

    def startQuery() = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    addBatch(0 until 100)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 100)

    // restart from the same checkpoint with new + already-processed files present
    addBatch(100 until 150)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(ids.length == 150, s"expected exactly-once 150, got ${ids.length}")
    assert(ids.toSeq == (0L until 150L))
  }
}
