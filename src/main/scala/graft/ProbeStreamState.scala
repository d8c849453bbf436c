package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamOps

/** Dev harness for the STREAMING-STATE-AT-SCALE claim: drives 10M+
  * distinct keys through the two stateful operators on the RocksDB
  * provider (the 100 TB state posture — keyed state cannot live on the
  * JVM heap) and records a per-cohort curve of state rows, state bytes,
  * and cohort latency. A leak shows as a monotone rows ramp; a healthy
  * TTL/watermark shows a FLAT tail — one horizon's worth of keys
  * regardless of how many have streamed past.
  *
  *  - dedupFirst (dropDuplicatesWithinWatermark): EVENT-time expiry —
  *    cohorts advance event time 10 min with a 10-min watermark, every
  *    key distinct (worst case for state growth).
  *  - lastEventWithTtl (flatMapGroupsWithState, ProcessingTimeTimeout):
  *    WALL-clock TTL. The timeout sweeps run as their own micro-batches
  *    for as long as armed timeouts exist (chatty on the default
  *    trigger — see the note at the call site for why it must stay
  *    default). A final drain pause past the TTL shows the reap.
  *
  * Results append to /tmp/probe_stream_state_r7.txt (unbuffered, so a
  * long run is observable) and print to stdout.
  *
  * Usage: runMain graft.ProbeStreamState [keysPerCohort] [cohorts]
  * (defaults 1,250,000 × 8 = 10M distinct keys per operator).
  */
object ProbeStreamState {
  def main(args: Array[String]): Unit = {
    val perCohort = if (args.length > 0) args(0).toInt else 1250000
    val cohorts = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // streaming: no AQE
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val outPath = java.nio.file.Paths.get("/tmp/probe_stream_state_r7.txt")
    def record(line: String): Unit = {
      println(line)
      java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

    def curve(name: String, drainMs: Long)(
        mkQuery: MemoryStream[StreamOps.Event] =>
          org.apache.spark.sql.streaming.StreamingQuery)(
        eventTs: (Int, Int) => Long): Unit = {
      val mem = MemoryStream[StreamOps.Event]
      val q = mkQuery(mem)
      try {
        record(s"== $name: $cohorts cohorts x $perCohort distinct keys")
        def snap(tag: String, sec: Double): Unit = {
          val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
          val bytes = q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum
          record(f"$name $tag: state_rows=$rows%9d state_mib=${bytes / 1024.0 / 1024.0}%8.1f latency_s=$sec%6.2f")
        }
        (0 until cohorts).foreach { b =>
          val t0 = System.nanoTime()
          mem.addData((0 until perCohort).map { i =>
            val key = b.toLong * perCohort + i
            StreamOps.Event(key, new java.sql.Timestamp(eventTs(b, i)), key, "a", 1.0)
          }: _*)
          q.processAllAvailable()
          snap(f"cohort $b%2d", (System.nanoTime() - t0) / 1e9)
        }
        if (drainMs > 0) { // let wall-clock TTLs lapse, then observe the reap
          Thread.sleep(drainMs)
          // nudge: with noDataMicroBatches off, expiry fires inside the
          // next DATA batch — one sentinel row triggers it
          mem.addData(StreamOps.Event(-999L, new java.sql.Timestamp(0L), -999L, "a", 1.0))
          q.processAllAvailable()
          snap("drained  ", drainMs / 1e3)
        }
      } finally q.stop()
    }

    // event-time watermark expiry: every cohort steps event time 10 min
    curve("dedup_first", drainMs = 0) { mem =>
      StreamOps.dedupFirst(mem.toDF(), delay = "10 minutes").writeStream
        .format("noop").outputMode("append").start()
    }((b, i) => 10L * 60 * 1000 * b + (i % 600) * 1000)

    // processing-time TTL: fresh cohort per key range, 10 s TTL reaps
    // earlier cohorts as wall-clock advances across cohorts.
    // noDataMicroBatches is DISABLED for this query: with it on,
    // ProcessingTimeTimeout spins a sweep micro-batch per trigger for
    // as long as any timeout is armed, and past ~10^5 armed keys the
    // sweep loop was measured to starve data-batch pickup entirely
    // (processAllAvailable parked while thousands of no-data batches
    // committed). With it off, timeouts fire inside the next DATA
    // batch — the documented trade (expiry latency bounded by data
    // cadence) and exactly the cohort-cadence shape this curve wants;
    // the final reap is nudged with a 1-row batch after the TTL.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    curve("last_event_ttl", drainMs = 12000) { mem =>
      StreamOps.lastEventWithTtl(mem.toDS(), ttlMs = 10000).writeStream
        .format("noop").outputMode("update")
        .start()
    }((b, i) => 1000L * (i % 600))

    // ---- CRASH RECOVERY at the 10M-key horizon (r7): build the full
    // dedup state under a CHECKPOINT, leave a cohort IN FLIGHT, kill
    // the query (stop() cancels the uncommitted batch — exactly the
    // replay position a crash leaves), then restart from the
    // checkpoint and measure (a) recovery wall time — dominated by the
    // RocksDB state reload across 32 partitions — and (b) state-size
    // CONTINUITY: the restored run must replay the pending cohort and
    // land on the same working-set size the uninterrupted curve shows
    // (two event-time horizons), with no lost and no duplicated state.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    locally {
      val ckpt = java.nio.file.Files.createTempDirectory("probe_recovery").toString
      val mem = MemoryStream[StreamOps.Event]
      def startQ() = StreamOps.dedupFirst(mem.toDF(), delay = "10 minutes")
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      def eventTs(b: Int, i: Int): Long = 10L * 60 * 1000 * b + (i % 600) * 1000
      var q = startQ()
      record(s"== recovery: $cohorts cohorts x $perCohort keys, kill mid-stream + restore")
      try {
        (0 until cohorts).foreach { b =>
          mem.addData((0 until perCohort).map { i =>
            val key = b.toLong * perCohort + i
            StreamOps.Event(key, new java.sql.Timestamp(eventTs(b, i)), key, "a", 1.0)
          }: _*)
          q.processAllAvailable()
        }
        val rowsBefore = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        val mibBefore = q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum / 1024.0 / 1024.0
        // one cohort IN FLIGHT, then kill
        mem.addData((0 until perCohort).map { i =>
          val key = cohorts.toLong * perCohort + i
          StreamOps.Event(key, new java.sql.Timestamp(eventTs(cohorts, i)), key, "a", 1.0)
        }: _*)
        q.stop() // uncommitted batch: the crash point
        val t0 = System.nanoTime()
        q = startQ()
        q.processAllAvailable() // state reload + pending-cohort replay
        val recoverS = (System.nanoTime() - t0) / 1e9
        val rowsAfter = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        val mibAfter = q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum / 1024.0 / 1024.0
        record(f"recovery: rows_before=$rowsBefore%9d (${mibBefore}%8.1f MiB) " +
          f"rows_after=$rowsAfter%9d (${mibAfter}%8.1f MiB) recover_s=$recoverS%6.2f")
      } finally q.stop()
    }

    spark.stop()
  }
}
