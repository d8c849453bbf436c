package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamOps, StreamTwins}

/** Streaming semantics vs batch twins (SURVEY §5.4): a MemoryStream
  * micro-batch run of each streaming op must agree with the equivalent
  * batch computation over the same rows; watermark drops late rows;
  * keyed TTL state keeps the latest event per user. */
class StreamOpsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  private val rows = Seq(
    StreamOps.Event(1, ts(0), 1, "a", 1.0),
    StreamOps.Event(2, ts(2), 1, "a", 2.0),
    StreamOps.Event(3, ts(7), 2, "b", 3.0),
    StreamOps.Event(4, ts(13), 1, "a", 4.0),
    StreamOps.Event(5, ts(31), 2, "b", 5.0))

  test("tumbling stream == batch groupBy on same data (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(rows: _*)
    val q = StreamOps.tumbling(mem.toDF()).writeStream
      .format("memory").queryName("tumble_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tumble_out")
      .select(date_format(col("wstart"), "HH:mm").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("10:00", "a", 2L), ("10:05", "b", 1L), ("10:10", "a", 1L), ("10:30", "b", 1L)))
  }

  test("watermark drops data later than the delay (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.tumbling(mem.toDF(), delay = "5 minutes").writeStream
      .format("memory").queryName("late_out").outputMode("append").start()
    try {
      mem.addData(rows: _*) // advances watermark to 10:31 - 5min = 10:26
      q.processAllAvailable()
      mem.addData(StreamOps.Event(99, ts(1), 9, "late", 9.0)) // before watermark -> dropped
      mem.addData(StreamOps.Event(100, ts(45), 9, "ok", 1.0)) // closes earlier windows
      q.processAllAvailable()
    } finally q.stop()
    val types = spark.table("late_out").select("event_type").as[String].collect().toSet
    assert(!types.contains("late"), s"late row should be dropped, got $types")
  }

  test("stateful ops run unchanged on the RocksDB state store (the 100 TB provider)") {
    // At scale, streaming state (dedup sets, session maps, join buffers)
    // cannot live on the JVM heap — RocksDB spills to local disk with
    // incremental checkpointing. Spark 4 bundles the provider; this
    // pins that our stateful operators produce identical results under
    // it, so the switch is pure configuration.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Event]
      mem.addData(rows: _*)
      val q = StreamOps.tumbling(mem.toDF()).writeStream
        .format("memory").queryName("rocks_out").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("rocks_out")
        .select(date_format(col("wstart"), "HH:mm").as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set(("10:00", "a", 2L), ("10:05", "b", 1L), ("10:10", "a", 1L), ("10:30", "b", 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("session stream groups events within 10-minute gaps per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(rows: _*)
    val q = StreamOps.sessions(mem.toDF()).writeStream
      .format("memory").queryName("sess_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sess_out")
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // user 1: events at 0,2,13 -> sessions {0,2} and {13} (gap 11m >= 10m);
    // user 2: 7 and 31 -> two single-event sessions
    assert(got.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(1L, 1L))
  }

  test("keyed TTL state keeps latest event per user (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[StreamOps.Event]
    // ttlMs=0 -> NoTimeout: state logic only; wall-clock expiry isn't
    // deterministically testable under processAllAvailable
    val q = StreamOps.lastEventWithTtl(mem.toDS(), ttlMs = 0L).writeStream
      .format("memory").queryName("ttl_out").outputMode("update").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(StreamOps.Event(6, ts(40), 1, "c", 6.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update per user wins: user 1 -> event 6 ("c"), user 2 -> event 5 ("b")
    val latest = spark.table("ttl_out").orderBy(col("last_event_id").desc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).distinct.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).max }
    assert(latest == Map(1L -> 6L, 2L -> 5L))
  }

  test("transformWithState twin matches the fMGWS keyed-TTL semantics (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    // transformWithState runs only on the RocksDB provider — the 100 TB
    // configuration; the twin must produce exactly the fMGWS results
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Event]
      val q = StreamOps.lastEventWithTtlTws(mem.toDS(), ttlMs = 0L).writeStream
        .format("memory").queryName("tws_out").outputMode("update").start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
        mem.addData(StreamOps.Event(6, ts(40), 1, "c", 6.0))
        q.processAllAvailable()
      } finally q.stop()
      val latest = spark.table("tws_out").orderBy(col("last_event_id").desc)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).distinct.groupBy(_._1)
        .map { case (u, xs) => u -> xs.map(_._2).max }
      assert(latest == Map(1L -> 6L, 2L -> 5L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join matches the batch twin's pairs") {
    implicit val sqlCtx = spark.sqlContext
    val sMem = MemoryStream[StreamOps.Event]
    val pMem = MemoryStream[StreamOps.Event]
    sMem.addData(
      StreamOps.Event(1, ts(0), 1, "signup", 0),
      StreamOps.Event(2, ts(5), 2, "signup", 0))
    pMem.addData(
      StreamOps.Event(10, ts(20), 1, "purchase", 5.0),  // within 1h of signup 1
      StreamOps.Event(11, ts(2), 2, "purchase", 6.0),   // BEFORE user 2's signup -> excluded
      StreamOps.Event(12, ts(30), 2, "purchase", 7.0))  // within 1h of signup 2
    val q = StreamOps.signupPurchaseJoin(sMem.toDF(), pMem.toDF()).writeStream
      .format("memory").queryName("ssj_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssj_out").select("signup_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 12L)))
  }

  test("streaming near-dup candidates match the batch index join") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, SparkFixture.sf)
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val index = graft.dedup.Dedup.bandedSignatures(history)
    val mem = MemoryStream[(Long, String)]
    mem.addData(delta.toSeq: _*)
    val q = StreamOps.streamingNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("neardup_out").as[(Long, Long)].collect().toSet
    // batch twin built inline (no table needed): same band join
    val expected = graft.dedup.Dedup.bandedSignatures(docs.filter(col("doc_id") % 5 === 0))
      .join(index.select(col("band_idx"), col("band_hash"), col("doc_id").as("hist_id")),
        Seq("band_idx", "band_hash"))
      .select(col("doc_id"), col("hist_id")).as[(Long, Long)].collect().toSet
    assert(got == expected, s"stream flags ${got.size} vs batch ${expected.size}")
  }

  test("stream-static enrichment joins each micro-batch to the broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("event_type", "category")
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(rows: _*)
    val q = StreamOps.enrichWithStatic(mem.toDF(), dim, "event_type").writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich_out").select("event_id", "category")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toSet
    assert(got == Set((1L, "alpha"), (2L, "alpha"), (4L, "alpha"),
      (3L, "beta"), (5L, "beta")))
  }

  test("left-outer stream join emits unmatched signups on watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val sMem = MemoryStream[StreamOps.Event]
    val pMem = MemoryStream[StreamOps.Event]
    val q = StreamOps.signupPurchaseLeftJoin(sMem.toDF(), pMem.toDF(), delay = "5 minutes")
      .writeStream.format("memory").queryName("ssjl_out").outputMode("append").start()
    try {
      sMem.addData(
        StreamOps.Event(1, ts(0), 1, "signup", 0),
        StreamOps.Event(2, ts(1), 2, "signup", 0)) // never purchases
      pMem.addData(StreamOps.Event(10, ts(20), 1, "purchase", 5.0))
      q.processAllAvailable()
      // push both watermarks past signup 2's join window (1h + 5min)
      val far = java.sql.Timestamp.valueOf("2024-01-01 13:00:00")
      sMem.addData(StreamOps.Event(3, far, 9, "signup", 0))
      pMem.addData(StreamOps.Event(11, far, 9, "purchase", 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjl_out").select("signup_id", "purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), s"matched pair must emit: $got")
    assert(got.contains((2L, -1L)), s"unmatched signup must emit nulls after expiry: $got")
  }

  test("revalidating cache: 304 refreshes TTL, 200 replaces payload") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[StreamOps.Fetch]
    val q = StreamOps.revalidatingCache(mem.toDS()).writeStream
      .format("memory").queryName("reval_out").outputMode("update").start()
    try {
      mem.addData(
        StreamOps.Fetch(1, 10, ts(0), "e1"),
        StreamOps.Fetch(1, 11, ts(1), "e1"), // 304 -> refresh
        StreamOps.Fetch(1, 12, ts(2), "e2"), // 200 -> replace
        StreamOps.Fetch(2, 20, ts(0), "x1"))
      q.processAllAvailable()
      mem.addData(StreamOps.Fetch(1, 13, ts(3), "e2")) // 304 across batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("reval_out")
      .select("event_id", "outcome", "n_refresh", "n_replace")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, "insert", 0L, 1L),
      (11L, "refresh", 1L, 1L),
      (12L, "replace", 1L, 2L),
      (20L, "insert", 0L, 1L),
      (13L, "refresh", 2L, 2L)))
  }

  test("revalidating cache streaming counts agree with the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    // same synthetic fetch log the batch twin derives from events
    val fetches = Tables.events(spark, SparkFixture.sf)
      .select((col("user_id") % 50).as("cache_key"), col("event_id"), col("ts"),
        substring(md5(col("event_type")), 1, 8).as("etag"))
      .as[StreamOps.Fetch].collect().toSeq
    val mem = MemoryStream[StreamOps.Fetch]
    mem.addData(fetches: _*)
    val q = StreamOps.revalidatingCache(mem.toDS()).writeStream
      .format("memory").queryName("reval_twin_out").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // final streaming state per key == the batch fold
    val streamed = spark.table("reval_twin_out")
      .groupBy("cache_key")
      .agg(max(struct(col("n_refresh") + col("n_replace"), col("n_refresh"), col("n_replace"))).as("m"))
      .select(col("cache_key"), col("m").getField("n_refresh").as("n_refresh"),
        col("m").getField("n_replace").as("n_replace"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = StreamTwins.qRevalidate(spark, SparkFixture.sf)
      .select("cache_key", "n_refresh", "n_replace")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("stale-while-revalidate serves the previous payload, then updates") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[StreamOps.Fetch]
    val q = StreamOps.staleWhileRevalidateCache(mem.toDS()).writeStream
      .format("memory").queryName("swr_out").outputMode("update").start()
    try {
      mem.addData(
        StreamOps.Fetch(1, 10, ts(0), "e1"),
        StreamOps.Fetch(1, 11, ts(1), "e2"))
      q.processAllAvailable()
      mem.addData(StreamOps.Fetch(1, 12, ts(2), "e2")) // fresh hit across batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("swr_out")
      .select("event_id", "served_etag", "origin_etag", "served_stale")
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(got == Set(
      (10L, "e1", "e1", false), // miss: served = origin
      (11L, "e1", "e2", true),  // stale serve, state moves to e2
      (12L, "e2", "e2", false)))
  }

  test("streaming dedup keeps the first arrival per key, bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(rows: _*) // in ts order: first arrival == min-ts event per key
    val q = StreamOps.dedupFirst(mem.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out")
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    // batch twin on the same rows: min (ts, event_id) per (user, type)
    val twin = rows.groupBy(e => (e.user_id, e.event_type)).map { case ((u, t), es) =>
      (u, t, es.minBy(e => (e.ts.getTime, e.event_id)).event_id)
    }.toSet
    assert(got == twin, s"expected $twin, got $got")
  }

  test("dedup state on RocksDB stays FLAT as ~1M keys stream past the watermark horizon") {
    // The 100 TB/day state-posture claim, measured instead of asserted:
    // drive ~1M DISTINCT keys through dedupFirst in 6 event-time
    // batches on the RocksDB provider with a 10-minute watermark and
    // 10-minute time steps. Expired keys must leave the store, so
    // state row count after each batch stays ~one horizon's worth of
    // keys — NOT the cumulative key count (a leak there means a
    // wall-clock-shaped OOM in production). Volume is deliberately at
    // the ~1M-key mark so RocksDB holds a six-figure working set per
    // batch; peak rows/bytes are printed and recorded in PERF.md.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Event]
      val q = StreamOps.dedupFirst(mem.toDF(), delay = "10 minutes").writeStream
        .format("memory").queryName("dedup_flat_out").outputMode("append").start()
      val perBatch = 170000 // 6 batches → 1.02M distinct keys total
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stateBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
      try {
        (0 until 6).foreach { b =>
          val t0 = 10L * 60 * 1000 * b // batches advance event time 10 min each
          mem.addData((0 until perBatch).map { i =>
            StreamOps.Event(b.toLong * perBatch + i,
              new java.sql.Timestamp(t0 + (i % 600) * 1000),
              b.toLong * perBatch + i, // every key distinct: worst case for state growth
              "a", 1.0)
          }: _*)
          q.processAllAvailable()
          stateRows += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
          stateBytes += q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum
        }
      } finally q.stop()
      info(s"state rows per batch: ${stateRows.mkString(", ")}")
      info(s"state bytes per batch: ${stateBytes.mkString(", ")} " +
        s"(peak ${stateBytes.max / 1024 / 1024} MiB)")
      val total = 6L * perBatch
      assert(stateRows.last < 3L * perBatch,
        s"state must hold ~one watermark horizon, not all $total keys: $stateRows")
      // flat: the last three batches' state sizes are within 2 batches' keys
      val tail = stateRows.takeRight(3)
      assert(tail.max - tail.min <= perBatch,
        s"steady-state state size must be flat across batches: $stateRows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("upsert snapshot sink: latest row per key survives across batches") {
    implicit val sqlCtx = spark.sqlContext
    val path = "target/upsert_snapshot_test"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(path))
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.upsertSnapshotSink(mem.toDF(), path).start()
    try {
      mem.addData(
        StreamOps.Event(1, ts(0), 1, "a", 1.0),
        StreamOps.Event(2, ts(1), 2, "b", 2.0))
      q.processAllAvailable()
      mem.addData(
        StreamOps.Event(3, ts(5), 1, "c", 3.0), // upsert user 1
        StreamOps.Event(4, ts(6), 3, "d", 4.0)) // new user 3
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(path)
      .select("user_id", "event_id", "event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 3L, "c"), (2L, 2L, "b"), (3L, 4L, "d")),
      s"latest per key must win: $got")
  }

  test("streaming tumble agrees with batch twin on the events table (counts)") {
    // batch twin over real corpus vs streaming run over the same rows
    val batch = StreamTwins.qTumble(spark, SparkFixture.sf)
      .agg(sum("n")).head.getLong(0)
    assert(batch == Tables.events(spark, SparkFixture.sf).count())
  }
}
