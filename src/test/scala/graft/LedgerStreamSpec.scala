package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.etl.Ledger

/** The ledger change feed as a STRUCTURED STREAMING source — the laws
  * the q_ledger_stream oracle can't see: exactly-once delivery across
  * a consumer crash/restart (file-source checkpoint over the staged
  * CDF log), stream ≡ batch parity version by version, and the
  * end-to-end incremental pipeline the feed exists for (CDF inserts
  * driving near-dup dedup against a standing band index). */
class LedgerStreamSpec extends AnyFunSuite {
  import SparkFixture.spark

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("CDF subscription is exactly-once across a consumer restart and equals the batch feed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Ledger.tableRoot("ledger_cdf_stream")
    val docs = (0L until 300L).map(i => (i, "src", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 4)

    // INGEST side: MemoryStream -> the exactly-once ledger sink (the
    // bidirectional story: batches stream IN, changes stream OUT)
    val mem = MemoryStream[(Long, String, String, String)]
    val qin = mem.toDS().toDF("doc_id", "source", "text", "op").writeStream
      .option("checkpointLocation", ckpt("cdf_in"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Ledger.commitBatch(spark, t, id, b, "doc_id"); ()
      }.start()

    // CONSUME side: accumulate delivered rows across consumer lifetimes
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, String)]()
    val outCkpt = ckpt("cdf_out")
    def runConsumerToCompletion(): Unit = {
      val c = Ledger.readChangesStream(spark, t)
        .writeStream.option("checkpointLocation", outCkpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach { r =>
            got.add((r.getAs[Int]("commit_version"), r.getAs[String]("op"),
              r.getAs[Long]("doc_id"), r.getAs[String]("text")))
          }
          ()
        }.start()
      c.processAllAvailable(); c.stop()
    }

    try {
      // v1: an update and an insert
      mem.addData((5L, "src", "edited 5", "upsert"), (400L, "src", "new 400", "upsert"))
      qin.processAllAvailable()
      Ledger.stageChanges(spark, t, "doc_id")
      runConsumerToCompletion()
      assert(got.size == 2, s"v1 must deliver exactly its 2 changes: $got")

      // two more versions land while the consumer is DOWN
      mem.addData((6L, "src", "edited 6", "upsert"))
      qin.processAllAvailable()
      mem.addData((5L, "src", "", "delete"), (401L, "src", "new 401", "upsert"))
      qin.processAllAvailable()
      Ledger.stageChanges(spark, t, "doc_id")
      // RESTART from the same checkpoint: only the unseen versions flow
      runConsumerToCompletion()
    } finally qin.stop()

    val latest = Ledger.latestVersion(spark, t)
    assert(latest == 3)
    val expected = (1 to latest).flatMap { v =>
      Ledger.readChanges(spark, t, v - 1, v, "doc_id").collect().map { r =>
        (v, r.getAs[String]("op"), r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      }
    }
    val delivered = got.toArray(Array.empty[(Int, String, Long, String)]).toSeq
    assert(delivered.size == expected.size,
      s"exactly-once: no duplicates, no gaps (${delivered.size} vs ${expected.size})")
    assert(delivered.toSet == expected.toSet,
      "the stream must deliver exactly the batch change feed")
    // the delete carries its pre-image and the re-run is idempotent
    assert(delivered.exists(e => e._1 == 3 && e._2 == "delete" && e._3 == 5L))
    assert(Ledger.stageChanges(spark, t, "doc_id") == 0, "re-staging is a no-op")
  }

  test("ledger-to-ledger replication: the CDF stream + exactly-once sink reproduce the table downstream") {
    import spark.implicits._
    val up = Ledger.tableRoot("ledger_repl_up")
    val down = Ledger.tableRoot("ledger_repl_down")
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, up, docs, "doc_id", nFiles = 4)
    // seed the replica from the upstream snapshot (the standard CDC
    // bootstrap), then apply the change feed continuously
    Ledger.create(spark, down, Ledger.readVersion(spark, up, 0), "doc_id", nFiles = 4)
    Ledger.merge(spark, up, 0,
      Seq((5L, "upsert", "srcX", "edited 5"), (400L, "upsert", "srcN", "new 400"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    Ledger.merge(spark, up, 1,
      Seq((5L, "delete", "", ""), (6L, "upsert", "srcY", "edited 6"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    Ledger.stageChanges(spark, up, "doc_id")
    // one micro-batch can span several upstream versions; the NET
    // effect per key is the latest version's op (a key upserted in
    // v1 and deleted in v2 must replicate as a delete) — replicate()
    // net-reduces each batch before the exactly-once merge
    val q = Ledger.replicate(spark, up, down, "doc_id", ckpt("repl"))
    try {
      q.processAllAvailable()
      // the replica converges to the upstream head
      val want = Ledger.readVersion(spark, up, 2).orderBy("doc_id").collect().toSeq
      val have = Ledger.readVersion(spark, down,
        Ledger.latestVersion(spark, down)).orderBy("doc_id").collect().toSeq
      assert(have == want, "replica must equal the upstream head after one drain")
      assert(have.exists(_.getLong(0) == 400L) && !have.exists(_.getLong(0) == 5L))
      // more upstream history while the replica stream keeps running
      Ledger.merge(spark, up, 2,
        Seq((400L, "delete", "", ""), (7L, "upsert", "srcZ", "edited 7"))
          .toDF("doc_id", "op", "source", "text"), "doc_id")
      Ledger.stageChanges(spark, up, "doc_id")
      q.processAllAvailable()
      val want2 = Ledger.readVersion(spark, up, 3).orderBy("doc_id").collect().toSeq
      val have2 = Ledger.readVersion(spark, down,
        Ledger.latestVersion(spark, down)).orderBy("doc_id").collect().toSeq
      assert(have2 == want2, "the replica must track new upstream commits incrementally")
    } finally q.stop()
  }

  test("replicate coexists with a concurrent OCC writer on the replica table") {
    import spark.implicits._
    val up = Ledger.tableRoot("ledger_coexist_up")
    val down = Ledger.tableRoot("ledger_coexist_down")
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, up, docs, "doc_id", nFiles = 4)
    Ledger.create(spark, down, Ledger.readVersion(spark, up, 0), "doc_id", nFiles = 4)
    Ledger.merge(spark, up, 0,
      Seq((5L, "upsert", "srcX", "edited 5"), (400L, "upsert", "srcN", "new 400"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    Ledger.stageChanges(spark, up, "doc_id")
    val ck = ckpt("coexist_repl")
    val q = Ledger.replicate(spark, up, down, "doc_id", ck)
    try {
      q.processAllAvailable() // replica applies upstream v1 -> down v1
      // an INDEPENDENT OCC batch writer lands on the replica between
      // stream batches — the round-7 commitBatch would abort here
      // (strict version succession); the txn-marked OCC sink serializes
      assert(Ledger.mergeOcc(spark, down,
        Seq((9000L, "upsert", "occ", "occ row")).toDF("doc_id", "op", "source", "text"),
        "doc_id") == 2)
      Ledger.merge(spark, up, 1,
        Seq((400L, "delete", "", ""), (6L, "upsert", "srcY", "edited 6"))
          .toDF("doc_id", "op", "source", "text"), "doc_id")
      Ledger.stageChanges(spark, up, "doc_id")
      q.processAllAvailable() // stream commits ON TOP of the OCC write
    } finally q.stop()
    assert(Ledger.latestVersion(spark, down) == 3,
      "stream batch 2 must serialize after the interleaved OCC commit")
    val want = Ledger.readVersion(spark, up, 2)
      .unionByName(Seq((9000L, "occ", "occ row")).toDF("doc_id", "source", "text"))
      .orderBy("doc_id").collect().toSeq
    val have = Ledger.readVersion(spark, down, 3).orderBy("doc_id").collect().toSeq
    assert(have == want, "replica = upstream head + the OCC writer's row, no lost update")
    // restart replay safety: the drained subscription re-delivers
    // nothing and the interleaved history does not confuse txn dedup
    val q2 = Ledger.replicate(spark, up, down, "doc_id", ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(Ledger.latestVersion(spark, down) == 3, "a drained restart must commit nothing")
  }

  test("stageChanges scans from the staged high-water mark, not from version 1") {
    import spark.implicits._
    val t = Ledger.tableRoot("ledger_cdf_hwm")
    val docs = (0L until 200L).map(i => (i, "src", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 4)
    (0 until 6).foreach { v =>
      Ledger.merge(spark, t, v,
        Seq((v.toLong, "upsert", "src", s"edit $v")).toDF("doc_id", "op", "source", "text"),
        "doc_id")
    }
    val p0 = Ledger.stageScanProbes.get()
    assert(Ledger.stageChanges(spark, t, "doc_id") == 6)
    assert(Ledger.stageScanProbes.get() - p0 == 6, "first staging examines each new version once")
    val p1 = Ledger.stageScanProbes.get()
    assert(Ledger.stageChanges(spark, t, "doc_id") == 0)
    assert(Ledger.stageScanProbes.get() - p1 == 0,
      "a current feed must examine ZERO versions — O(new), not O(history)")
    Ledger.merge(spark, t, 6,
      Seq((99L, "upsert", "src", "edit 99")).toDF("doc_id", "op", "source", "text"),
      "doc_id")
    val p2 = Ledger.stageScanProbes.get()
    assert(Ledger.stageChanges(spark, t, "doc_id") == 1)
    assert(Ledger.stageScanProbes.get() - p2 == 1, "one new version = one probe")
  }

  test("the staged high-water mark is monotone under racing stagers") {
    import spark.implicits._
    val t = Ledger.tableRoot("ledger_cdf_hwm_race")
    val docs = (0L until 100L).map(i => (i, "src", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 2)
    (0 until 3).foreach { v =>
      Ledger.merge(spark, t, v,
        Seq((v.toLong, "upsert", "src", s"edit $v")).toDF("doc_id", "op", "source", "text"),
        "doc_id")
    }
    // two stagers race the same 3 new versions: staging is idempotent
    // (rename-only publish), and whatever interleave happens the mark
    // must land at 3, never below
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try Ledger.stageChanges(spark, t, "doc_id")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing stagers must both succeed: ${errs.peek()}")
    assert(Ledger.stagedHwm(spark, t) == 3)
    // the exact regression the LWW file allowed: a STALE stager that
    // verified only v1 records its (true, but lower) statement after
    // the mark reached 3 — with marker files the max is unmoved
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(t), spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(s"$t/cdf/_hwm_v1")
    val out = f.create(stale, true); out.close()
    assert(Ledger.stagedHwm(spark, t) == 3,
      "a lower marker landing late must not regress the mark")
    // and the next tick trusts the mark: zero version probes
    val p = Ledger.stageScanProbes.get()
    assert(Ledger.stageChanges(spark, t, "doc_id") == 0)
    assert(Ledger.stageScanProbes.get() - p == 0)
    // legacy single-file form still reads (back-compat floor): a
    // higher legacy value wins over present markers
    val legacy = f.create(new org.apache.hadoop.fs.Path(s"$t/cdf/_hwm"), true)
    legacy.write("3".getBytes("UTF-8")); legacy.close()
    f.delete(new org.apache.hadoop.fs.Path(s"$t/cdf/_hwm_v3"), false)
    assert(Ledger.stagedHwm(spark, t) == 3, "legacy _hwm reads as a floor")
  }

  test("CDF restart after an upstream schema evolution: widened schema, replica converges") {
    import spark.implicits._
    val up = Ledger.tableRoot("ledger_evostream_up")
    val down = Ledger.tableRoot("ledger_evostream_down")
    val docs = (0L until 200L).map(i => (i, s"src${i % 3}", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, up, docs, "doc_id", nFiles = 4)
    Ledger.create(spark, down, Ledger.readVersion(spark, up, 0), "doc_id", nFiles = 4)
    Ledger.merge(spark, up, 0,
      Seq((5L, "upsert", "srcX", "edited 5")).toDF("doc_id", "op", "source", "text"),
      "doc_id")
    Ledger.stageChanges(spark, up, "doc_id")
    val ck = ckpt("evostream_repl")
    val q1 = Ledger.replicate(spark, up, down, "doc_id", ck)
    try q1.processAllAvailable() finally q1.stop()
    // upstream WIDENS after the subscription drained: metadata-only
    // ADD COLUMN, then a merge that backfills it and inserts a row
    // born with the new column
    Ledger.evolve(spark, up, 1, Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    Ledger.merge(spark, up, 2,
      Seq((5L, "upsert", "srcX", "edited 5 again", "en"),
          (500L, "upsert", "srcN", "born wide", "xx"))
        .toDF("doc_id", "op", "source", "text", "lang"), "doc_id")
    Ledger.stageChanges(spark, up, "doc_id")
    // RESTART the same subscription (same checkpoint): the stream's
    // schema is re-derived from the upstream TABLE, so it reads the
    // widened CDF; the sink auto-evolves the replica before merging
    val q2 = Ledger.replicate(spark, up, down, "doc_id", ck)
    try q2.processAllAvailable() finally q2.stop()
    val want = Ledger.readVersion(spark, up, 3).orderBy("doc_id").collect().toSeq
    val have = Ledger.readVersion(spark, down,
      Ledger.latestVersion(spark, down)).orderBy("doc_id").collect().toSeq
    assert(Ledger.readVersion(spark, down, Ledger.latestVersion(spark, down))
      .columns.toSeq == Seq("doc_id", "source", "text", "lang"),
      "the replica must auto-evolve to the widened schema")
    assert(have == want, "replica must converge to the widened upstream head")
    // a FRESH subscription reading the whole MIXED-schema feed from
    // scratch: pre-evolution partitions must null-fill the new column
    // (unified parquet read), not drop rows or project columns away
    val down2 = Ledger.tableRoot("ledger_evostream_down2")
    Ledger.create(spark, down2, Ledger.readVersion(spark, up, 0), "doc_id", nFiles = 4)
    val q3 = Ledger.replicate(spark, up, down2, "doc_id", ckpt("evostream_fresh"))
    try q3.processAllAvailable() finally q3.stop()
    val have2 = Ledger.readVersion(spark, down2,
      Ledger.latestVersion(spark, down2)).orderBy("doc_id").collect().toSeq
    assert(have2 == want,
      "a from-scratch drain over mixed-schema CDF partitions must converge identically")
  }

  test("subscribing before anything is staged fails with an actionable error, not PATH_NOT_FOUND") {
    import spark.implicits._
    val t = Ledger.tableRoot("ledger_cdf_unstaged")
    Ledger.create(spark, t,
      (0L until 10L).map(i => (i, "src", s"b$i")).toDF("doc_id", "source", "text"),
      "doc_id", nFiles = 1)
    val e = intercept[IllegalArgumentException] {
      Ledger.readChangesStream(spark, t)
    }
    assert(e.getMessage.contains("stageChanges"))
  }

  test("vacuumed history: staging skips unstageable version pairs, already-staged CDF survives") {
    import spark.implicits._
    val t = Ledger.tableRoot("ledger_cdf_vacuum")
    val docs = (0L until 200L).map(i => (i, "src", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 4)
    Ledger.merge(spark, t, 0,
      Seq((5L, "upsert", "src", "edited 5")).toDF("doc_id", "op", "source", "text"),
      "doc_id")
    // stage v1 BEFORE vacuum — the Delta-style contract: CDF couples
    // to snapshot retention, consumers stage ahead of it
    assert(Ledger.stageChanges(spark, t, "doc_id") == 1)
    Ledger.merge(spark, t, 1,
      Seq((6L, "delete", "", "")).toDF("doc_id", "op", "source", "text"),
      "doc_id")
    Ledger.merge(spark, t, 2,
      Seq((7L, "upsert", "src", "edited 7")).toDF("doc_id", "op", "source", "text"),
      "doc_id")
    Ledger.vacuum(spark, t, keepFrom = 2)
    // v2's pair (1,2) straddles the dropped v1 manifest: the default
    // FAILS LOUDLY (a silent skip would hand subscribers an
    // undetectable hole — a delete they never see) ...
    val e = intercept[IllegalStateException] {
      Ledger.stageChanges(spark, t, "doc_id")
    }
    assert(e.getMessage.contains("straddles vacuumed history"))
    // ... and allowGaps opts into skipping it; v3's intact pair (2,3)
    // still stages
    assert(Ledger.stageChanges(spark, t, "doc_id", allowGaps = true) == 1,
      "only the fully-retained version pair must stage after vacuum")
    val feed = spark.read.parquet(s"$t/cdf")
      .select("commit_version", "op", "doc_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(feed == Set((1, "update", 5L), (3, "update", 7L)),
      "pre-vacuum staged v1 survives; v3 staged; vacuum-straddling v2 absent")
  }

  test("continuous pipeline: CDF inserts drive incremental near-dup dedup against a standing index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val history = (0L until 200L).map(i => (i, "hist", s"$words document $i"))
      .toDF("doc_id", "source", "text")
    val t = Ledger.tableRoot("ledger_cdf_dedup")
    Ledger.create(spark, t, history, "doc_id", nFiles = 4)
    // the standing band index the daily/streaming job joins against
    // (in-memory catalog forgets tables between JVMs but the warehouse
    // dir persists — clear both, the SkewSpec pattern)
    val idx = "graft_cdf_dedup_idx"
    spark.sql(s"DROP TABLE IF EXISTS $idx")
    val whDir = new java.io.File(s"spark-warehouse/$idx")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(whDir)
    }
    Dedup.writeBandIndex(history, idx)

    // the delta arrives as TWO ledger commits: exact copies of history
    // texts under new ids (guaranteed band collisions) + fresh noise
    val mem = MemoryStream[(Long, String, String)]
    val qin = mem.toDS().toDF("doc_id", "source", "text").writeStream
      .option("checkpointLocation", ckpt("cdf_dedup_in"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Ledger.commitBatch(spark, t, id, b, "doc_id"); ()
      }.start()
    val cands = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val outCkpt = ckpt("cdf_dedup_out")
    def consumeOnce(): Unit = {
      val c = Ledger.readChangesStream(spark, t)
        .writeStream.option("checkpointLocation", outCkpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          // the incremental-dedup kernel, per micro-batch: new docs vs
          // the standing index — delta-sized work, index Exchange-free
          val inserts = b.filter(col("op") === "insert")
            .select(col("doc_id"), col("text"))
          Dedup.candidatesAgainstIndex(spark, inserts, idx).collect()
            .foreach(r => cands.add((r.getAs[Long]("doc_id"), r.getAs[Long]("hist_id"))))
          ()
        }.start()
      c.processAllAvailable(); c.stop()
    }
    try {
      mem.addData((1000L, "delta", s"$words document 17"), // copy of doc 17
        (1001L, "delta", "unrelated fresh content one two three four five six"))
      qin.processAllAvailable()
      Ledger.stageChanges(spark, t, "doc_id")
      consumeOnce()
      mem.addData((1002L, "delta", s"$words document 42")) // copy of doc 42
      qin.processAllAvailable()
      Ledger.stageChanges(spark, t, "doc_id")
      consumeOnce()
    } finally qin.stop()

    val streamed = cands.toArray(Array.empty[(Long, Long)]).toSet
    // batch twin over the SAME delta: the stream must find exactly what
    // one batch pass over the accumulated delta finds
    val delta = Seq((1000L, s"$words document 17"),
      (1001L, "unrelated fresh content one two three four five six"),
      (1002L, s"$words document 42")).toDF("doc_id", "text")
    val batch = Dedup.candidatesAgainstIndex(spark, delta, idx).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hist_id"))).toSet
    assert(streamed == batch, s"stream/batch dedup parity: $streamed vs $batch")
    assert(streamed.contains((1000L, 17L)) && streamed.contains((1002L, 42L)),
      s"exact copies must surface as candidates: $streamed")
    assert(!streamed.exists(_._1 == 1001L), "fresh content must not collide")
  }
}
