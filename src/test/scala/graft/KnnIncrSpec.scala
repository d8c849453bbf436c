package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger
import graft.vector.KnnIncr

/** Laws of CDF-maintained ANN-index maintenance (KnnIncr): the index
  * refreshed feed-sized from the ledger change feed must serve EXACTLY
  * what a from-scratch re-index of the head would — splits an insert
  * forces, merges a delete drains, update pre-image retraction — with
  * freshness guaranteed by the version-stamped memo, not by caller
  * discipline. Runs at TRIE scale (n > 2000, the adaptive dial with
  * real leaf splits), which the sf0.01 oracle gate (flat dial) cannot
  * reach. */
class KnnIncrSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: ids [lo, hi), 64-dim uniform. */
  private def vectors(lo: Long, hi: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (lo until hi).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "v")
  }

  /** CLUSTERED insert batch: one shared direction + small noise, so the
    * batch lands in a handful of LSH cells and pushes them past the
    * split cap — uniform vectors spread ~evenly and never split. */
  private def clustered(lo: Long, hi: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val center = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    (lo until hi).map { i =>
      (i, center.map(c => c * 0.9 + (rnd.nextDouble() * 2 - 1) * 0.1))
    }.toDF("vec_id", "v")
  }

  /** v0 = 4000 vectors; v1 inserts 1500 more; v2 rescales 300 existing
    * (updates); v3 deletes every 7th (deletion vectors). */
  private def commitLineage(table: String,
      tickAfterEach: Boolean): KnnIncr.Index = {
    Ledger.create(spark, table, vectors(0L, 4000L, seed = 7L), "vec_id")
    var idx = KnnIncr.maintainedIndex(spark, table) // bootstrap at v0
    assert(idx.dial.p0 < idx.dial.maxD, "this scale must engage the trie dial")
    Ledger.merge(spark, table, 0, clustered(4000L, 5500L, seed = 11L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    if (tickAfterEach) idx = KnnIncr.maintainedIndex(spark, table)
    Ledger.merge(spark, table, 1, vectors(0L, 4000L, seed = 7L)
      .filter(col("vec_id") % 13 === 0)
      .select(col("vec_id"), lit("upsert").as("op"),
        transform(col("v"), x => -x).as("v")), "vec_id")
    if (tickAfterEach) idx = KnnIncr.maintainedIndex(spark, table)
    Ledger.deleteWhere(spark, table, 2, "vec_id", col("vec_id") % 7 === 0)
    KnnIncr.maintainedIndex(spark, table)
  }

  private def resultRows(idx: KnnIncr.Index): Seq[(Long, Long, Long, Double)] =
    KnnIncr.knnJoinIndexed(spark, idx, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  private def histRows(idx: KnnIncr.Index): Set[(Long, Long)] =
    idx.hist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintained index == rebuilt index through inserts, updates, and DV deletes") {
    val table = Ledger.tableRoot("knn_incr_spec_a")
    val idx = commitLineage(table, tickAfterEach = true)
    val rebuilt = KnnIncr.rebuiltIndex(spark, table, idx.dial)
    // the maintained histogram IS the head's histogram (splits/merges
    // derive from it, so this is the structural half of the law)
    assert(histRows(idx) == histRows(rebuilt))
    // and the served kNN join is byte-identical to the re-index's
    assert(resultRows(idx) == resultRows(rebuilt))
    // the lineage actually exercised growth: the head is bigger than
    // the bootstrap corpus and some cell split past the base depth
    assert(idx.rows.count() == 4000 + 1500 - (5500 + 6) / 7)
    val depths = idx.hist // occupancy at base depth must exceed cap somewhere
      .groupBy(col("full").bitwiseAND(lit((1L << idx.dial.p0) - 1)))
      .agg(sum(col("c")).as("o"))
      .filter(col("o") > graft.vector.VectorOps.KnnCapOcc)
    assert(depths.count() > 0, "no leaf ever split — the trie path was not exercised")
  }

  test("merge-then-query is fresh without release(): the version stamp invalidates") {
    val table = Ledger.tableRoot("knn_incr_spec_fresh")
    Ledger.create(spark, table, vectors(0L, 4000L, seed = 7L), "vec_id")
    val idx0 = KnnIncr.maintainedIndex(spark, table)
    assert(idx0.rows.count() == 4000)
    Ledger.merge(spark, table, 0, vectors(4000L, 4200L, seed = 19L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    // NO StandingState.release(): the bumped table version alone must
    // refresh the artifact — a stale index here is the silent-wrong-
    // results bug the versioned memo exists to make impossible
    val idx1 = KnnIncr.maintainedIndex(spark, table)
    assert(idx1.rows.count() == 4200)
    assert(histRows(idx1) == histRows(KnnIncr.rebuiltIndex(spark, table, idx1.dial)))
    // same head, same stamp: the artifact is served memoized, not rebuilt
    assert(KnnIncr.maintainedIndex(spark, table) eq idx1)
  }

  test("epoch boundary: growth past 2^KnnMaxExtra x bootstrap triggers the declared re-index") {
    val table = Ledger.tableRoot("knn_incr_epoch")
    Ledger.create(spark, table, vectors(0L, 50L, seed = 3L), "vec_id")
    val idx0 = KnnIncr.maintainedIndex(spark, table)
    assert(idx0.dial == KnnIncr.Dial(4, 4) && idx0.n0 == 50)
    // below the boundary: the dial is a CREATION parameter — growth
    // within the split budget must NOT silently re-dial
    Ledger.merge(spark, table, 0, vectors(50L, 2050L, seed = 5L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    val idx1 = KnnIncr.maintainedIndex(spark, table)
    assert(idx1.dial == idx0.dial && idx1.n0 == 50)
    // past it (mass 12800 = 50 << 8): the declared epoch re-index fires
    Ledger.merge(spark, table, 1, vectors(2050L, 12800L, seed = 9L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    val idx2 = KnnIncr.maintainedIndex(spark, table)
    assert(idx2.n0 == 12800L, "epoch re-index must re-bootstrap (fresh n0)")
    assert(idx2.dial != idx0.dial, "fresh dial derived from the grown corpus")
    assert(histRows(idx2) == histRows(KnnIncr.rebuiltIndex(spark, table, idx2.dial)))
  }

  test("vacuum safety: a refresh anchored at a vacuumed-away version re-bootstraps") {
    val table = Ledger.tableRoot("knn_incr_vacuum")
    Ledger.create(spark, table, vectors(0L, 300L, seed = 13L), "vec_id")
    assert(KnnIncr.maintainedIndex(spark, table).n0 == 300) // stamped at v0
    Ledger.merge(spark, table, 0, vectors(300L, 340L, seed = 17L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    Ledger.merge(spark, table, 1, vectors(340L, 380L, seed = 23L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    Ledger.vacuum(spark, table, keepFrom = 2) // v0/v1 manifests are gone
    // the stamped anchor (v0) no longer exists: the refresh must NOT
    // try to read the 0→2 feed — it re-bootstraps from the head
    val idx = KnnIncr.maintainedIndex(spark, table)
    assert(idx.n0 == 380, "must have re-bootstrapped from the head")
    assert(histRows(idx) == histRows(KnnIncr.rebuiltIndex(spark, table, idx.dial)))
  }

  test("streamed maintenance == batch maintenance, byte for byte") {
    val a = Ledger.tableRoot("knn_incr_stream")
    val b = Ledger.tableRoot("knn_incr_stream_twin")
    for (t <- Seq(a, b)) {
      Ledger.create(spark, t, vectors(0L, 2500L, seed = 7L), "vec_id")
      Ledger.merge(spark, t, 0, clustered(2500L, 3000L, seed = 11L)
        .select(col("vec_id"), lit("upsert").as("op"), col("v")), "vec_id")
    }
    Ledger.stageChanges(spark, a, "vec_id")
    val q = KnnIncr.maintainStream(spark, a,
      java.nio.file.Files.createTempDirectory("knn_incr_stream_ckpt")
        .toString) // bootstrap covers v0+v1
    try {
      for (t <- Seq(a, b)) {
        Ledger.merge(spark, t, 1, vectors(0L, 2500L, seed = 7L)
          .filter(col("vec_id") % 13 === 0)
          .select(col("vec_id"), lit("upsert").as("op"),
            transform(col("v"), x => -x).as("v")), "vec_id")
        Ledger.deleteWhere(spark, t, 2, "vec_id", col("vec_id") % 7 === 0)
      }
      Ledger.stageChanges(spark, a, "vec_id")
      q.processAllAvailable()
    } finally q.stop()
    // prove the STREAM maintained a's artifact: vacuum away all pre-head
    // versions — a memo lagging behind the head (stream didn't apply)
    // would be forced to re-bootstrap here and change n0; a current
    // stamp is a memo HIT that never touches the table
    Ledger.vacuum(spark, a, keepFrom = 3)
    val idxA = KnnIncr.maintainedIndex(spark, a)
    assert(idxA.n0 == 3000, "stream must have maintained the artifact to the head")
    val idxB = KnnIncr.maintainedIndex(spark, b) // batch path over the twin lineage
    assert(histRows(idxA) == histRows(idxB))
    assert(resultRows(idxA) == resultRows(idxB))
  }

  test("a stream batch carrying versions a concurrent batch refresh already applied is a no-op") {
    // The r11 ADVICE regression shape: the stream is subscribed with
    // floor = v0, a BATCH-path maintainedIndex refresh then applies
    // v1+v2 (stamp → 2), and a micro-batch carrying v1's images (above
    // the floor, at/below the stamp) arrives late. Folding it would
    // retract the keys' CURRENT (v2) codes and re-add their v1 values —
    // regressed neighbors served silently. The stamp-filtered fold must
    // leave the artifact untouched.
    val table = Ledger.tableRoot("knn_incr_stale_replay")
    Ledger.create(spark, table, vectors(0L, 300L, seed = 29L), "vec_id")
    KnnIncr.maintainedIndex(spark, table) // bootstrap at v0 (the stream's floor)
    Ledger.merge(spark, table, 0, vectors(0L, 300L, seed = 29L)
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), lit("upsert").as("op"),
        transform(col("v"), x => x * 2).as("v")), "vec_id")
    Ledger.merge(spark, table, 1, vectors(0L, 300L, seed = 29L)
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), lit("upsert").as("op"),
        reverse(col("v")).as("v")), "vec_id")
    val idx2 = KnnIncr.maintainedIndex(spark, table) // batch refresh → stamp 2
    // fabricate the late micro-batch: v1's change images, stream-shaped
    val staleBatch = Ledger.readChangesFull(spark, table, 0, 1, "vec_id")
      .withColumn("commit_version", lit(1))
    val hwm = KnnIncr.applyStreamBatch(spark, table, staleBatch, floor = 0L, hwm = 0L)
    assert(hwm == 1L)
    // untouched: same artifact object served, and it still equals the
    // from-scratch head rebuild (a regressed fold would break both)
    assert(KnnIncr.maintainedIndex(spark, table) eq idx2)
    assert(histRows(idx2) == histRows(KnnIncr.rebuiltIndex(spark, table, idx2.dial)))
    assert(resultRows(idx2) == resultRows(KnnIncr.rebuiltIndex(spark, table, idx2.dial)))
  }

  test("advanceTo refuses stale and equal stamps, accepts newer ones") {
    val m = graft.StandingState.versionedMemo[String, String]()
    assert(m.advanceTo("k", 5L, "a5")) // empty → put
    assert(!m.advanceTo("k", 4L, "a4")) // regression refused
    assert(!m.advanceTo("k", 5L, "a5'")) // equal-stamp overwrite refused
    assert(m.peek("k").contains((5L, "a5")))
    assert(m.advanceTo("k", 6L, "a6"))
    assert(m.peek("k").contains((6L, "a6")))
  }

  test("advanceOrReplace accepts equal-stamp replacement, still refuses regression") {
    val m = graft.StandingState.versionedMemo[String, String]()
    assert(m.advanceOrReplace("k", 5L, "a5")) // empty → put
    assert(m.advanceOrReplace("k", 5L, "a5+")) // equal stamp REPLACES (the healed split)
    assert(m.peek("k").contains((5L, "a5+")))
    assert(!m.advanceOrReplace("k", 4L, "a4")) // regression refused
    assert(m.peek("k").contains((5L, "a5+")))
    assert(m.advanceOrReplace("k", 6L, "a6"))
    assert(m.peek("k").contains((6L, "a6")))
  }

  test("split-version delivery: rows at the stamp re-admit and heal the artifact") {
    // one commit's files can split across adjacent micro-batches (a
    // file-count trigger limit, a store without atomic staging rename):
    // part 1 folds and stamps v1; part 2 arrives in the NEXT batch still
    // marked commit_version 1. The r12 fold filtered strictly above the
    // stamp — part 2 was dropped permanently (silent index drift, the
    // r12 ADVICE medium). The re-admitting fold must apply it, and
    // re-applying part 1's keys must net to a no-op (the artifact
    // already holds v1's values for them).
    val table = Ledger.tableRoot("knn_incr_split_version")
    Ledger.create(spark, table, vectors(0L, 300L, seed = 31L), "vec_id")
    KnnIncr.maintainedIndex(spark, table) // bootstrap at v0 (the stream's floor)
    Ledger.merge(spark, table, 0, vectors(0L, 300L, seed = 31L)
      .filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), lit("upsert").as("op"),
        transform(col("v"), x => -x).as("v")), "vec_id")
    // the STAGED-feed shape the stream actually delivers (single
    // post-image rows — readChanges, not the pre-image CDF)
    val v1 = Ledger.readChanges(spark, table, 0, 1, "vec_id")
      .withColumn("commit_version", lit(1))
    var hwm = KnnIncr.applyStreamBatch(spark, table,
      v1.filter(col("vec_id") % 2 === 0), floor = 0L, hwm = 0L)
    assert(hwm == 1L)
    // stamped 1 but holding only part 1 — provably drifted mid-split
    val half = KnnIncr.maintainedIndex(spark, table)
    assert(histRows(half) != histRows(KnnIncr.rebuiltIndex(spark, table, half.dial)),
      "fixture must actually split the version across batches")
    // part 2, same commit_version: the equal-stamp fold heals it
    hwm = KnnIncr.applyStreamBatch(spark, table,
      v1.filter(col("vec_id") % 2 === 1), floor = 0L, hwm = hwm)
    assert(hwm == 1L)
    val idx = KnnIncr.maintainedIndex(spark, table)
    assert(histRows(idx) == histRows(KnnIncr.rebuiltIndex(spark, table, idx.dial)))
    assert(resultRows(idx) == resultRows(KnnIncr.rebuiltIndex(spark, table, idx.dial)))
  }

  test("refresh granularity is irrelevant: per-version ticks == one spanning refresh") {
    val a = Ledger.tableRoot("knn_incr_spec_tick")
    val b = Ledger.tableRoot("knn_incr_spec_span")
    val ticked = commitLineage(a, tickAfterEach = true)
    val spanned = commitLineage(b, tickAfterEach = false) // one 0→3 net refresh
    assert(ticked.dial == spanned.dial)
    assert(histRows(ticked) == histRows(spanned))
    assert(resultRows(ticked) == resultRows(spanned))
  }
}
