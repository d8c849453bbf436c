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
