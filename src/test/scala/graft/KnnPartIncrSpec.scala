package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger
import graft.vector.{KnnIncr, KnnPart}

/** Laws of CDF-MAINTAINED partition-trie maintenance: the label-7
  * index refreshed feed-sized from the ledger change feed must equal a
  * from-scratch re-index of the head's label-7 slice — through
  * inserts, in-partition updates, DV deletes, AND cross-partition
  * MOVES in both directions (the retract-without-add / add-without-
  * retract cases only a partition index has). Runs at trie scale
  * (partition > 2000, real leaf splits), which the flat-dial oracle
  * gate cannot reach. */
class KnnPartIncrSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  /** Labeled deterministic corpus: ids [lo, hi), 64-dim uniform,
    * label = (id % 5) + 5 — five partitions of ~(hi-lo)/5 each. */
  private def vectors(lo: Long, hi: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (lo until hi).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1), (i % 5 + 5).toInt)
    }.toDF("vec_id", "v", "label")
  }

  /** CLUSTERED label-7 insert batch: one shared direction + small
    * noise — lands in a handful of LSH cells and pushes the PARTITION
    * trie past its split cap (uniform vectors spread and never split). */
  private def clustered(lo: Long, hi: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val center = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    (lo until hi).map { i =>
      (i, center.map(c => c * 0.9 + (rnd.nextDouble() * 2 - 1) * 0.1), 7)
    }.toDF("vec_id", "v", "label")
  }

  /** v0 = 10500 labeled rows (label 7 ≈ 2100 → trie dial); v1 inserts
    * 800 clustered label-7 rows (splits); v2 reverses 300 label-7 rows
    * (in-partition updates); v3 shifts every %19 row's label one up
    * (6→7 flows IN, 7→8 flows OUT); v4 deletes every 7th (DV). */
  private def lineage(table: String): KnnIncr.Index = {
    Ledger.create(spark, table, vectors(0L, 10500L, seed = 7L), "vec_id")
    val idx0 = KnnIncr.maintainedPartIndex(spark, table, 7)
    assert(idx0.dial.p0 < idx0.dial.maxD, "partition must engage the trie dial")
    assert(idx0.n0 == 2100)
    Ledger.merge(spark, table, 0, clustered(20000L, 20800L, seed = 11L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v"), col("label")), "vec_id")
    KnnIncr.maintainedPartIndex(spark, table, 7) // inserts
    Ledger.merge(spark, table, 1, vectors(0L, 10500L, seed = 7L)
      .filter(col("label") === 7 && col("vec_id") % 3 === 0)
      .select(col("vec_id"), lit("upsert").as("op"),
        reverse(col("v")).as("v"), col("label")), "vec_id")
    KnnIncr.maintainedPartIndex(spark, table, 7) // in-partition updates
    Ledger.merge(spark, table, 2, Ledger.readVersion(spark, table, 2)
      .filter(col("vec_id") % 19 === 0 && col("vec_id") < 20000L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v"),
        (col("label") + 1).as("label")), "vec_id")
    KnnIncr.maintainedPartIndex(spark, table, 7) // moves: 6→7 IN, 7→8 OUT
    Ledger.deleteWhere(spark, table, 3, "vec_id", col("vec_id") % 7 === 0)
    KnnIncr.maintainedPartIndex(spark, table, 7) // DV deletes
  }

  private def histRows(idx: KnnIncr.Index): Set[(Long, Long)] =
    idx.hist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def idRows(idx: KnnIncr.Index): Set[(Long, Long)] =
    idx.rows.select(col("vec_id"), col("full")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintained partition trie == rebuilt through inserts, updates, deletes, and MOVES") {
    val table = Ledger.tableRoot("knn_part_incr_spec")
    val idx = lineage(table)
    val rebuilt = KnnIncr.rebuiltPartIndex(spark, table, idx.dial, 7)
    assert(histRows(idx) == histRows(rebuilt))
    assert(idRows(idx) == idRows(rebuilt))
    // the moves actually happened and the index tracked BOTH directions:
    // a 6→7 key is IN the maintained index, a 7→8 key is OUT
    val ids = idRows(idx).map(_._1)
    val in6to7 = (0L until 10500L).find(i =>
      i % 5 + 5 == 6 && i % 19 == 0 && i % 7 != 0).get
    val out7to8 = (0L until 10500L).find(i =>
      i % 5 + 5 == 7 && i % 19 == 0 && i % 7 != 0).get
    assert(ids.contains(in6to7), s"moved-in key $in6to7 must be indexed")
    assert(!ids.contains(out7to8), s"moved-out key $out7to8 must be retracted")
    // growth exercised the trie: some cell split past the base depth
    val split = idx.hist
      .groupBy(col("full").bitwiseAND(lit((1L << idx.dial.p0) - 1)))
      .agg(sum(col("c")).as("o"))
      .filter(col("o") > graft.vector.VectorOps.KnnCapOcc)
    assert(split.count() > 0, "no leaf ever split — the trie path was not exercised")
  }

  test("serving from the maintained index == serving from a fresh rebuild") {
    val table = Ledger.tableRoot("knn_part_incr_serve")
    val idx = lineage(table)
    val got = KnnPart.knnFilteredPartMaintained(spark, table, 7, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // the independent twin: a from-scratch re-index of the head slice,
    // bucketed by the SAME shared keymap math, served through the same
    // probe + escalation tail
    val rebuilt = KnnIncr.rebuiltPartIndex(spark, table, idx.dial, 7)
    val (p0, maxD) = (idx.dial.p0, idx.dial.maxD)
    val partDf = rebuilt.rows
      .join(graft.vector.VectorOps.leafDepthsFromHist(rebuilt.hist, p0, maxD), Seq("full"))
      .withColumn("bucket", graft.vector.VectorOps.trieKeyExpr(p0, maxD))
      .select(col("bucket"), col("vec_id"), col("v"))
    val head = Ledger.latestVersion(spark, table)
    val qAll = Ledger.readVersion(spark, table, head)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probes = KnnPart.probeRelation(qAll,
      partDf.select(col("bucket").as("leaf_key")).distinct(), p0, maxD)
    val expect = KnnPart.serveFiltered(qAll, partDf, probes,
      qAll.count(), rebuilt.rows.count(), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("merge-then-query is fresh without release(): the version stamp invalidates") {
    val table = Ledger.tableRoot("knn_part_incr_fresh")
    Ledger.create(spark, table, vectors(0L, 10500L, seed = 13L), "vec_id")
    val idx0 = KnnIncr.maintainedPartIndex(spark, table, 7)
    assert(idx0.rows.count() == 2100)
    Ledger.merge(spark, table, 0, vectors(30000L, 30200L, seed = 19L)
      .select(col("vec_id"), lit("upsert").as("op"), col("v"),
        lit(7).as("label")), "vec_id")
    // NO release(): the bumped version alone must refresh the artifact
    val idx1 = KnnIncr.maintainedPartIndex(spark, table, 7)
    assert(idx1.rows.count() == 2300)
    assert(histRows(idx1) == histRows(KnnIncr.rebuiltPartIndex(spark, table, idx1.dial, 7)))
    // and the PARTITION memo is independent of the shared index's: the
    // same table's unpartitioned index still sees the whole corpus
    assert(KnnIncr.maintainedIndex(spark, table).rows.count() == 10700)
  }
}
