package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger

/** Laws of incremental bin-pack compaction: logical content identical,
  * right-sized files carried BY REFERENCE (paths preserved — zero data
  * I/O for them), deletion-vector keys released exactly for the packed
  * files' rows (hidden rows physically applied, carried-file keys stay
  * hidden), and a no-op input writes NO version. */
class LedgerBinPackSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def rows(ks: Range) = ks.map(i => (i.toLong, s"body $i")).toDF("k", "text")

  private def ins(ks: Range) = rows(ks)
    .select(col("k"), lit("upsert").as("op"), col("text"))

  /** v0: one 100-row file; v1/v2: two insert-only merges that each land
    * a fresh 10-row file at the append frontier. */
  private def mkFrontier(name: String): String = {
    val t = Ledger.tableRoot(name)
    Ledger.create(spark, t, rows(0 until 100), "k", nFiles = 1)
    Ledger.merge(spark, t, 0, ins(100 until 110), "k")
    Ledger.merge(spark, t, 1, ins(110 until 120), "k")
    t
  }

  private def paths(t: String, v: Int): Set[String] =
    Ledger.manifest(spark, t, v).select("path").collect().map(_.getString(0)).toSet

  test("packs only the small files; big files carry by reference") {
    val t = mkFrontier("binpack_basic")
    val before = Ledger.readVersion(spark, t, 2).orderBy("k").collect()
    val bigFiles = Ledger.manifest(spark, t, 2)
      .filter(col("rows") >= 50).select("path").collect().map(_.getString(0)).toSet
    assert(bigFiles.size == 1)
    val packed = Ledger.compactBinPack(spark, t, 2, "k", targetRows = 50)
    assert(packed == 2) // the two 10-row frontier files
    assert(Ledger.latestVersion(spark, t) == 3)
    val after = paths(t, 3)
    assert(bigFiles.subsetOf(after), "right-sized file must carry by reference")
    assert(after.size == 2) // big file + one packed file
    assert(Ledger.readVersion(spark, t, 3).orderBy("k").collect().toSeq
      == before.toSeq)
  }

  test("no-op when fewer than minInputFiles qualify: no version written") {
    val t = mkFrontier("binpack_noop")
    Ledger.compactBinPack(spark, t, 2, "k", targetRows = 50)
    // everything is right-sized now: a second pass has nothing to do
    assert(Ledger.compactBinPack(spark, t, 3, "k", targetRows = 50) == 0)
    assert(Ledger.latestVersion(spark, t) == 3)
  }

  test("deletion vector: packed-file keys applied + released, carried keys stay") {
    val t = mkFrontier("binpack_dv")
    // hide one key in a small file (105) and one in the big file (42)
    Ledger.deleteWhere(spark, t, 2, "k", col("k") === 105 || col("k") === 42)
    val before = Ledger.readVersion(spark, t, 3).orderBy("k").collect()
    assert(before.length == 118)
    Ledger.compactBinPack(spark, t, 3, "k", targetRows = 50)
    val after = Ledger.readVersion(spark, t, 4).orderBy("k").collect()
    assert(after.toSeq == before.toSeq) // both rows still hidden
    // the successor vector holds exactly the carried file's key
    val dv = Ledger.deletionVector(spark, t, 4).get.collect().map(_.getLong(0)).toSet
    assert(dv == Set(42L))
  }

  test("live-row selection: a physically right-sized file whose live count is small gets packed") {
    val t = mkFrontier("binpack_live")
    // gut the 100-row base file: physical 100 >= 50 but live 30 < 50 —
    // the manifest's physical count alone would never select it
    Ledger.deleteWhere(spark, t, 2, "k", col("k") < 70)
    val before = Ledger.readVersion(spark, t, 3).orderBy("k").collect()
    assert(before.length == 50)
    val packed = Ledger.compactBinPack(spark, t, 3, "k", targetRows = 50)
    assert(packed == 3, "the DV-gutted base file is live-small and must pack")
    val after = Ledger.readVersion(spark, t, 4).orderBy("k").collect()
    assert(after.toSeq == before.toSeq)
    // every hidden key lived in a packed file => fully released
    assert(Ledger.deletionVector(spark, t, 4).forall(_.isEmpty))
  }

  test("z-aware bin-pack keeps narrow both-dim stats; pruned reads stay pruned") {
    import graft.ops.ZOrder
    def d2of(k: Long): Long = (k * 7919L) % 200L
    def zrows(ks: Range) = ks.map(i => (i.toLong, d2of(i), s"p $i"))
      .toDF("k", "d2", "text")
    def zins(ks: Range) = zrows(ks)
      .select(col("k"), lit("upsert").as("op"), col("d2"), col("text"))
    val z = ZOrder.interleave2(
      ZOrder.quantize(col("k"), 0L, 199L, ZOrder.Bits),
      ZOrder.quantize(col("d2"), 0L, 199L, ZOrder.Bits), ZOrder.Bits)
    // v0: z-ordered base with d2 manifest stats; v1..v4: four insert
    // merges, each landing one 8-row frontier file
    def mk(name: String): String = {
      val t = Ledger.tableRoot(name)
      Ledger.create(spark, t, zrows(0 until 200), "k", nFiles = 4,
        clusterBy = Some(z), statCols = Seq("d2"))
      (0 until 4).foreach { b =>
        Ledger.merge(spark, t, b, zins((200 + 8 * b) until (208 + 8 * b)), "k")
      }
      t
    }
    def packedWidths(t: String): Array[Long] = {
      val old = Ledger.manifest(spark, t, 4).select("path")
        .collect().map(_.getString(0)).toSet
      Ledger.manifest(spark, t, 5).filter(!col("path").isInCollection(old.toSeq))
        .select(col("max_d2") - col("min_d2")).collect().map(_.getLong(0))
    }
    val tk = mk("binpack_z_key") // old behavior: frontier repacked in key order
    assert(Ledger.compactBinPack(spark, tk, 4, "k", targetRows = 10) == 4)
    val tz = mk("binpack_z_aware")
    val before = Ledger.readVersion(spark, tz, 4).orderBy("k").collect()
    assert(Ledger.compactBinPack(spark, tz, 4, "k", targetRows = 10,
      clusterBy = Some(z)) == 4)
    assert(Ledger.readVersion(spark, tz, 5).orderBy("k").collect().toSeq
      == before.toSeq)
    // the z pack's secondary-dim ranges stay narrow; key-order packing
    // of the same frontier smears d2 across the domain
    assert(packedWidths(tz).max < packedWidths(tk).max,
      s"z widths ${packedWidths(tz).toSeq} vs key widths ${packedWidths(tk).toSeq}")
    // and the secondary-dim pruned read path still prunes AND is exact
    val pruned = Ledger.pruneFilesBy(spark, tz, 5, "d2", 0L, 30L)
    assert(pruned.length < Ledger.manifest(spark, tz, 5).count())
    val got = Ledger.readWhereRange(spark, tz, 5, "d2", 0L, 30L)
      .orderBy("k").collect()
    val want = Ledger.readVersion(spark, tz, 5)
      .filter(col("d2").between(0L, 30L)).orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("bins split at targetRows and stats stay exact") {
    val t = Ledger.tableRoot("binpack_bins")
    Ledger.create(spark, t, rows(0 until 200), "k", nFiles = 8) // 25 rows each
    val packed = Ledger.compactBinPack(spark, t, 0, "k", targetRows = 60)
    assert(packed == 8)
    val m = Ledger.manifest(spark, t, 1).orderBy("min_key")
      .collect().map(r => (r.getAs[Long]("min_key"), r.getAs[Long]("max_key"),
        r.getAs[Long]("rows")))
    assert(m.map(_._3).sum == 200)
    assert(m.length == 4) // ceil(200/60)
    // key-ranged bins: disjoint, ordered, stats exact
    assert(m.sliding(2).forall { case Array(a, b) => a._2 < b._1; case _ => true })
  }
}
