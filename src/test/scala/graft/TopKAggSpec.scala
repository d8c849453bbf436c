package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class TopKAggSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("bounded-heap top-k == window row_number top-k, row for row") {
    val viaWindow = Relational.qTopkGroup(spark, sf).collect().map(_.toSeq)
    val viaAgg = Relational.qTopkAgg(spark, sf).collect().map(_.toSeq)
    // same columns, possibly different order within row — align by name
    val wCols = Relational.qTopkGroup(spark, sf).columns
    val aCols = Relational.qTopkAgg(spark, sf).columns
    def norm(rows: Array[Seq[Any]], cols: Array[String]) =
      rows.map(r => cols.zip(r).toMap).map(m => cols.sorted.toSeq.map(m)).toSeq
    assert(norm(viaAgg, aCols) == norm(viaWindow, wCols))
  }

  test("native imperative buffer == typed Aggregator on random streams with ties") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 50) {
      val entries = Seq.fill(200)(graft.functions.TopKAgg.Entry(
        rnd.nextInt(20).toDouble, rnd.nextInt(30).toLong, rnd.nextInt(5)))
      val agg = new graft.functions.TopKAgg.TopK(3)
      val viaAggregator = entries.foldLeft(agg.zero)(agg.reduce)
      val buf = new graft.functions.TopKBuf(3)
      entries.foreach(e => buf.insert(e.sortKey, e.id1, e.id2))
      val viaNative = (0 until buf.size).map(i =>
        graft.functions.TopKAgg.Entry(buf.keys(i), buf.id1s(i), buf.id2s(i)))
      assert(viaNative == viaAggregator, s"trial $trial diverged")
      // split-merge parity (partial aggregation path)
      val (l, r) = entries.splitAt(97)
      val b1 = new graft.functions.TopKBuf(3); l.foreach(e => b1.insert(e.sortKey, e.id1, e.id2))
      val b2 = new graft.functions.TopKBuf(3); r.foreach(e => b2.insert(e.sortKey, e.id1, e.id2))
      val m = graft.functions.TopKNativeAgg(3, null, null, null).merge(b1, b2)
      val viaMerge = (0 until m.size).map(i =>
        graft.functions.TopKAgg.Entry(m.keys(i), m.id1s(i), m.id2s(i)))
      assert(viaMerge == viaAggregator, s"trial $trial merge diverged")
    }
  }

  test("buffer stays bounded at k under adversarial merge order") {
    val agg = new graft.functions.TopKAgg.TopK(3)
    val entries = (1 to 100).map(i => graft.functions.TopKAgg.Entry(i.toDouble, i, i))
    val half1 = entries.take(50).foldLeft(agg.zero)(agg.reduce)
    val half2 = entries.drop(50).foldLeft(agg.zero)(agg.reduce)
    assert(half1.size == 3 && half2.size == 3)
    val merged = agg.merge(half1, half2)
    assert(merged.map(_.sortKey) == Seq(100.0, 99.0, 98.0))
    assert(agg.merge(half2, half1) == merged) // merge is order-insensitive
  }
}
