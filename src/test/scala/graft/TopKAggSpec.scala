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
