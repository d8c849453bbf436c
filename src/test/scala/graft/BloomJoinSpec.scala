package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.BloomJoin
import graft.functions.Blooms

class BloomJoinSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("bloom prune: no false negatives, real reduction, exact result") {
    val bf = BloomJoin.builtOrderkeyBloom(spark, sf)
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val total = li.count()
    val kept = li.filter(Blooms.mightContainLong(col("l_orderkey"), bf)).count()
    // reduction: the dim predicate keeps ~5% of orders, so the pruned
    // fact side must be a small fraction (fpp 1% adds at most ~1 point)
    assert(kept < total / 5, s"bloom kept $kept of $total fact rows — no reduction")
    // no false negatives: every truly matching fact key passes the bloom
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .select(col("o_orderkey"))
    val missed = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .filter(!Blooms.mightContainLong(col("l_orderkey"), bf))
      .count()
    assert(missed == 0L, s"$missed matching fact rows dropped by the bloom")
  }

  test("q_bloom_join equals the unpruned exact join") {
    val pruned = BloomJoin.qBloomJoin(spark, sf).collect().toSeq
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Exact.decToDouble(sum(graft.ops.Exact.revenue(
          col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("order_month"))
      .collect().toSeq
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("bloom probe sits under the join: prune before the exchange, codegen'd") {
    val df = BloomJoin.qBloomJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain_long")
    val joinAt = plan.indexOf("SortMergeJoin")
    assert(probeAt >= 0, s"bloom probe missing from the plan:\n$plan")
    assert(joinAt >= 0, s"merge-hinted join missing (broadcast would hide the exchange):\n$plan")
    // the probe appears in the fact side's scan stage, printed BELOW
    // the join node it feeds — i.e. after it in the tree dump
    assert(probeAt > joinAt, s"bloom probe not on the join's input side:\n$plan")
    // and the filter stays inside whole-stage codegen (no UDF wall) —
    // the adaptive tree dump marks codegen stages with "*(n)"
    val probeLine = plan.split('\n').find(_.contains("bloom_might_contain_long")).get
    assert(probeLine.contains("*("), s"bloom probe outside codegen: $probeLine")
  }
}
