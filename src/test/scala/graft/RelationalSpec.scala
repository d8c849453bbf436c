package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("q1 pricing: 6 (returnflag, linestatus) groups, counts add up") {
    val rows = Relational.q1Pricing(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-08-06").cast("timestamp")).count()
    assert(total == expected)
  }

  test("aggregation is deterministic across partitionings (exact decimal)") {
    val a = Relational.q1Pricing(spark, sf).collect().map(_.getAs[Double]("sum_charge"))
    val li = Tables.lineitem(spark, sf).repartition(7)
    li.createOrReplaceTempView("li_repart")
    // same aggregate over a different partitioning must be bit-identical
    val b = Relational.q1Pricing(spark, sf).collect().map(_.getAs[Double]("sum_charge"))
    assert(a.toSeq == b.toSeq)
  }

  test("semi + anti partition the customer set") {
    val c = Tables.customer(spark, sf).count()
    val semi = Relational.qJoinSemi(spark, sf).agg(sum("n_customers")).head.getLong(0)
    val anti = Relational.qJoinAnti(spark, sf).count()
    // semi uses >100k filter; anti uses >400k — not complements, just sane bounds
    assert(semi <= c && anti <= c && semi > 0 && anti > 0)
  }

  test("rollup contains grand total row equal to lineitem count") {
    val rows = Relational.qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("returnflag") == "(all)"
      && r.getAs[String]("linestatus") == "(all)")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_items") == Tables.lineitem(spark, sf).count())
  }

  test("grouped top-k emits at most k rows per group, rank within bound") {
    val rows = Relational.qTopkGroup(spark, sf).collect()
    val perGroup = rows.groupBy(_.getAs[String]("l_returnflag"))
    assert(perGroup.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Long]("rn") <= 3))
  }

  test("setops: |union_all| = |y96| + |y97|, |intersect| + |except| = |distinct y96|") {
    val m = Relational.qSetops(spark, sf).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Long]("n")).toMap
    val o = Tables.orders(spark, sf)
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    assert(m("union_all") == y96.count() + y97.count())
    assert(m("intersect") + m("except") == y96.distinct().count())
  }

  test("hll audit: exact side true, estimate within the m=128 error regime") {
    val rows = Relational.qHllAudit(spark, sf).collect()
    assert(rows.length == 6) // 3 flags x {order, part}
    val li = Tables.lineitem(spark, sf)
    val truth = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("p"), r.getAs[Long]("o"))).toMap
    rows.foreach { r =>
      val (p, o) = truth(r.getAs[String]("flag"))
      val expected = if (r.getAs[String]("col_name") == "part") p else o
      assert(r.getAs[Long]("n_exact") == expected)
      // raw estimator at m=128: 9.2% SE asymptotically, biased high below
      // 2.5m distinct — 30% covers the sf0.001 part column's raw regime
      assert(r.getAs[Long]("err_ppm") < 300000L,
        s"estimate off by ${r.getAs[Long]("err_ppm")} ppm: $r")
    }
  }

  test("approx distinct within 5% of exact") {
    val exact = Relational.qAggDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_supp")).toMap
    val approx = Relational.approxDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_supp_approx")).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) <= math.max(1L, (v * 0.05).toLong), s"flag $k")
    }
  }
}
