package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape pins for the CDC merge, cleaning, and 2-hop
  * graph operators (their oracle rows are checked by the gate; these
  * assert the invariants the hash can't see). */
class CdcCleaningSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  import spark.implicits._

  test("merge-upsert applies deletes, updates, and inserts exactly") {
    val merged = graft.ops.Cdc.qMergeUpsert(spark, sf).cache()
    val orders = Tables.orders(spark, sf).cache()
    val n = orders.count()
    // deleted keys (≡0 mod 10) are gone
    assert(merged.filter($"o_orderkey" % 10 === 0).count() === 0)
    // inserted keys (≡2) are all present and tagged I
    val nIns = orders.filter($"o_orderkey" % 10 === 2).count()
    assert(merged.filter($"op" === "I").count() === nIns)
    // updated rows carry exactly the 10% uplift vs the source price
    val upd = merged.filter($"op" === "U")
      .join(orders, Seq("o_orderkey"))
      .withColumn("expect", round($"o_totalprice" * 1.1, 4))
      .filter(abs($"price" - $"expect") > 1e-6)
    assert(upd.count() === 0)
    // untouched keys keep their original price bit-for-bit
    val kept = merged.filter($"op" === "K")
      .join(orders, Seq("o_orderkey"))
      .filter($"price" =!= round($"o_totalprice", 2))
    assert(kept.count() === 0)
    // final row count: all keys minus deleted ones, each exactly once
    val nDel = orders.filter($"o_orderkey" % 10 === 0).count()
    assert(merged.count() === n - nDel)
    assert(merged.select($"o_orderkey").distinct().count() === merged.count())
    merged.unpersist(); orders.unpersist()
  }

  test("merge-upsert plans a single shuffle on the key") {
    val plan = graft.ops.Cdc.qMergeUpsert(spark, sf)
      .queryExecution.executedPlan.toString
    // one Exchange for the window (plus the final orderBy's range
    // exchange) — the union itself must not introduce extra shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("impute leaves no missing values and fills with the last prior observation") {
    val out = graft.ops.Cleaning.qImpute(spark, sf).cache()
    assert(out.filter($"value_filled".isNull).count() === 0)
    val events = Tables.events(spark, sf)
    assert(out.count() === events.count())
    // was_missing marks exactly the synthesized-gap rows
    assert(out.filter($"was_missing" === 1).count() ===
      events.filter($"event_id" % 7 === 0).count())
    // spot-check: a masked row inherits the previous non-masked value
    // of the same user in (ts, event_id) order
    val one = out.filter($"was_missing" === 1).orderBy($"user_id", $"event_id").limit(1)
      .collect().headOption
    one.foreach { r =>
      val uid = r.getLong(0); val eid = r.getLong(1)
      val ev = events.filter($"user_id" === uid)
        .select($"event_id", $"ts", $"value").orderBy($"ts", $"event_id").collect()
      val idx = ev.indexWhere(_.getLong(0) == eid)
      val prior = ev.take(idx).reverse.find(_.getLong(0) % 7 != 0)
      prior.foreach { p =>
        val expect = BigDecimal(p.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        assert(math.abs(r.getDouble(4) - expect.toDouble) < 1e-9)
      }
    }
    out.unpersist()
  }

  test("outlier rows violate their fences; non-flagged rows don't") {
    val out = graft.ops.Cleaning.qOutliers(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter($"value" >= $"lo" && $"value" <= $"hi").count() === 0)
    // the fences pass is a broadcast join — the event stream must not shuffle
    val plan = graft.ops.Cleaning.qOutliers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    out.unpersist()
  }

  test("incremental aggregate merge equals the full recompute") {
    val merged = graft.ops.Cdc.qIncrAgg(spark, sf)
    val full = Tables.events(spark, sf)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Exact.dsum($"value").as("sum_value"))
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("d"), $"n", $"sum_value")
    // bit-identical: the algebraic merge of base+delta partials must be
    // indistinguishable from scanning everything
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("leakage split assigns every near-dup cluster to exactly one split") {
    val s = graft.dedup.Dedup.qLeakageSplit(spark, sf).cache()
    // per cluster representative: one distinct split value
    val perCluster = s.groupBy($"rep").agg(countDistinct($"split").as("k"))
    assert(perCluster.filter($"k" > 1).count() === 0)
    // all three splits exist and cover every document
    assert(s.count() === Tables.documents(spark, sf).count())
    assert(s.select($"split").distinct().count() === 3)
    s.unpersist()
  }

  test("peak concurrency is attained at the reported instant") {
    val out = graft.ops.EventAnalytics.qConcurrency(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter($"peak" < 1).count() === 0)
    // independent driver-side sweep over the raw intervals (fine at
    // sf0.001): per day, the max open-interval count over all boundary
    // instants must equal the reported peak
    val iv = Tables.events(spark, sf)
      .select($"ts", ($"ts" + expr("INTERVAL 10 MINUTES")).as("te"))
      .select(expr("unix_micros(cast(ts as timestamp))").as("s"),
        expr("unix_micros(cast(te as timestamp))").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dayMs = 86400000000L // one UTC day in microseconds
    val pts = iv.flatMap { case (s, x) =>
      // split at UTC day boundaries like the operator does
      (s / dayMs to (x - 1) / dayMs).flatMap { d =>
        val lo = math.max(s, d * dayMs); val hi = math.min(x, (d + 1) * dayMs)
        Seq((d, lo, +1), (d, hi, -1))
      }
    }
    val brute = pts.groupBy(_._1).map { case (d, ps) =>
      var run = 0L; var mx = 0L
      // closes before opens at the same instant
      ps.sortBy(p => (p._2, p._3)).foreach { p => run += p._3; mx = math.max(mx, run) }
      d -> mx
    }
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    out.collect().foreach { r =>
      val d = fmt.parse(r.getString(0)).getTime * 1000L / dayMs
      assert(brute(d) === r.getLong(1), s"day ${r.getString(0)}")
    }
    out.unpersist()
  }

  test("feature hashing emits bounded sparse bins with signed counts") {
    val out = graft.text.TrainPrep.qFeatureHash(spark, sf).cache()
    assert(out.filter($"bin" < 0 || $"bin" >= 64).count() === 0)
    assert(out.filter($"val" === 0).count() === 0)
    // sparse width bounded by the bin count regardless of doc length
    assert(out.groupBy($"doc_id").count().filter($"count" > 64).count() === 0)
    // sign-cancellation preserves the global signed total: summing the
    // per-bin values equals summing per-token signs directly
    val direct = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .select(md5(concat(lit("fh:"), $"w")).as("h"))
      .select(when(conv(substring($"h", 16, 1), 16, 10).cast("long") % 2 === 0, 1L)
        .otherwise(-1L).as("sgn"))
      .agg(sum($"sgn")).head.getLong(0)
    val binned = out.agg(sum($"val")).head.getLong(0)
    assert(binned === direct)
    out.unpersist()
  }

  test("2-hop neighbors are reachable in two edges and never direct") {
    val m = graft.vector.VectorOps.qKhop(spark, sf).cache()
    assert(m.count() > 0)
    // strictness is structural (left-anti against direct edges); pin a
    // consistency invariant instead of recomputing the graph: degree
    // is bounded by k (mutuality caps it) and counts are positive
    assert(m.filter($"n_2hop" <= 0).count() === 0)
    assert(m.filter($"deg" > 3).count() === 0)
    m.unpersist()
  }
}
