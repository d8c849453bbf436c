package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the governance/ingest batch: forget-cascade accounting,
  * k-anonymity guarantees, and ORC round-trip fidelity. */
class GovernanceSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("forget: per-table accounting closes and the cascade is exact") {
    val rows = graft.ops.Cdc.qForget(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    // deleted + kept == table size, per table
    val c = Tables.customer(spark, sf).count()
    val o = Tables.orders(spark, sf).count()
    val l = Tables.lineitem(spark, sf).count()
    assert(rows("customer")._1 + rows("customer")._2 == c)
    assert(rows("orders")._1 + rows("orders")._2 == o)
    assert(rows("lineitem")._1 + rows("lineitem")._2 == l)
    // cascade: deleted orders == orders owned by tombstoned customers
    val expectedODel = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 50 === 0).count()
    assert(rows("orders")._1 == expectedODel)
    // tombstone side rides a broadcast join
    val plan = graft.ops.Cdc.qForget(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "tombstones must broadcast, not shuffle the fact")
  }

  test("kanon: published cells meet k, generalized rows are starred") {
    val rows = graft.ops.Contracts.qKanon(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qi2, lvl, n, violates) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (lvl == 0) {
        assert(n >= 10 && violates == 0, "published cell below k")
        assert(qi2 != "*")
      } else {
        assert(qi2 == "*", "level-1 rows must generalize qi2")
        assert((violates == 1) == (n < 10))
      }
    }
    // row accounting: published + generalized n's cover the table
    assert(rows.map(_.getLong(3)).sum == Tables.customer(spark, sf).count())
  }

  test("ooo: lateness accounting consistent with the event table") {
    val rows = graft.ops.EventAnalytics.qOoo(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nLate, maxLate, sumLate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nLate <= n)
      assert(maxLate >= 0 && sumLate >= maxLate * (if (nLate > 0) 1 else 0))
      if (nLate == 0) assert(maxLate == 0 && sumLate == 0)
    }
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    // the jitter replay must actually exercise the lateness arithmetic
    assert(rows.map(_.getLong(2)).sum > 0, "no late events — audit is vacuous")
  }

  test("dataset card: per-cell invariants and full coverage") {
    val rows = graft.text.TrainPrep.qDatasetCard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nTok, nUniq) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (dup, minT, maxT, meanT) =
        (r.getDouble(5), r.getLong(6), r.getLong(7), r.getDouble(8))
      assert(nUniq >= 1 && nUniq <= nDocs)
      assert(dup >= 0.0 && dup < 1.0)
      assert(minT <= maxT && meanT >= minT && meanT <= maxT)
      assert(nTok >= nDocs * minT && nTok <= nDocs * maxT)
    }
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
  }

  test("orc ingest: audit over the round-trip equals the direct audit") {
    import graft.ops.Exact._
    val viaOrc = graft.ops.Advanced.qIngestOrc(spark, sf).collect()
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(dec(col("value")))).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(col("user_id")).as("user_sum"))
      .orderBy(col("event_type")).collect()
    assert(viaOrc.map(_.toString).toSeq == direct.map(_.toString).toSeq,
      "ORC round trip altered at least one value")
  }
}
