package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the grouped-statistics, data-contract, and
  * contrastive-mining operators (oracle hashes are the gate; these
  * assert the invariants the hash can't see). */
class MlStatsContractsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  import spark.implicits._

  test("ols recovers an exact planted line and bounds r2") {
    val rows = MlStatsContractsSpec.synthLine(spark)
    // reuse the operator's math by running it through a temp table view
    val x = $"x".cast("decimal(18,2)")
    val y = $"y".cast("decimal(12,2)")
    val fit = rows.groupBy($"g").agg(
      count(lit(1)).as("n"),
      sum(x).cast("string").cast("double").as("sx"),
      sum(y).cast("string").cast("double").as("sy"),
      sum(x * x).cast("string").cast("double").as("sxx"),
      sum(x * y).cast("string").cast("double").as("sxy"))
      .select($"g",
        (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"))
      .collect()
    fit.foreach { r => assert(math.abs(r.getDouble(1) - 2.5) < 1e-9) }

    val out = graft.ops.MlStats.qOls(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(!r.getAs[Double]("slope").isNaN)
    }
  }

  test("chisq cells: expected sums match observed sums per margin") {
    val cells = graft.ops.MlStats.qChisq(spark, sf).cache()
    // Σ expected over a row (segment) == that row's total, exactly in
    // double because Σ col_total = grand_total
    val margins = cells.groupBy($"c_mktsegment")
      .agg(sum($"expected").as("se"), max($"row_total").as("rt"))
      .collect()
    margins.foreach { r =>
      assert(math.abs(r.getAs[Double]("se") - r.getAs[Long]("rt")) < 1e-6)
    }
    // contribs are nonnegative and finite
    assert(cells.filter($"contrib" < 0 || isnan($"contrib")).count() === 0)
    cells.unpersist()
  }

  test("quantile sketch error is bounded by one bin width") {
    val out = graft.ops.MlStats.qQuantileSketch(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // estimate = left bin edge, so err ∈ (-binW, 0] relative to any
      // point inside the bin; exact quantile sits within the chosen bin
      assert(math.abs(r.getAs[Double]("err_p50")) <= 9000.0)
      assert(math.abs(r.getAs[Double]("err_p90")) <= 9000.0)
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90"))
    }
  }

  test("expectations: clean checks pass, planted violations are counted") {
    val audit = graft.ops.Contracts.qExpectations(spark, sf).cache()
    def row(chk: String) = audit.filter($"chk" === chk).head()
    // structurally-clean invariants of the corpus
    assert(row("o_orderkey_unique").getAs[Long]("n_violations") === 0)
    assert(row("l_orderkey_references_orders").getAs[Long]("n_violations") === 0)
    assert(row("value_not_null").getAs[Long]("n_violations") === 0)
    // the zh documents violate the allowed-language contract
    val zh = Tables.documents(spark, sf).filter($"lang" === "zh").count()
    assert(row("lang_allowed").getAs[Long]("n_violations") === zh)
    assert(zh > 0)
    // pass flag is exactly (violations == 0)
    assert(audit.filter(($"n_violations" === 0) =!= ($"pass" === 1)).count() === 0)
    // every check audited the full table it names
    val nOrders = Tables.orders(spark, sf).count()
    assert(row("o_totalprice_positive").getAs[Long]("n_checked") === nOrders)
    audit.unpersist()
  }

  test("drift cells: expected counts conserve the period-A mass") {
    val cells = graft.ops.MlStats.qDrift(spark, sf).cache()
    // Σ exp_a over a type == tot_a: the chi-square expectation is
    // margin-preserving
    val margins = cells.groupBy($"event_type")
      .agg(sum($"exp_a").as("se"), sum($"n_a").as("na")).collect()
    margins.foreach { r =>
      assert(math.abs(r.getAs[Double]("se") - r.getAs[Long]("na")) < 1e-6)
    }
    assert(cells.filter($"drift_contrib" < 0 || isnan($"drift_contrib")).count() === 0)
    // both periods are populated (the split literal bisects the range)
    assert(cells.agg(sum($"n_a")).head.getLong(0) > 0)
    assert(cells.agg(sum($"n_b")).head.getLong(0) > 0)
    cells.unpersist()
  }

  test("ab test: cohorts partition each group and t is finite") {
    val out = graft.ops.MlStats.qAbTest(spark, sf).cache()
    val e = Tables.events(spark, sf)
    val n = e.count()
    assert(out.agg(sum($"n1") + sum($"n0")).head.getLong(0) === n)
    assert(out.filter(isnan($"t_stat") || $"t_stat".isNull).count() === 0)
    // lift is exactly m1 - m0
    assert(out.filter(abs($"lift" - ($"m1" - $"m0")) > 0).count() === 0)
    out.unpersist()
  }

  test("hard negatives: sides are label-correct and ranked by similarity") {
    val out = graft.vector.VectorOps.qHardNegatives(spark, sf).cache()
    // every neg row has label != anchor label; every pos row matches
    assert(out.filter($"side" === "neg" && $"label" === $"a_label").count() === 0)
    assert(out.filter($"side" === "pos" && $"label" =!= $"a_label").count() === 0)
    // within an (anchor, side) group sims are non-increasing with rn
    val bad = out.as("a").join(out.as("b"),
        $"a.a_id" === $"b.a_id" && $"a.side" === $"b.side" &&
          $"a.rn" === $"b.rn" - 1 && $"a.sim" < $"b.sim")
      .count()
    assert(bad === 0)
    // a planted near-duplicate of an anchor with a different label must
    // surface as that anchor's top hard negative on a fixture corpus
    assert(out.filter($"rn" === 1).count() === out.select($"a_id", $"side").distinct().count())
    out.unpersist()
  }
}

object MlStatsContractsSpec {
  /** g × 100 points on y = 2.5x + 7 exactly (decimal-exact inputs). */
  def synthLine(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0 until 300).map { i =>
      val g = i % 3
      val x = (i / 3).toDouble
      (g, x, 2.5 * x + 7.0)
    }.toDF("g", "x", "y")
  }
}
