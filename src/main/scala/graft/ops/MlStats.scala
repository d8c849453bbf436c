package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Distributed statistics for feature engineering / dataset auditing:
  * closed-form grouped regression, categorical association, and a
  * mergeable histogram-quantile sketch audited against the exact
  * answer. All three are one-aggregation-pass shapes whose reduced
  * state is group-cardinality-sized — the 100 TB story is "sufficient
  * statistics, not data movement".
  *
  * Reference analogue: the summary/aggregation analytics the reference
  * derives per collection run (pipeline/processors/transform.py) —
  * re-expressed as exact-arithmetic Spark aggregates.
  */
object MlStats {

  /** Q-ols: per-group closed-form least-squares fit (price ~ quantity)
    * from the five sufficient sums. ONE map-side-combinable aggregate
    * pass; the regression math runs on the 3-row reduced result.
    *
    * Determinism: sums ride exact decimals (Exact.dec/money) and
    * surface as doubles once; slope/intercept/r2 are then a fixed
    * dag of double ops mirrored token-for-token in the oracle SQL.
    * At 100 TB nothing changes: state per group is 6 numbers. */
  def qOls(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"), 2)
    val y = money(col("l_extendedprice"))
    val sums = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        decToDouble(sum(x)).as("sx"),
        decToDouble(sum(y)).as("sy"),
        decToDouble(sum(x * x)).as("sxx"),
        decToDouble(sum(y * y)).as("syy"),
        decToDouble(sum(x * y)).as("sxy"))
    sums
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(
        col("l_returnflag"), col("n"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          * (col("n") * col("sxy") - col("sx") * col("sy"))
          / ((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Q-chisq: chi-square association cells between customer market
    * segment and order priority. The fact join reduces to a 25-cell
    * contingency table in one shuffle; row/column/grand totals are
    * window sums OVER THE 25 CELLS (no second pass over the fact).
    * Per-cell expected counts and contributions are emitted instead of
    * the summed statistic so no cross-cell float summation order can
    * drift between engines.
    *
    * Scale shape: orders⋈customer is a key shuffle join with partial
    * aggregation pushed below the exchange (count per cell); the
    * windows run on 25 rows. All counts are exact longs; expected and
    * contrib are each a fixed dag of double ops. */
  def qChisq(spark: SparkSession, dir: String): DataFrame = {
    val joint = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("obs"))
    val wRow = Window.partitionBy(col("c_mktsegment"))
    val wCol = Window.partitionBy(col("o_orderpriority"))
    val wAll = Window.partitionBy()
    joint
      .withColumn("row_total", sum(col("obs")).over(wRow))
      .withColumn("col_total", sum(col("obs")).over(wCol))
      .withColumn("grand_total", sum(col("obs")).over(wAll))
      .withColumn("expected",
        (col("row_total") * col("col_total")).cast("double") / col("grand_total"))
      .select(
        col("c_mktsegment"), col("o_orderpriority"), col("obs"),
        col("row_total"), col("col_total"), col("grand_total"), col("expected"),
        ((col("obs") - col("expected")) * (col("obs") - col("expected"))
          / col("expected")).as("contrib"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  /** Q-quantile-sketch: mergeable equi-width histogram quantile
    * estimate, audited against the exact interpolated quantile in the
    * same result row. The sketch state per group is 64 bin counts —
    * commutative, mergeable, map-side-combinable: the 100 TB path
    * where the exact per-group sort behind `percentile` is the thing
    * you cannot afford. The estimate (left edge of the first bin whose
    * cumulative count reaches ceil(q·n)) is integer-derived, so both
    * engines agree bit-for-bit; `err_p50`/`err_p90` quantify the
    * sketch's resolution (≤ one bin width) against the exact twin.
    *
    * Bin map: width 9000 over [0, 576000) — o_totalprice's fixed
    * domain — clamped into bin 63. Literals are part of the operator
    * contract (fixed-domain quantization, like ZOrder's). */
  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val binW = 9000L
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        least(floor(col("o_totalprice") / binW), lit(63L)).cast("long").as("bin"),
        col("o_totalprice"))
    val hist = o.groupBy(col("o_orderpriority"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val est = cum.groupBy(col("o_orderpriority"))
      .agg(
        max(col("n")).as("n"),
        (min(when(col("cum") * 2 >= col("n"), col("bin"))) * binW)
          .cast("double").as("est_p50"),
        (min(when(col("cum") * 10 >= col("n") * 9, col("bin"))) * binW)
          .cast("double").as("est_p90"))
    val exact = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("percentile(o_totalprice, 0.9)").as("exact_p90"))
    est.join(exact, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n"),
        col("est_p50"), col("exact_p50"),
        (col("est_p50") - col("exact_p50")).as("err_p50"),
        col("est_p90"), col("exact_p90"),
        (col("est_p90") - col("exact_p90")).as("err_p90"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q-zscore: per-group feature standardization — the z-transform
    * every numeric feature gets before training. Group moments come
    * from ONE exact-decimal aggregate (map-side-combinable, 5-row
    * result); the standardization pass is then a broadcast join + a
    * fixed dag of double ops per row — no second shuffle of the fact.
    * The per-row subset (user_id < 200) bounds the declared output;
    * the moments intentionally cover the FULL table (train-set stats,
    * like a fitted scaler). */
  def qZscore(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = dec(col("value"), 2)
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(v)).as("s1"),
        decToDouble(sum(v * v)).as("s2"))
      .select(col("event_type"),
        (col("s1") / col("n")).as("mean_v"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("sd_v"))
    e.join(broadcast(stats), Seq("event_type"))
      .filter(col("user_id") < 200)
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean_v"), col("sd_v"),
        ((col("value") - col("mean_v")) / col("sd_v")).as("z"))
      .orderBy(col("event_id"))
  }

  /** Q-drift: distribution-drift monitoring between two time periods —
    * the check a pipeline runs on every new drop before training on
    * it. Values bin into a fixed-width histogram (domain literal, like
    * [[qQuantileSketch]]'s); each (event_type, bin) cell carries both
    * periods' counts and a chi-square drift contribution against the
    * pooled expectation. Cells, not a summed statistic — no cross-cell
    * float order to drift between engines (the [[qChisq]] rule).
    *
    * Scale shape: ONE scan + one (type, bin)-keyed aggregate with
    * map-side combine; the window totals run over the ~80-cell reduced
    * table. Period split: first vs second half of the event-time range
    * (fixed literal boundary). */
  def qDrift(spark: SparkSession, dir: String): DataFrame = {
    val binW = 32L
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        least(floor(col("value") / binW), lit(15L)).cast("long").as("bin"),
        when(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")), 1L)
          .otherwise(0L).as("is_a"))
    val cells = e.groupBy(col("event_type"), col("bin"))
      .agg(sum(col("is_a")).as("n_a"), sum(lit(1L) - col("is_a")).as("n_b"))
    val wType = Window.partitionBy(col("event_type"))
    cells
      .withColumn("tot_a", sum(col("n_a")).over(wType))
      .withColumn("tot_b", sum(col("n_b")).over(wType))
      .withColumn("exp_a",
        ((col("n_a") + col("n_b")) * col("tot_a")).cast("double")
          / (col("tot_a") + col("tot_b")))
      .select(col("event_type"), col("bin"), col("n_a"), col("n_b"),
        col("exp_a"),
        ((col("n_a") - col("exp_a")) * (col("n_a") - col("exp_a"))
          / col("exp_a")).as("drift_contrib"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Q-ab-test: two-sample comparison of a metric between cohorts (the
    * even/odd user-id split standing in for treatment assignment) —
    * Welch t statistic per event_type from six exact-decimal sums, the
    * analysis every experimentation pipeline batches nightly. One
    * aggregate pass, group-cardinality state, fixed double dag. */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val v = dec(col("value"), 2)
    val e = Tables.events(spark, dir)
      .withColumn("grp", (col("user_id") % 2 === 0).cast("long"))
    val sums = e.groupBy(col("event_type"))
      .agg(
        sum(col("grp")).as("n1"),
        count(lit(1)).as("n"),
        decToDouble(sum(when(col("grp") === 1, v))).as("s1"),
        decToDouble(sum(when(col("grp") === 1, v * v))).as("q1"),
        decToDouble(sum(when(col("grp") === 0, v))).as("s0"),
        decToDouble(sum(when(col("grp") === 0, v * v))).as("q0"))
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("m1", col("s1") / col("n1"))
      .withColumn("m0", col("s0") / col("n0"))
      .withColumn("var1",
        (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1))
      .withColumn("var0",
        (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1))
    sums.select(col("event_type"), col("n1"), col("n0"),
        col("m1"), col("m0"),
        (col("m1") - col("m0")).as("lift"),
        ((col("m1") - col("m0"))
          / sqrt(col("var1") / col("n1") + col("var0") / col("n0"))).as("t_stat"))
      .orderBy(col("event_type"))
  }

  /** Q-corr: full Pearson correlation matrix over the four lineitem
    * numeric measures — the feature-audit pass every training pipeline
    * runs before model fitting (collinear features, leakage signals).
    *
    * ONE aggregate pass computes all 14 sufficient statistics (4 sums,
    * 4 square-sums, 6 cross-sums) as exact decimals; the 6 pairwise
    * correlations are then a fixed double dag over the single reduced
    * row, exploded to one row per pair. At 100 TB the state is 14
    * numbers — column count squared, never row count. */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val vars = Seq(
      "quantity" -> dec(col("l_quantity"), 2),
      "extendedprice" -> money(col("l_extendedprice")),
      "discount" -> dec(col("l_discount"), 2),
      "tax" -> dec(col("l_tax"), 2))
    val sumCols =
      vars.map { case (n, c) => decToDouble(sum(c)).as(s"s_$n") } ++
      vars.map { case (n, c) => decToDouble(sum(c * c)).as(s"ss_$n") } ++
      vars.combinations(2).toSeq.map { case Seq((nx, cx), (ny, cy)) =>
        decToDouble(sum(cx * cy)).as(s"sp_${nx}_$ny")
      }
    val sums = Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n"), sumCols: _*)
    def corrFor(x: String, y: String): Column =
      (col("n") * col(s"sp_${x}_$y") - col(s"s_$x") * col(s"s_$y")) /
        sqrt((col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x"))
          * (col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y")))
    val pairs = vars.map(_._1).combinations(2).toSeq.map { case Seq(x, y) =>
      struct(lit(s"${x}_$y").as("pair"), corrFor(x, y).as("corr"))
    }
    sums.select(col("n"), explode(array(pairs: _*)).as("kv"))
      .select(col("kv.pair").as("pair"), col("n"), col("kv.corr").as("corr"))
      .orderBy(col("pair"))
  }
}
