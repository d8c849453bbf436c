package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Data-cleaning operators over the events telemetry: missing-value
  * imputation (forward fill + per-group mean fallback) and robust
  * outlier detection (Tukey IQR fences) — the standard pre-training
  * hygiene passes a 100 TB feature pipeline runs before anything else
  * consumes the data.
  */
object Cleaning {

  /** Q-impute: forward-fill missing measurements per user in event-time
    * order, falling back to the user's mean when no prior observation
    * exists (leading gap), then 0.0 if the user never reported at all.
    * Missingness is synthesized deterministically (event_id ≡ 0 mod 7)
    * because the corpus ships dense.
    *
    * Scale shape: ONE window shuffle on user_id (the fill) plus a
    * per-user aggregate that reuses the same hash partitioning — at
    * 100 TB the fill is partition-parallel per user and the running
    * `last(ignoreNulls)` frame is O(1) state per row, never a sort
    * spill beyond the per-key ordering every event-time op already
    * pays. Values ride exact decimals; the mean divides an exact
    * decimal sum by a count in double (one deterministic division,
    * same order both engines). */
  def qImpute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val masked = e.select(col("user_id"), col("event_id"), col("ts"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(dec(col("value"))).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = masked.withColumn("ff", last(col("v"), ignoreNulls = true).over(w))
    val uMean = masked.groupBy(col("user_id"))
      .agg((decToDouble(sum(col("v"))) / count(col("v"))).as("u_mean"))
    filled.join(uMean, Seq("user_id"))
      .select(col("user_id"), col("event_id"), tstr(col("ts")).as("t"),
        col("v").isNull.cast("long").as("was_missing"),
        coalesce(decToDouble(col("ff")), col("u_mean"), lit(0.0)).as("value_filled"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q-outliers: Tukey fences per event_type — flag values outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR]. The exact quartiles run per group
    * (5 groups) and broadcast back over the stream; the flagged rows
    * are the output.
    *
    * Scale shape: the bounds table is group-cardinality-sized (a
    * broadcast), so the flagging pass is a scan + broadcast hash join
    * — no shuffle of the fact. The exact `percentile` is the oracle
    * twin; at 100 TB the same plan swaps in the mergeable
    * `percentile_approx` sketch (see Advanced.approxPercentile) whose
    * single-pass summaries avoid the per-group sort, with the fence
    * arithmetic unchanged. Fence math is double on both sides —
    * identical inputs (the interpolated quartiles match bit-for-bit,
    * as q_percentile already pins) give identical fences. */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val fences = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .select(col("event_type"),
        (col("q1") - (col("q3") - col("q1")) * lit(1.5)).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * lit(1.5)).as("hi"))
    e.join(broadcast(fences), Seq("event_type"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value") > col("hi"), "hi").otherwise("lo").as("side"),
        col("lo"), col("hi"))
      .orderBy(col("event_id"))
  }
}
