package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins (SURVEY §2.3 preference (a)): for each left
  * row, attach the payload of the latest right row with the same key
  * and right.ts <= left.ts.
  *
  * Implementation: tag + union both sides, one window per key ordered
  * by (ts, side) with right rows sorting BEFORE left rows at equal
  * timestamps (so `>=` semantics hold), then `last(payload,
  * ignoreNulls=true)` over an unbounded-preceding frame carries the
  * most recent right payload forward; finally keep only left rows.
  *
  * Scale shape: ONE shuffle+sort on (key, ts) — the same cost as a
  * sort-merge join — no range explosion, no per-row probing. This is
  * the standard distributed as-of formulation. The right side must be
  * unique per (key, ts) for determinism; pre-aggregate it if not.
  */
object AsofJoin {

  /** @param payload right-side columns to carry (must not collide with
    *                left column names) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = payload.foldLeft(
      left.withColumn("__t", col(leftTs)).withColumn("__side", lit(0))) {
      (df, p) => df.withColumn(p, lit(null))
    }
    val rBase = right.select((Seq(col(key), col(rightTs).as("__t")) ++ payload.map(col)): _*)
      .withColumn("__side", lit(1))
    val r = leftCols.filterNot(c => c == key).foldLeft(rBase) {
      (df, c) => df.withColumn(c, lit(null))
    }
    // right rows first at equal __t ⇒ a left row at t sees right rows with ts <= t
    val w = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0).drop("__t", "__side")
  }

  /** Q-asof declared query: each event annotated with the same user's
    * most recent purchase at-or-before its timestamp. The purchase side
    * is pre-aggregated to one row per (user, ts) for determinism. */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("pts"))
      .agg(max(col("event_id")).as("last_purchase_id"),
        decToDouble(max(dec(col("value")))).as("last_purchase_value"))
    asofJoin(e, purchases, "user_id", "ts", "pts",
      Seq("last_purchase_id", "last_purchase_value"))
      .select(col("event_id"), col("user_id"), tstr(col("ts")).as("ets"),
        col("last_purchase_id"), col("last_purchase_value"))
      .orderBy(col("event_id"))
      .limit(500)
  }
}
