package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Q-window (SURVEY §2.3): ranking, analytic, and frame-based window
  * functions. One shuffle on the partition key per window spec; specs
  * sharing (partitionBy, orderBy) share a single sort+shuffle.
  *
  * Ref lineage: the reference's running counters / status line
  * (`pipeline/utils/api.py:81-108`, SURVEY R17) generalized to ordered
  * per-key analytics.
  */
object Windows {

  /** rank / dense_rank / row_number per nation over customer balances.
    * Ranks compare the *decimal-normalized* balance so tie semantics are
    * identical cross-engine; row_number gets a unique tiebreak. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), money(col("c_acctbal")).as("bal"))
    val byBal = Window.partitionBy(col("c_nationkey")).orderBy(col("bal").desc)
    val total = Window.partitionBy(col("c_nationkey")).orderBy(col("bal").desc, col("c_custkey"))
    c.select(
        col("c_nationkey"), col("c_custkey"), col("bal").cast("double").as("acctbal"),
        // rank-family outputs cast to long: DuckDB emits BIGINT for
        // window ranks, Spark INT — normalize for the schema compare
        rank().over(byBal).cast("long").as("rnk"),
        dense_rank().over(byBal).cast("long").as("drnk"),
        row_number().over(total).cast("long").as("rn"))
      .filter(col("rn") <= 5)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Running (cumulative) sum + count per customer over order history —
    * rowsBetween(unboundedPreceding, currentRow) frame. Exact decimal
    * accumulation keeps the running values engine-identical. */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), money(col("o_totalprice")).as("p"))
      .select(
        col("o_custkey"), col("o_orderkey"), tstr(col("o_orderdate")).as("odate"),
        sum(col("p")).over(w).cast("double").as("running_spend"),
        count(lit(1)).over(w).as("running_orders"))
      .filter(col("o_custkey") <= 100)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lag/lead analytics: per-customer delta between consecutive order
    * totals (decimal subtraction — exact). */
  def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), money(col("o_totalprice")).as("p"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("p").cast("double").as("price"),
        lag(col("p"), 1).over(w).cast("double").as("prev_price"),
        (col("p") - coalesce(lag(col("p"), 1).over(w),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(12, 2))))
          .cast("double").as("delta"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .filter(col("o_custkey") <= 50)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Range-frame window: for each order, total spend by the same
    * customer within the preceding 30 days (rangeBetween over the
    * order-date cast to epoch seconds — interval frames on timestamps). */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("epoch"), money(col("o_totalprice")).as("p"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("p")).over(w).cast("double").as("spend_30d"))
      .filter(col("o_custkey") <= 50)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
