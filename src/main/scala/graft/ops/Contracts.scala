package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-contract validation (Great-Expectations-shaped): declarative
  * expectations over the ingested tables, evaluated in bulk, emitting
  * one audit row per check — the gate a 100 TB pipeline runs before
  * any training job consumes a new drop.
  *
  * Scale shape: every in-table check compiles to `sum(CASE WHEN
  * violated)` inside ONE full-scan aggregate per table (all checks on
  * a table share the scan), reduced map-side to a single row. The one
  * cross-table check (referential integrity) is a broadcast-or-shuffle
  * LEFT ANTI join counted the same way. Nothing here materializes
  * violating rows — counts only; a triage query filters the offending
  * table afterwards with the same predicate.
  *
  * Reference analogue: the schema/required-field validation the
  * reference applies per record on ingest (pipeline/processors/
  * validate.py) — batched into set-level audits.
  */
object Contracts {

  private def check(table: String, name: String, checked: Column, violations: Column) =
    struct(lit(table).as("tbl"), lit(name).as("chk"),
      checked.cast("long").as("n_checked"), violations.cast("long").as("n_violations"))

  /** Q-expectations: the audit table. Column names `tbl`/`chk` keep
    * the driver's sorted-column hash aligned with the oracle. */
  def qExpectations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val d = Tables.documents(spark, dir)
    val e = Tables.events(spark, dir)

    val viol = (c: Column) => sum(when(c, 1L).otherwise(0L))

    val ordersChecks = o.agg(
      check("orders", "o_orderkey_unique", count(lit(1)),
        count(lit(1)) - countDistinct(col("o_orderkey"))).as("c1"),
      check("orders", "o_totalprice_positive", count(lit(1)),
        viol(col("o_totalprice") <= 0)).as("c2"),
      check("orders", "o_orderstatus_enum", count(lit(1)),
        viol(!col("o_orderstatus").isin("O", "F", "P"))).as("c3"),
      check("orders", "o_totalprice_le_450k", count(lit(1)),
        viol(col("o_totalprice") > 450000)).as("c4"),
      check("orders", "o_orderdate_within_horizon", count(lit(1)),
        viol(col("o_orderdate") < to_timestamp(lit("1995-01-01 00:00:00")) ||
          col("o_orderdate") > to_timestamp(lit("2001-06-30 00:00:00")))).as("c5"))
      .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4"), col("c5"))).as("r"))

    val lineitemChecks = l.agg(
      check("lineitem", "l_quantity_in_1_50", count(lit(1)),
        viol(col("l_quantity") < 1 || col("l_quantity") > 50)).as("c1"),
      check("lineitem", "l_discount_in_0_011", count(lit(1)),
        viol(col("l_discount") < 0 || col("l_discount") > 0.11)).as("c2"),
      check("lineitem", "l_shipdate_not_null", count(lit(1)),
        viol(col("l_shipdate").isNull)).as("c3"))
      .select(explode(array(col("c1"), col("c2"), col("c3"))).as("r"))

    val docChecks = d.agg(
      check("documents", "text_nonempty", count(lit(1)),
        viol(length(col("text")) < 1)).as("c1"),
      check("documents", "n_chars_le_1200", count(lit(1)),
        viol(col("n_chars") > 1200)).as("c2"),
      check("documents", "lang_allowed", count(lit(1)),
        viol(!col("lang").isin("en", "de", "fr", "es"))).as("c3"))
      .select(explode(array(col("c1"), col("c2"), col("c3"))).as("r"))

    val eventChecks = e.agg(
      check("events", "value_not_null", count(lit(1)),
        viol(col("value").isNull)).as("c1"),
      check("events", "value_lt_256", count(lit(1)),
        viol(col("value") >= 256)).as("c2"))
      .select(explode(array(col("c1"), col("c2"))).as("r"))

    // referential integrity: every lineitem order key resolves — one
    // left-outer probe + null count (checked total and orphan count
    // from the same pass; the orders key is unique so fan-out is 1)
    val riCheck = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .agg(check("lineitem", "l_orderkey_references_orders",
        count(lit(1)), viol(col("o_orderkey").isNull)).as("r"))
      .select(col("r"))

    ordersChecks.unionAll(lineitemChecks).unionAll(docChecks)
      .unionAll(eventChecks).unionAll(riCheck)
      .select(col("r.tbl").as("tbl"), col("r.chk").as("chk"),
        col("r.n_checked").as("n_checked"), col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0).cast("long").as("pass"))
      .orderBy(col("tbl"), col("chk"))
  }

  /** Q-kanon: k-anonymity audit with one generalization step — the
    * privacy gate a training-data release runs over its
    * quasi-identifiers (here (c_mktsegment, c_nationkey), k=10).
    * Cells meeting k publish at level 0; violating cells generalize
    * the second identifier away ('*') and re-test at level 1 — the
    * standard public Sweeney/Mondrian generalization ladder, one rung.
    *
    * Scale shape: state is quasi-identifier-cell-sized (two map-side-
    * combinable aggregates, the second over the already-reduced cell
    * table), never row-sized — at 100 TB the scan dominates and the
    * audit itself is free. */
  def qKanon(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val cells = Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    val published = cells.filter(col("n") >= k)
      .select(col("c_mktsegment").as("qi1"),
        col("c_nationkey").cast("string").as("qi2"),
        lit(0L).as("lvl"), col("n"), lit(0L).as("violates"))
    val generalized = cells.filter(col("n") < k)
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("n")).as("n"))
      .select(col("c_mktsegment").as("qi1"), lit("*").as("qi2"),
        lit(1L).as("lvl"), col("n"),
        (col("n") < k).cast("long").as("violates"))
    published.unionByName(generalized)
      .orderBy(col("qi1"), col("lvl"), col("qi2"))
  }
}
