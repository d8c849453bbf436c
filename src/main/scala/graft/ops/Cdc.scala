package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.Exact._

/** Change-data-capture maintenance: apply a keyed changeset
  * (insert / update / delete rows) onto a base snapshot — the MERGE
  * INTO primitive every incrementally-maintained 100 TB table needs
  * (ingest feeds arrive as deltas; full-snapshot rewrites are a
  * non-starter at that size).
  *
  * Scale shape: the merge is ONE hash shuffle on the key — union the
  * tagged base and delta, take the highest-precedence row per key with
  * a single `row_number` window, drop deletes. No driver state, no
  * per-key lookups; at 100 TB the same plan runs partition-parallel,
  * and a bucketed base table turns the shuffle into a co-located
  * sort-merge (the Delta/Iceberg MERGE physical shape). Precedence is
  * (src DESC) with src ∈ {0=base, 1=delta}; the key is unique within
  * each side, so the window never compares more than two rows.
  *
  * Reference analogue: the reference refreshes its Redis-cached HTTP
  * snapshots entry-by-entry (`pipeline/utils/api.py:140-152`, 304 →
  * keep, 200 → replace); this is the same upsert semantic expressed
  * set-at-a-time over a keyed table.
  */
object Cdc {

  /** Q-merge-upsert: deterministic changeset derived from the orders
    * key space — keys ≡0 (mod 10) are deleted, ≡1 updated (price
    * uplifted 10 %, exact decimal), ≡2 inserted (absent from the
    * base). All arithmetic stays in exact decimals until the final
    * string-mediated double conversion, so both engines agree
    * bit-for-bit. */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // price carried at scale 4 everywhere so the 10% uplift (scale 2 ×
    // scale 2 = scale 4) unions against base rows without any rounding
    val p4 = dec(col("o_totalprice")).cast(DecimalType(18, 4))
    val base = o.filter(col("o_orderkey") % 10 =!= 2)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        p4.as("price"), lit(0).as("src"), lit("K").as("op"))
    val delta = o.filter(col("o_orderkey") % 10 < 3)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 10 === 1,
          (dec(col("o_totalprice")) * lit(1.10).cast(DecimalType(3, 2)))
            .cast(DecimalType(18, 4)))
          .otherwise(p4).as("price"),
        lit(1).as("src"),
        when(col("o_orderkey") % 10 === 0, "D")
          .when(col("o_orderkey") % 10 === 1, "U")
          .otherwise("I").as("op"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("src").desc)
    base.unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("op"), decToDouble(col("price")).as("price"))
      .orderBy(col("o_orderkey"))
  }

  /** Q-incr-agg: incremental view maintenance for a per-(user, day)
    * aggregate — the merged result of a STANDING base aggregate plus a
    * delta-sized partial aggregate, exploiting that count/sum are
    * algebraic (partials merge by addition, exactly — the decimal sums
    * make the merge bit-identical to a full recompute, which is what
    * the oracle asserts by recomputing from scratch).
    *
    * Scale shape: at 100 TB the base side is a materialized aggregate
    * table (key-sized, not corpus-sized) and ONLY the delta (here: the
    * trailing partial day, selected by a broadcast high-watermark —
    * never a driver-side collect) is scanned and aggregated; the merge
    * is a union + re-aggregate on the SAME key partitioning, so daily
    * maintenance cost is |delta| + |touched keys|, independent of
    * history depth. The reference refreshes per-entry with conditional
    * GETs (`pipeline/utils/api.py:140-152`); this is the same
    * incremental-refresh semantic for aggregates. */
  def qIncrAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hw = e.agg(date_trunc("day", max(col("ts"))).as("cut"))
    val keyed = e.crossJoin(broadcast(hw))
      .select(col("user_id"), to_date(col("ts")).as("day"),
        dec(col("value")).as("v"), (col("ts") >= col("cut")).as("is_delta"))
    // base: the standing aggregate (everything before the watermark);
    // delta: the trailing partial day's partial aggregate
    def partial(df: DataFrame) = df.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    partial(keyed.filter(!col("is_delta")))
      .unionByName(partial(keyed.filter(col("is_delta"))))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("n")).as("n"), decToDouble(sum(col("s"))).as("sum_value"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("d"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("d"))
  }

  /** Q-forget: right-to-be-forgotten cascade audit — delete a
    * tombstoned customer set and everything reachable from it
    * (customer → orders → lineitem), emitting one audit row per table
    * with deleted/retained counts and a retained-key checksum that
    * pins EXACTLY which rows survive (not just how many).
    *
    * Scale shape: the tombstone set broadcasts (deletion requests are
    * always tiny relative to the corpus); each table is scanned ONCE
    * with a left-join deletion marker folded into one aggregate — no
    * row materialization, no second pass. The order-level cascade
    * rides a key-projected join (o_orderkey only), which at 100 TB is
    * a shuffle hash join on the fact's own key — the same plan a
    * Delta/Iceberg DELETE with a subquery compiles to. */
  def qForget(spark: SparkSession, dir: String): DataFrame = {
    val tomb = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey"), lit(1).as("del"))
    def audit(tbl: String, joined: DataFrame, keyCol: Column): DataFrame =
      joined.agg(
        sum(when(col("del").isNotNull, 1L).otherwise(0L)).as("n_deleted"),
        sum(when(col("del").isNull, 1L).otherwise(0L)).as("n_kept"),
        // accumulate in decimal(38,0): a raw LONG sum wraps silently on
        // overflow while the DuckDB oracle sums into HUGEINT — the two
        // sides would diverge without error at very large scale factors.
        // The final BIGINT cast mirrors the oracle's ::BIGINT exactly.
        sum(when(col("del").isNull, keyCol)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("kept_key_sum"))
        .select(lit(tbl).as("tbl"), col("n_deleted"), col("n_kept"),
          col("kept_key_sum"))
    val cA = audit("customer",
      Tables.customer(spark, dir).join(broadcast(tomb), Seq("c_custkey"), "left"),
      col("c_custkey"))
    val oA = audit("orders",
      Tables.orders(spark, dir).join(broadcast(tomb),
        col("o_custkey") === tomb("c_custkey"), "left"),
      col("o_orderkey"))
    // cascade: orders owned by tombstoned customers, key-projected
    val oDel = Tables.orders(spark, dir)
      .join(broadcast(tomb), col("o_custkey") === tomb("c_custkey"), "left_semi")
      .select(col("o_orderkey"), lit(1).as("del"))
    val lA = audit("lineitem",
      Tables.lineitem(spark, dir).join(oDel,
        col("l_orderkey") === oDel("o_orderkey"), "left"),
      col("l_orderkey") * 10 + col("l_linenumber"))
    cA.unionByName(oA).unionByName(lA).orderBy(col("tbl"))
  }
}
