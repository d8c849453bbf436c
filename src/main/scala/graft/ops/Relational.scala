package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Core relational operators (SURVEY.md §2.3 Q-scan … Q-setops),
  * expressed as declarative DataFrame plans so Catalyst owns pushdown,
  * pruning, join selection, partial aggregation, and AQE re-planning.
  *
  * Every query ends in a total-order `orderBy` (part of the declared
  * query contract — the oracle hash-compares rows) and aliases every
  * computed column identically to its oracle SQL.
  *
  * 100 TB notes: no `collect` anywhere; joins are plain equi-joins that
  * Catalyst plans as broadcast (dims under threshold) or sort-merge with
  * AQE skew splitting; aggregations are hash-based with map-side partial
  * aggregation; top-k is `Window`+filter (per-group) or
  * `TakeOrderedAndProject` (global orderBy+limit), never a global sort
  * materialized on the driver.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary (Q-scan, Q-filter, Q-cast, Q-agg,
    * Q-sort). Filter + column pruning reach the parquet scan; aggregate
    * is partial+final hash agg on (returnflag, linestatus) — 6 groups,
    * so the shuffle is tiny regardless of input scale.
    * Ref semantics source: aggregation counters `pipeline/utils/api.py:22`
    * generalized to group-by (SURVEY §2.1 R17). */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        decToDouble(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        decToDouble(sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))) * (one + rate(col("l_tax")))))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q-project + Q-sort + limit: narrow projection whose ReadSchema must
    * contain only the 3 selected columns (verified in PlanSpec). */
  def qScanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** Q-cast: ANSI casts both directions (string keys round-trip,
    * double → decimal → double money normalization). */
  def qCast(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast("string").as("okey_str"),
        col("o_orderkey").cast("string").cast("long").as("okey_back"),
        money(col("o_totalprice")).cast("double").as("price2"))
      .orderBy(col("okey_back"))
      .limit(500)

  /** Q-filter: combined null-guard, range, regex (`rlike` ⇒ parquet
    * row-group pruning for the range part, codegen'd regex for the rest).
    * Ref: predicate guards `pipeline/collectors/nft.py:18`, cache-control
    * regexes `pipeline/utils/api.py:166,191-193` (SURVEY R29). */
  def qFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size").between(10, 30)
        && col("p_type").rlike("(?i)econ|promo")
        && col("p_name").isNotNull)
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))

  /** Q-join-lookup (SURVEY R3 generalized): enrichment left-join of the
    * fact table with two small dims. `broadcast()` hints keep this a
    * BroadcastHashJoin at any fact-side scale — the dims (supplier,
    * nation) are bounded, the fact is not; no shuffle of lineitem. */
  def qJoinLookup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(
        decToDouble(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Q-join-inner: 3-way star join customer⋈orders⋈lineitem rolled up to
    * market segment. The fact table is partially aggregated to its join
    * key BEFORE the join (600 k lineitems → 150 k order rows at sf0.1;
    * the same 4× shrink holds at 100 TB), so the expensive join moves
    * and shuffles the small pre-aggregated relation, never raw
    * lineitems. Decimal partial sums keep the two-level aggregation
    * exact. AQE/broadcast handles orders⋈customer. */
  def qJoinInner(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"),
        count(lit(1)).as("cnt"))
    perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        decToDouble(sum(col("rev"))).as("revenue"),
        sum(col("cnt")).as("n_items"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q-join-semi: EXISTS as a left-semi join (never materializes the
    * probe side's payload — at scale this beats `IN (subquery)`). */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 100000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q-join-anti: NOT EXISTS as a left-anti join (customers with no
    * big-ticket order). */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Q-agg: group-by with the full basic aggregate set; timestamps
    * surfaced as canonical strings (cross-engine-stable). */
  def qAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        money(min(col("o_totalprice"))).cast("double").as("min_price"),
        money(max(col("o_totalprice"))).cast("double").as("max_price"),
        tstr(min(col("o_orderdate"))).as("first_date"),
        tstr(max(col("o_orderdate"))).as("last_date"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** Q-agg-distinct: exact count(distinct) — expands to a two-phase
    * aggregate; at 100 TB prefer `approx_count_distinct` (HLL, kept in
    * [[approxDistinct]] for the bench path, no oracle — DuckDB's HLL
    * differs). */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))

  /** HLL variant of [[qAggDistinct]] — the 100 TB path (single pass, no
    * distinct expansion). Not oracle-checked (sketch values are
    * engine-specific); exercised by ScalaTest against exact counts. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_suppkey"), 0.01).as("n_supp_approx"))
      .orderBy(col("l_returnflag"))

  /** Deterministic HyperLogLog audit (declared + oracle-checked, unlike
    * [[approxDistinct]] whose engine-native sketch is not comparable):
    * our own md5-register HLL, m=128 registers, raw estimator, vs the
    * exact distinct count per (l_returnflag × {l_partkey, l_orderkey}).
    *
    * Every step is integer-exact in both engines: 60-bit md5 hash
    * (first 15 hex chars), register = h & 127, rank ρ = 54 − bitlen
    * (h >> 7) with bitlen via `bin()`/`ltrim` (ρ = 54 when the 53-bit
    * suffix is 0), harmonic sum as the scaled integer Σ 2^(54−ρmax)
    * (≤ 2^61, no float accumulation order hazard). The only IEEE-double
    * ops are the final α·m²·2^54 / Z and the error ratio — identical
    * literals and op order in both engines, so the DOUBLE output
    * hash-matches bit-for-bit.
    *
    * 100 TB: the sketch side shuffles ≤ 128 register rows per
    * (group, column) after map-side partial MAX — constant state, one
    * pass, no distinct expansion; the exact side (two-phase distinct)
    * is the cost being audited. err_ppm documents the m=128 raw-regime
    * accuracy (~9 % SE) against ground truth at every scale. Extension
    * beyond the reference surface (same family as [[qAggDistinct]]),
    * following Flajolet et al., "HyperLogLog" (AofA 2007). */
  def qHllAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def hashed(c: String, tag: String): DataFrame =
      li.select(
        col("l_returnflag").as("flag"), lit(tag).as("col_name"),
        conv(substring(md5(concat(lit("hll:"), col(c).cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"),
        col(c).cast("long").as("v"))
    val hashes = hashed("l_partkey", "part").union(hashed("l_orderkey", "order"))
    val regs = hashes
      .select(col("flag"), col("col_name"),
        col("h").bitwiseAND(lit(127L)).as("idx"),
        (lit(54) - length(ltrim(bin(shiftright(col("h"), 7)), "0"))).as("rho"))
      .groupBy(col("flag"), col("col_name"), col("idx"))
      .agg(max(col("rho")).as("rmax"))
    val z = regs.groupBy(col("flag"), col("col_name"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(54 - rmax AS INT))")).as("zsum"),
        count(lit(1)).as("nreg"))
      .select(col("flag"), col("col_name"),
        (col("zsum") + (lit(128L) - col("nreg")) * lit(1L << 54)).as("z"))
    val exact = hashes.groupBy(col("flag"), col("col_name"))
      .agg(countDistinct(col("v")).as("n_exact"))
    // α_m for m=128 and 2^54, as compile-time double constants; the
    // oracle SQL spells out the same literal arithmetic
    val alphaM2 = 0.7213 / (1.0 + 1.079 / 128.0) * 16384.0
    val est = lit(alphaM2) * (lit(18014398509481984.0) / col("z").cast("double"))
    val exD = col("n_exact").cast("double")
    z.join(exact, Seq("flag", "col_name"))
      .select(col("flag"), col("col_name"), col("n_exact"),
        est.as("n_est"),
        floor(abs(est - exD) / exD * lit(1000000.0) + lit(0.5)).cast("long").as("err_ppm"))
      .orderBy(col("flag"), col("col_name"))
  }

  /** Q-rollup: hierarchical subtotals. Group keys are coalesced to a
    * sentinel so the oracle compare never depends on engine NULL-ordering
    * defaults (Spark: NULLS FIRST asc; DuckDB: NULLS LAST). */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("n_items"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Q-sort/limit: global top-10 — Catalyst plans orderBy+limit as
    * TakeOrderedAndProject (per-partition top-k, tiny driver merge),
    * never a full global sort. Tiebreak on the unique key makes the
    * limit deterministic. */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), money(col("o_totalprice")).cast("double").as("totalprice"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q-topk (per group): row_number window + filter — the scalable
    * grouped top-k (single shuffle on the partition key; no global
    * sort). Total ordering via the unique (orderkey, linenumber). */
  def qTopkGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price2").desc, col("l_orderkey"), col("l_linenumber"))
    // r14 (guide §2.5 unsplittable input): the gate corpora are
    // single-row-group parquet, so WindowGroupLimit's partial
    // sort-by-(flag, price) ran over the WHOLE fact in one task.
    // Tables.widened round-robins the already-narrow projection
    // (~30 B/row) to the session parallelism ONLY when the scan is
    // under-parallelized — a no-op on any source with real scan
    // parallelism. row_number's order is total (orderkey, linenumber
    // unique), so the result is partitioning-independent.
    Tables.widened(spark, Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        money(col("l_extendedprice")).cast("double").as("price2")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Partial-aggregation variant of [[qTopkGroup]] — same rows, same
    * oracle, different physical shape: the bounded-heap aggregate
    * (graft.functions.TopKNative) truncates to k rows per partition
    * BEFORE the shuffle, so the exchange carries ≤ k·partitions rows
    * per group instead of the whole fact table. */
  def qTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    val top3 = graft.functions.TopKNative.topK(3) _
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        money(col("l_extendedprice")).cast("double").as("price2"),
        col("l_orderkey"), col("l_linenumber"))
      .groupBy(col("l_returnflag"))
      .agg(top3(col("price2"), col("l_orderkey"), col("l_linenumber")).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")))
      .select(col("l_returnflag"),
        col("col.id1").as("l_orderkey"),
        col("col.id2").as("l_linenumber"),
        col("col.sortKey").as("price2"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Q-setops: UNION ALL / INTERSECT / EXCEPT over customer key sets
    * from two order-date years (set ops are distinct-semantics in both
    * engines). Output: one tagged count per op, total-ordered. */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val y94 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    val y95 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val u = y94.union(y95).agg(count(lit(1)).as("n")).select(lit("union_all").as("op"), col("n"))
    val i = y94.intersect(y95).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
    val e = y94.except(y95).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
    u.union(i).union(e).orderBy(col("op"))
  }

  /** Q-dedup-exact: deterministic distinct projection (`SELECT DISTINCT`
    * — hash aggregate on all columns; for keyed "first row per key" see
    * [[qTopkGroup]]'s row_number pattern). */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** TPC-H Q3-shaped shipping-priority query: segment-filtered customer
    * ⋈ date-filtered orders ⋈ lineitem, revenue per order, top 10.
    * Composite pipeline: both filters reach their scans before the
    * joins; final top-k is bounded (TakeOrderedAndProject over grouped
    * output). */
  def qTpch3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(decToDouble(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
        tstr(min(col("o_orderdate"))).as("odate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier volume: 6-way snowflake join where
    * lineitem supplier and order customer must share a nation, rolled
    * up per nation within one region/year. All dims broadcast; the
    * fact shuffles once for the orders join. */
  def qTpch5(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(year(col("o_orderdate")) === 1996)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decToDouble(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q-interval-join, LEFT OUTER form: every signup, with its
    * within-the-hour purchases when they exist and nulls when they
    * don't — the batch twin of the streaming outer interval join
    * ([[graft.streaming.StreamOps.signupPurchaseLeftJoin]], where the
    * null rows emit on watermark-driven state expiry). Same plan shape
    * as the inner form: equi-key hash join with the band as a join
    * condition, never a nested loop. */
  def qIntervalLeft(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    s.join(p, col("user_id") === col("p_user")
        && col("p_ts") >= col("s_ts")
        && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("lag_secs"))
      .orderBy(col("user_id"), col("signup_id"), col("purchase_id"))
  }

  /** TPC-H Q2-shaped min-per-group lookup, FACTORIZED the way a
    * 100 TB fact table demands. The SQL form (correlated scalar MIN —
    * it lived here through r8) decorrelates into two sort-merge joins
    * over the FULL fact table: two complete sorts of lineitem, tens of
    * GB of sort spill at sf100 — the spill outgrew this rig's disk in
    * r8/r9 and is the wrong plan at any scale when the dim predicate
    * is selective. The factorized shape: filter part FIRST (p_size<10,
    * dim-sized), broadcast it to semi-restrict lineitem, take the
    * per-part MIN over that restricted scan (map-side combine ⇒ the
    * shuffle is part-cardinality, not fact-cardinality), broadcast the
    * min table back, and keep fact rows matching their part's min —
    * lineitem is SCANNED twice and never shuffled or sorted. Supplier
    * and nation broadcast onto the (dim-sized) survivors. Catalyst's
    * scalar decorrelation itself stays showcased by q_tpch17's oracle
    * twin and q_tpch20/q_tpch4's IN/EXISTS paths. */
  def qTpch2(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir).filter(col("p_size") < 10)
      .select(col("p_partkey"), col("p_brand"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val mins = l.join(broadcast(pf.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("mk"))
      .agg(min(col("l_extendedprice")).as("mp"))
    l.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(mins),
        col("l_partkey") === col("mk") && col("l_extendedprice") === col("mp"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("l_extendedprice").as("min_price"))
      .orderBy(col("p_partkey"), col("s_name"), col("min_price"))
  }

  /** TPC-H Q4-shaped EXISTS, INVERTED for the fact table's sake. The
    * EXISTS SQL form (here through r8) decorrelates into a left-semi
    * join whose PROBE side is the quarter's orders and whose build
    * side is ALL of lineitem — Spark plans it sort-merge and sorts the
    * 600 M-row fact table (the sf100 wall was pure sort spill on the
    * slow-read tier). The inverted shape streams lineitem ONCE through
    * a broadcast of the quarter's orders (time-pruned first — the
    * quarter is dim-sized next to the fact table), applies the
    * correlated predicate (l_shipdate > o_orderdate) inside that
    * broadcast join, and reduces to EXISTS semantics with a DISTINCT
    * on matched orders — a matched-orders-sized shuffle, never a fact
    * sort. At a scale where the quarter outgrows broadcast, the same
    * plan swaps the broadcast for a shuffle-hash join (no sort either
    * way); Catalyst's EXISTS/IN decorrelation stays showcased by
    * q_tpch20/q_tpch21/q_not_exists. */
  def qTpch4(spark: SparkSession, dir: String): DataFrame = {
    val oq = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
      .join(broadcast(oq), col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") > col("o_orderdate"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Null-aware anti join: NOT IN over a NULLABLE inner column has
    * three-valued-logic semantics (any NULL in the inner set makes
    * every NOT IN false — the whole result empties) that a plain anti
    * join gets wrong; Spark plans the single-column case as a
    * BroadcastHashJoin with isNullAwareAntiJoin. The CASE makes the
    * inner column nullable-typed (forcing the null-aware plan) while
    * the WHERE keeps actual NULLs out of the set — so the result stays
    * non-degenerate (an actual NULL would empty it entirely) and both
    * engines must agree on the 3VL handling row-by-row. */
  def qNotInNaaj(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM graft_customer
        |WHERE c_custkey % 7 = 0
        |  AND c_custkey NOT IN (
        |    SELECT CASE WHEN o_totalprice > 150000 THEN NULL ELSE o_custkey END
        |    FROM graft_orders WHERE o_custkey % 3 = 0 AND o_totalprice <= 150000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated NOT EXISTS (anti-decorrelation, Q21/Q22 flavor):
    * quarter orders where NO lineitem shipped within 30 days of the
    * order date — the left-ANTI twin of [[qTpch4]]'s semi join, with
    * the same correlated non-equi predicate riding the anti-join
    * condition.
    *
    * r14 (guide §2.3 "aggregate before you shuffle"): `EXISTS l WHERE
    * key match AND l_shipdate < X` ⟺ `min(l_shipdate) per key < X`
    * (min ignores nulls exactly as the `<` rejects them), so the
    * anti-join's lineitem side is pre-reduced to one (key, first_ship)
    * row per order — a map-side-combinable aggregate. Before, the
    * anti-join broadcast the RAW projected fact (every lineitem row);
    * now the built/shuffled side is per-key, ~4× fewer rows here and
    * |orders|-bounded at any scale. The declared result is unchanged
    * (oracle SQL keeps the textbook NOT EXISTS; hash-verified). */
  def qNotExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM graft_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM (SELECT l_orderkey, min(l_shipdate) AS first_ship
        |                   FROM graft_lineitem GROUP BY l_orderkey) f
        |    WHERE f.l_orderkey = o_orderkey
        |      AND f.first_ship < o_orderdate + INTERVAL 30 DAYS)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** TPC-H Q20-shaped nested semi-join chain: suppliers who moved more
    * than 50 units of some 'gear' part in 1996–97, restricted to a
    * nation subset. Both IN subqueries plan as left-semi joins (the
    * inner one over a partial aggregate with the HAVING pushed into it);
    * exact decimal sum keeps the threshold comparison engine-identical.
    * Nothing here materializes the full lineitem — filters and the
    * group-by run before either semi join. */
  def qTpch20(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("graft_part")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    spark.sql(
      """SELECT s.s_suppkey, s.s_name, s.s_acctbal
        |FROM graft_supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM graft_lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM graft_part WHERE p_name LIKE '%gear%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(50 AS DECIMAL(18,2)))
        |  AND s.s_nationkey IN (SELECT n_nationkey FROM graft_nation WHERE n_nationkey % 5 = 0)
        |ORDER BY s.s_name""".stripMargin)
  }

  /** TPC-H Q7-shaped volume shipping: bilateral trade revenue between
    * two nations per ship year — a 6-table snowflake (lineitem at the
    * center; two independent nation lookups through supplier and
    * customer). All four dims broadcast; the only shuffles are
    * fact-side aggregation exchanges. Exact decimal revenue. */
  def qTpch7(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    spark.sql(
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4)))) AS STRING) AS DOUBLE) AS revenue
        |FROM graft_lineitem l
        |JOIN graft_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_customer c ON o.o_custkey = c.c_custkey
        |JOIN graft_nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN graft_nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE (sn.n_nationkey = 1 AND cn.n_nationkey = 2)
        |   OR (sn.n_nationkey = 2 AND cn.n_nationkey = 1)
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)
  }

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns
    * per customer over one quarter, top 20. Ordering is total (revenue
    * desc, then custkey) so the limit cut is deterministic despite the
    * double sort key — the decimal-sum revenue is bitwise identical in
    * both engines, making desc-by-double safe. */
  def qTpch10(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    spark.sql(
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4)))) AS STRING) AS DOUBLE) AS revenue
        |FROM graft_customer c
        |JOIN graft_orders o ON o.o_custkey = c.c_custkey
        |JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN graft_nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q18-shaped large-volume orders: orders whose total quantity
    * clears a threshold, with customer context — the IN subquery's
    * HAVING aggregates BEFORE the semi join (no full-fact
    * materialization), then the outer join re-aggregates only
    * surviving orders. Total order on (totalprice desc, orderkey). */
  /** TPC-H Q18-shaped large-order lookup, FACTORIZED (r10): the naive
    * form (IN-subquery over an aggregated lineitem + a SECOND lineitem
    * join feeding the outer GROUP BY) plans as two full-fact
    * sort-merge passes — the exact disease the r9 q_tpch2/4/17
    * factorizations cured; at sf100 its twin sorts spilled the disk.
    * But the outer per-group sum(l_quantity) IS the subquery's
    * aggregate (the group key contains o_orderkey, and lineitem rows
    * attach only on l_orderkey = o_orderkey), so the whole query
    * collapses to: aggregate lineitem ONCE by orderkey (map-side
    * partial combine; the only fact shuffle), keep the rare
    * sum > 200 orders, and join that tiny hot set to orders and
    * customer — AQE broadcasts it, the fact table never sorts, and
    * everything after the one aggregate is hot-set-sized. Values and
    * oracle are byte-identical to the naive form. */
  def qTpch18(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """WITH hot AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM graft_lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(200 AS DECIMAL(18,2)))
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  date_format(o.o_orderdate, 'yyyy-MM-dd') AS odate,
        |  CAST(o.o_totalprice AS DOUBLE) AS totalprice,
        |  CAST(CAST(hot.sq AS STRING) AS DOUBLE) AS sum_qty
        |FROM hot
        |JOIN graft_orders o ON o.o_orderkey = hot.l_orderkey
        |JOIN graft_customer c ON c.c_custkey = o.o_custkey
        |ORDER BY totalprice DESC, o.o_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q6-shaped forecast-revenue check: a single wide scan with a
    * conjunctive range predicate and no join — the canonical test that
    * ALL filters reach the parquet scan (shipdate + discount + quantity
    * all appear in PushedFilters) and the aggregate runs map-side over
    * the surviving rows. At 100 TB this query is pure scan bandwidth;
    * anything but a one-stage plan with full pushdown is wrong. */
  def qTpch6(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(l_discount AS DECIMAL(6,4))) AS STRING) AS DOUBLE) AS revenue
        |FROM graft_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)
  }

  /** TPC-H Q8-shaped national market share: nation 1's share of
    * AMERICA-region ECONOMY-part revenue by order year — a 6-table
    * star join (3 broadcast dims) feeding a conditional-numerator
    * ratio. Both sums stay exact decimal and convert via the STRING
    * cast before the ONE double division, so the share is bitwise
    * reproducible cross-engine (dec/dec division has engine-specific
    * scale rules; double division is IEEE-exact). */
  def qTpch8(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_part")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_supplier")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_region")
    spark.sql(
      """WITH base AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4))) AS volume,
        |    s.s_nationkey AS supp_nation
        |  FROM graft_part p
        |  JOIN graft_lineitem l ON p.p_partkey = l.l_partkey
        |  JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN graft_orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN graft_customer c ON o.o_custkey = c.c_custkey
        |  JOIN graft_nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN graft_region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY')
        |SELECT o_year,
        |  CAST(CAST(sum(CASE WHEN supp_nation = 1 THEN volume END) AS STRING) AS DOUBLE) /
        |  CAST(CAST(sum(volume) AS STRING) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** TPC-H Q13-shaped order-count distribution: customers left-joined
    * to a filtered orders side (join-condition filter, not WHERE — the
    * filter must not drop customers), then a second aggregation over
    * the per-customer counts. Two shuffles by construction (custkey,
    * then c_count); the first is the big one and AQE coalesces the
    * tiny second. */
  def qTpch13(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """WITH c_orders AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM graft_customer c
        |  LEFT JOIN graft_orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** TPC-H Q14-shaped promo-revenue share: one month of lineitem
    * against the part dim (broadcast), conditional numerator over the
    * same decimal revenue term as the denominator. The CASE has no
    * ELSE, so non-promo rows contribute NULL and the decimal sum skips
    * them — numerator and denominator come off ONE aggregate pass. */
  def qTpch14(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_part")
    spark.sql(
      """SELECT
        |  CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |      THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |        (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4))) END) AS STRING) AS DOUBLE)
        |    * 100.0 /
        |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4)))) AS STRING) AS DOUBLE)
        |    AS promo_revenue
        |FROM graft_lineitem l JOIN graft_part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01' AND l.l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin)
  }

  /** TPC-H Q15-shaped top supplier: quarterly per-supplier revenue CTE
    * consumed twice — once as the join side, once reduced to a scalar
    * max — the view-reuse shape (the scalar subquery is uncorrelated,
    * so it plans as a one-row broadcast filter, not a rescan per row).
    * Revenue is decimal-exact before the double conversion, so the
    * max-equality filter is safe cross-engine. */
  def qTpch15(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_supplier")
    spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS STRING) AS DOUBLE) AS total_revenue
        |  FROM graft_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM graft_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin)
  }

  /** TPC-H Q17-shaped small-quantity revenue, FACTORIZED around the
    * brand/size predicate. The correlated-scalar SQL form (here
    * through r8) decorrelates into an aggregate over ALL of lineitem
    * plus a sort-merge join back to it — two full sorts of the fact
    * table, the sf100 spill heavyweight. But the ~0.16 %-selective
    * part filter determines which partkeys can ever matter: broadcast
    * the filtered part keys, restrict lineitem through them ONCE
    * (fact scanned, never shuffled), take the per-part average over
    * the restricted rows (map-side combine ⇒ filtered-part-cardinality
    * shuffle), broadcast it back, and compare. Quantities are integral
    * doubles, so avg = double-exact sum/count is order-independent and
    * the 0.2× threshold compare is deterministic cross-engine; the
    * revenue sum stays the exact-decimal fold. */
  def qTpch17(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#11" && col("p_size") <= 2)
      .select(col("p_partkey"))
    val lf = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
    val avgq = lf.groupBy(col("l_partkey").as("ak"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("aq"))
    lf.join(broadcast(avgq), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg((decToDouble(sum(money(col("l_extendedprice")))) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q19-shaped OR-of-ANDs join: three disjunctive brand/size/
    * quantity bands over the part–lineitem join. The join key is
    * common to all three arms, so Catalyst keeps ONE equi-join and
    * pushes the arm-local part predicates (brand/size) below it as a
    * derived disjunction on the build side — the pattern that turns a
    * "complex OR" into a normal hash join instead of a nested loop. */
  def qTpch19(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_part")
    spark.sql(
      """SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(6,4)))) AS STRING) AS DOUBLE) AS revenue
        |FROM graft_lineitem l JOIN graft_part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** TPC-H Q22-shaped dormant-customer report: above-average-balance
    * customers with no RECENT orders (every synthetic customer has
    * some order, so the anti condition carries a correlated date
    * predicate), grouped by nation. Exercises an uncorrelated scalar
    * subquery (the decimal-exact average balance) AND a NOT EXISTS
    * anti join with a non-key conjunct in one plan. */
  def qTpch22(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode, count(*) AS numcust,
        |  CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS totacctbal
        |FROM graft_customer c
        |WHERE c.c_nationkey <= 10
        |  AND c.c_acctbal > (
        |    SELECT CAST(CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / count(*)
        |    FROM graft_customer c2 WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey <= 10)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM graft_orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c.c_nationkey
        |ORDER BY cntrycode""".stripMargin)
  }

  /** Q-interval-join (range join): purchases within one hour AFTER the
    * same user's signup — an inequality band join. Spark plans the
    * equi-part (user_id) as the join key with the time band as a
    * post-join filter, so it stays a hash/sort-merge join, not a
    * nested loop. */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    s.join(p, Seq("user_id"))
      .filter(col("p_ts") >= col("s_ts") && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("lag_secs"))
      .orderBy(col("user_id"), col("signup_id"), col("purchase_id"))
  }
}
