package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Second-wave operator breadth: cube/grouping-id, analytic window
  * functions, exact moment statistics, percentile, fuzzy matching,
  * map functions, and schema-on-read JSON ingest. Same determinism
  * contract as Relational (exact decimals, BIGINT engineered ints,
  * total-order output).
  */
object Advanced {

  /** Q-cube: full cube over (returnflag, linestatus) with grouping
    * indicators (BIGINT both sides). */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_stat"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("g_flag"), col("g_stat"), col("sum_qty"), col("n_items"))
      .orderBy(col("returnflag"), col("linestatus"), col("g_flag"), col("g_stat"))

  /** Q-window-analytics: first/last/nth value, ntile, percent_rank,
    * cume_dist per customer ordered by order history. percent_rank and
    * cume_dist are int-ratio doubles — deterministic cross-engine. */
  def qWindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 60)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), money(col("o_totalprice")).as("p"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("p")).over(wFull).cast("double").as("first_price"),
        last(col("p")).over(wFull).cast("double").as("last_price"),
        nth_value(col("p"), 2).over(wFull).cast("double").as("second_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q-stats: sample stddev/variance and Pearson correlation computed
    * from EXACT decimal power sums, combined in a fixed double-
    * arithmetic formula — engine-native stddev/corr aggregate doubles
    * in nondeterministic order; this formulation is bit-stable. */
  def qStats(spark: SparkSession, dir: String): DataFrame = {
    val p = money(col("l_extendedprice"))
    val q = dec(col("l_quantity"), 2)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        decToDouble(sum(p)).as("s1"),
        decToDouble(sum(p * p)).as("s2"),
        decToDouble(sum(q)).as("t1"),
        decToDouble(sum(q * q)).as("t2"),
        decToDouble(sum(p * q)).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        (col("s1") / col("n")).as("mean_price"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("sd_price"),
        ((col("n") * col("sxy") - col("s1") * col("t1"))
          / (sqrt(col("n") * col("s2") - col("s1") * col("s1"))
            * sqrt(col("n") * col("t2") - col("t1") * col("t1")))).as("corr_pq"))
      .orderBy(col("l_returnflag"))
  }

  /** Q-percentile: exact interpolated percentiles (Spark `percentile`
    * == DuckDB `quantile_cont`: both use pos=(n-1)·q linear
    * interpolation — verified numerically). */
  def qPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"))
      .orderBy(col("o_orderpriority"))

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * two one-dimension marginals plus the grand total in one pass —
    * Spark expands to a single Expand + two-phase aggregate, reading
    * the fact once for all three groupings. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(grouping(l_linestatus) AS BIGINT) AS g_stat,
         |  count(*) AS n,
         |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_qty
         |FROM graft_lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Ordered string aggregation (listagg/string_agg): the canonical
    * "concatenate group members deterministically" — sort inside the
    * aggregate so the result is engine- and partitioning-independent
    * (collect_list alone is arrival-ordered, never oracle-stable). */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size") <= 2)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("p_name"))), "|").as("names"))
      .orderBy(col("p_brand"))

  /** Heavy hitters (iceberg query): part keys whose lineitem count
    * reaches a support threshold — exact two-phase hash aggregate
    * (map-side combine keeps the shuffle at one row per key per
    * partition). The 100 TB sketch path is [[heavyHittersCms]]:
    * a count-min sketch answers the same question in one pass with
    * bounded memory when the key domain itself doesn't fit. */
  def qHeavyHitters(spark: SparkSession, dir: String, minSupport: Long = 5): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .orderBy(col("n").desc, col("l_partkey"))

  /** Count-min-sketch scale path for [[qHeavyHitters]] — no oracle
    * (sketch internals are engine-specific); AdvancedSketchSpec pins
    * the estimate guarantees against the exact counts: estimate ≥
    * true count, over-estimate ≤ eps·N with the sketch's confidence. */
  def heavyHittersCms(spark: SparkSession, dir: String,
      eps: Double = 0.001, confidence: Double = 0.99): org.apache.spark.util.sketch.CountMinSketch =
    Tables.lineitem(spark, dir).stat.countMinSketch(col("l_partkey"), eps, confidence, 42)

  /** Approx-percentile scale path for qPercentile — single-pass
    * mergeable quantile summaries (accuracy 10k ⇒ ≤0.01 % rank error)
    * instead of the exact percentile's full per-group sort. No oracle
    * (DuckDB's approx_quantile uses a different sketch); spec-pinned
    * against the exact result instead. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("median_price"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("p90_price"))
      .orderBy(col("o_orderpriority"))

  /** Q-fuzzy: edit-distance near-match pairs of part names within a
    * brand (levenshtein is identical in both engines). Brand acts as
    * the blocking key — the cross join is per-block, never corpus-wide
    * (the standard fuzzy-dedup blocking pattern at scale). */
  /** Fixed-count sample bound for the within-brand levenshtein pairing:
    * a fractional sample would grow the per-brand cartesian
    * quadratically with the corpus (measured 12.6× wall at 10× data);
    * hash-rank top-K keeps the pair work O(K²/brands) at every scale. */
  val FuzzySampleK = 400

  def qFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .orderBy(md5(concat(lit("fuzzy:"), col("p_partkey").cast("string"))), col("p_partkey"))
      .limit(FuzzySampleK)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    val a = p.select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand"))
      .filter(col("key_a") < col("key_b"))
      .select(col("p_brand"), col("key_a"), col("key_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("lev"))
      .filter(col("lev") <= 4)
      .orderBy(col("p_brand"), col("key_a"), col("key_b"))
  }

  /** Q-map: map construction and higher-order map functions
    * (str_to_map, element_at, transform_keys, map_filter, map_keys/
    * values). The oracle mirrors the VALUES, not the map machinery —
    * DuckDB's map dialect differs, the semantics don't. */
  def qMap(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k")
    val m = expr("str_to_map(concat('type=', event_type, '&k=', get_json_object(props, '$.k')), '&', '=')")
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), k.as("kv"), m.as("m"))
      .select(
        col("event_id"),
        element_at(col("m"), "type").as("m_type"),
        size(col("m")).cast("long").as("m_size"),
        concat_ws(",", map_keys(transform_keys(col("m"), (kk, _) => upper(kk)))).as("keys_upper"),
        concat_ws(",", map_values(map_filter(col("m"), (kk, _) => kk === "k"))).as("k_vals"))
      .orderBy(col("event_id"))
      .limit(300)
  }

  /** Q-pivot: wide-format aggregation (order counts by status per
    * priority). Explicit pivot values keep the output schema static —
    * mandatory at scale (a value-discovery pass over 100 TB is a full
    * extra scan). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy(col("o_orderpriority"))

  /** Q-unpivot: melt the three lineitem measures to long format and
    * aggregate per (flag, measure) — exact decimal sums. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(dsum(col("val"), 4).as("sum_val"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("measure"))

  /** COLUMN PROFILER — the data-quality audit a pipeline runs on every
    * ingest: per column, row/null/distinct counts and min/max (numeric
    * columns in the `*_num` slots, string/date columns as canonical
    * strings — dates serialize 'yyyy-MM-dd' identically cross-engine).
    * Shape: one aggregate PER COLUMN, unioned — each scan prunes to
    * exactly its column (vectorized parquet reads one column stream),
    * so the profiles parallelize instead of forcing one scan through a
    * multi-distinct Expand (which multiplies every row by the number
    * of distinct aggregates — the non-scaling form). Exact
    * count(distinct) is the audit contract here; a monitoring-grade
    * profiler would swap in HLL (the approx_distinct path q_agg_distinct
    * already exercises). */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.orders(spark, dir)
    val nullStr = lit(null).cast("string")
    val nullNum = lit(null).cast("double")
    def base(c: String) = t.agg(
      count(lit(1)).as("n_rows"),
      sum(col(c).isNull.cast("long")).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).as("mn"), max(col(c)).as("mx"))
    def num(c: String) = base(c).select(lit(c).as("column"),
      col("n_rows"), col("n_nulls"), col("n_distinct"),
      col("mn").cast("double").as("min_num"), col("mx").cast("double").as("max_num"),
      nullStr.as("min_str"), nullStr.as("max_str"))
    def str(c: String) = base(c).select(lit(c).as("column"),
      col("n_rows"), col("n_nulls"), col("n_distinct"),
      nullNum.as("min_num"), nullNum.as("max_num"),
      col("mn").cast("string").as("min_str"), col("mx").cast("string").as("max_str"))
    Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
      str("o_orderstatus"), str("o_orderpriority"), str("o_orderdate"))
      .reduce(_.union(_))
      .orderBy(col("column"))
  }

  /** Q-ingest-json: schema-on-read with corrupt-row tolerance — the
    * reference's per-row error-skip (`pipeline/collectors/nft.py:76-77`)
    * as PERMISSIVE from_json: bad payloads yield null, flagged not
    * dropped. */
  def qIngestJson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = when(col("event_id") % 10 === 0, lit("{bad json")).otherwise(col("props"))
    // PERMISSIVE + corrupt-record column: bad payloads keep their raw
    // text in _corrupt_record instead of failing or silently dropping
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("_corrupt_record", StringType)))
    val parsed = from_json(raw, schema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record"))
    Tables.events(spark, dir)
      .select(col("event_id"), parsed.as("p"))
      .select(col("event_id"), col("p.k").as("k"),
        col("p._corrupt_record").isNotNull.cast("long").as("is_corrupt"))
      .orderBy(col("event_id"))
      .limit(400)
  }

  /** Q-ingest-orc: ORC source/sink round trip — Spark's second
    * first-class columnar format (vectorized reader, predicate
    * pushdown, same writer API). The events table is written to ORC
    * and read back; the declared result is a per-type audit aggregate
    * over the READ-BACK files while the oracle computes the same
    * aggregate from the original parquet — green iff the ORC round
    * trip preserved every value exactly (count, exact-decimal value
    * sum, key range, user checksum). The write runs on every
    * execution: the sink is the operator under test. */
  def qIngestOrc(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.GraftPaths.sink("graft_orc", dir.replaceAll(".*/", ""))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(dec(col("value")))).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(col("user_id")).as("user_sum"))
      .orderBy(col("event_type"))
  }
}
