package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.CacheSemantics
import graft.ops.Exact._

/** Scalar-function surface (SURVEY §2.3 Q-str/json/date/math/array) plus
  * the reference-derived cache expressions wired into oracle-checkable
  * queries. All pure built-in expressions — fully codegen'd, no UDFs.
  */
object Scalars {

  /** Q-str: string kernel over `part` — case, substring, concat,
    * length, regex extract, hash, split. Ref lineage: URL/header string
    * work `pipeline/utils/cache.py:29-55` (SURVEY R21/R22). */
  def qStr(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lo"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        // int-valued string fns cast to long: DuckDB length/len emit
        // BIGINT, Spark INT — normalize for the schema compare
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_type"), "(\\w+)$", 1).as("type_last"),
        substring(sha2(col("p_name"), 256), 1, 16).as("name_sha16"),
        size(split(col("p_name"), " ")).cast("long").as("name_words"))
      .orderBy(col("p_partkey"))
      .limit(300)

  /** Q-json: JSON extraction over `events.props` (ref cache payload
    * JSON, `pipeline/utils/cache.py:126-159`, SURVEY R26/R27). Long sums
    * are exact — no decimal needed. */
  def qJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Q-date: truncation, field extraction, interval arithmetic over
    * orders (ref TTL/epoch arithmetic `cache.py:164-182`, SURVEY R25/R28).
    * All date outputs are canonical strings. */
  def qDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        money(col("o_totalprice")).as("p"))
      .groupBy(col("month"), col("yr"), col("qtr"))
      .agg(count(lit(1)).as("n_orders"), decToDouble(sum(col("p"))).as("sum_price"))
      .orderBy(col("month"))

  /** Q-math: arithmetic, floor/ceil, mod, CASE tiers, least/greatest —
    * all deterministic per-row ops (floor/ceil of a double are exact). */
  def qMath(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        (col("l_orderkey") % 7).as("mod7"),
        when(col("l_quantity") >= 40, "bulk")
          .when(col("l_quantity") >= 10, "mid")
          .otherwise("small").as("tier"),
        (money(col("l_extendedprice")) * (one - rate(col("l_discount")))).cast("double").as("net"),
        greatest(rate(col("l_discount")), rate(col("l_tax"))).cast("double").as("max_rate"),
        least(rate(col("l_discount")), rate(col("l_tax"))).cast("double").as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  /** Q-array: higher-order array functions over document tokens —
    * size, sort, contains, distinct, transform+aggregate (integer fold,
    * order-independent ⇒ engine-safe). */
  def qArray(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_sort(toks).getItem(0).as("first_token"),
        array_contains(toks, "the").cast("long").as("has_the"),
        aggregate(transform(toks, t => length(t)), lit(0L), (acc, x) => acc + x).as("sum_token_chars"))
      .orderBy(col("doc_id"))
      .limit(300)
  }

  /** Q-cachekey (ref R21+R23 end-to-end): construct a messy URL from
    * event columns, normalize it (scheme/host lowercase, query-pair
    * sort, fragment drop), derive the sha256 cache key. */
  def qCacheKey(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("HTTPS://Api.Example.COM/v1/items?b="), col("user_id").cast("string"),
      lit("&a="), col("event_id").cast("string"), lit("#frag"))
    val norm = CacheSemantics.normalizeUrl(url)
    Tables.events(spark, dir)
      .select(col("event_id"),
        norm.as("url_norm"),
        CacheSemantics.cacheKey(lit("opensea"), norm, lit("application/json")).as("cache_key"))
      .orderBy(col("event_id"))
      .limit(300)
  }

  /** Header allowlisting (ref `cache.py:41-55`): synthesize a messy
    * header map (mixed-case keys, auth + request-id noise), keep only
    * the cache-relevant entries with lowercased keys, and emit them as
    * a canonical sorted `k=v;…` string. The oracle re-derives the
    * expected survivors analytically from the same synthesized inputs —
    * proving Authorization/X-Request-Id are dropped and case folds. */
  def qHeaders(spark: SparkSession, dir: String): DataFrame = {
    val ct = when(col("event_id") % 3 === 0, lit("application/json"))
      .when(col("event_id") % 3 === 1, lit("text/html"))
      .otherwise(lit("application/xml"))
    val headers = map(
      lit("Accept"), lit("application/json"),
      lit("Content-Type"), ct,
      lit("X-Request-Id"), col("event_id").cast("string"),
      lit("Authorization"), lit("Bearer secret"))
    val rel = CacheSemantics.relevantHeaders(headers)
    Tables.events(spark, dir)
      .select(col("event_id"),
        array_join(array_sort(transform(map_entries(rel),
          e => concat(e.getField("key"), lit("="), e.getField("value")))), ";").as("relevant"))
      .orderBy(col("event_id"))
      .limit(300)
  }

  /** Q-ttl (ref R24/R25/R29): synthesize cache-control headers from
    * event ids, extract max-age / stale-while-revalidate, clamp TTL to
    * [0, 86400], detect directives. Pure int arithmetic — exact. */
  def qTtl(spark: SparkSession, dir: String): DataFrame = {
    val cc = when(col("event_id") % 4 === 0,
        concat(lit("public, max-age="), (col("event_id") % 200000).cast("string")))
      .when(col("event_id") % 4 === 1,
        concat(lit("max-age=600, stale-while-revalidate="), (col("event_id") % 1000).cast("string")))
      .when(col("event_id") % 4 === 2, lit("no-store"))
      .otherwise(lit("no-cache, must-revalidate"))
    Tables.events(spark, dir)
      .select(col("event_id"), cc.as("cache_control"))
      .select(col("event_id"), col("cache_control"),
        CacheSemantics.maxAge(col("cache_control")).cast("long").as("max_age"),
        CacheSemantics.calculateTtl(col("cache_control")).cast("long").as("ttl"),
        CacheSemantics.noStore(col("cache_control")).cast("long").as("is_no_store"),
        CacheSemantics.mustRevalidate(col("cache_control")).cast("long").as("must_revalidate"))
      // staleness (ref cache.py:164-182): entry age modeled from the id
      .withColumn("is_stale", CacheSemantics.isStale(
        (col("event_id") % 120000).cast("int"),
        col("ttl").cast("int"), col("max_age").cast("int")).cast("long"))
      .orderBy(col("event_id"))
      .limit(400)
  }
}
