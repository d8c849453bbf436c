package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's HTTP-cache semantics re-expressed as pure, codegen'd
  * column expressions (SURVEY §2.1 R21–R25, R28, R29). No UDFs — every
  * function here composes Spark built-ins, so the whole thing stays
  * inside whole-stage codegen and is usable at any scale.
  *
  * Reference lineage (cited per function): `pipeline/utils/cache.py` in
  * /root/reference.
  */
object CacheSemantics {

  /** URL normalization — ref `pipeline/utils/cache.py:29-39`:
    * lowercase scheme+host, sort query pairs, drop fragment.
    * Pure string expressions: substring_index splits, array_sort for the
    * query-pair canonical order. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // substring after the first '?' (empty when no query)
    val query = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag))).otherwise(lit(""))
    val scheme = substring_index(base, "://", 1)
    val rest = base.substr(length(scheme) + 4, length(base))
    val host = substring_index(rest, "/", 1)
    val path = rest.substr(length(host) + 1, length(rest))
    val sortedQuery = when(length(query) > 0,
      concat(lit("?"), concat_ws("&", array_sort(split(query, "&"))))).otherwise(lit(""))
    concat(lower(scheme), lit("://"), lower(host), path, sortedQuery)
  }

  /** Header allowlist — ref `cache.py:41-55`: keep only `accept` /
    * `content-type`, keys lowercased. Input/output MapType. */
  def relevantHeaders(headers: Column): Column =
    map_filter(transform_keys(headers, (k, _) => lower(k)),
      (k, _) => k.isin("accept", "content-type"))

  /** Deterministic cache key — ref `cache.py:57-74`:
    * `namespace:v1:sha256(canonical-json({url, headers}))`.
    * Spark's compact `to_json(struct(...))` is byte-identical to the
    * canonical form (no spaces, field order = struct order). */
  def cacheKey(namespace: Column, urlNorm: Column, accept: Column, version: Int = 1): Column =
    concat(namespace, lit(s":v$version:"),
      sha2(to_json(struct(urlNorm.as("url"), accept.as("accept"))), 256))

  /** `max-age=N` extraction — ref `cache.py:76-81`. Both Spark and
    * DuckDB return '' (not null) on regex no-match, and ANSI cast(''
    * as int) throws — so guard with rlike. */
  def maxAge(cacheControl: Column): Column =
    when(cacheControl.rlike("max-age=\\d+"),
      regexp_extract(cacheControl, "max-age=(\\d+)", 1).cast("int")).otherwise(lit(0))

  /** `stale-while-revalidate=N` extraction — ref `api.py:205`. */
  def staleWhileRevalidate(cacheControl: Column): Column =
    when(cacheControl.rlike("stale-while-revalidate=\\d+"),
      regexp_extract(cacheControl, "stale-while-revalidate=(\\d+)", 1).cast("int")).otherwise(lit(0))

  /** TTL — ref `cache.py:83-94`: `max-age + stale-while-revalidate`
    * clamped to [0, 86400] (`_max_ttl`, `cache.py:18`); `no-store`
    * forces 0 (ref `api.py:166`). */
  def calculateTtl(cacheControl: Column): Column = {
    val raw = maxAge(cacheControl) + staleWhileRevalidate(cacheControl)
    when(noStore(cacheControl), lit(0))
      .otherwise(least(greatest(raw, lit(0)), lit(86400)))
  }

  /** Cache-control directive predicates — ref `api.py:166,191-193,205`
    * (case-insensitive regex search). */
  def noStore(cc: Column): Column = cc.rlike("(?i)no-store")
  def mustRevalidate(cc: Column): Column = cc.rlike("(?i)no-cache|must-revalidate")
  def staleOk(cc: Column): Column = cc.rlike("(?i)stale-while-revalidate")

  /** Staleness predicate — ref `cache.py:164-182`: `age >= max_age`;
    * missing TTL ⇒ stale; `max_age == 0` ⇒ fresh. */
  def isStale(ageSeconds: Column, ttl: Column, maxAgeSeconds: Column): Column =
    when(maxAgeSeconds === 0, lit(false))
      .when(ttl.isNull, lit(true))
      .otherwise(ageSeconds >= maxAgeSeconds)
}
