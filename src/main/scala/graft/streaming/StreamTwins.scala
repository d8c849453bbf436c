package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Batch twins of the streaming operators (SURVEY §2.3 Q-tumble /
  * Q-slide / Q-session / Q-state-ttl / Q-late). Each is the exact
  * batch-mode equivalent of the Structured Streaming query in
  * [[StreamOps]] — same windowing semantics, deterministic and
  * oracle-checkable over the `events` table.
  *
  * Ref lineage: the reference's bounded-queue stream + TTL'd cache state
  * (`pipeline/collectors/nft.py:62-96`, `pipeline/utils/cache.py:135-182`;
  * SURVEY R5/R27/R28) promoted to event-time window semantics.
  */
object StreamTwins {

  /** Tumbling 5-minute event-time windows (epoch-aligned, same as
    * Structured Streaming's `window()`); counts + exact value sums per
    * (window, event_type). */
  def qTumble(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(tstr(col("window.start")).as("wstart"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** Sliding windows: length 10 min, slide 5 min — every event lands in
    * 2 epoch-aligned windows. */
  def qSlide(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(tstr(col("window.start")).as("wstart"), col("n"), col("sum_value"))
      .orderBy(col("wstart"))

  /** Session windows, 10-minute gap, per user — batch-mode
    * `session_window` (merges events closer than the gap; session end =
    * last event + gap, exclusive). */
  def qSession(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        tstr(col("session_window.start")).as("session_start"),
        tstr(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Streaming dedup, batch twin: FIRST event per (user_id,
    * event_type) — the min(struct) twin of the max(struct) latest-state
    * aggregate (same map-side-combine shape, one row per key per
    * partition through the shuffle, never a full sort). Streaming form:
    * [[StreamOps.dedupFirst]] (dropDuplicatesWithinWatermark — state
    * bounded by the watermark; this global-argmin twin is what it
    * converges to when no key recurs beyond the lateness bound). */
  def qDedupFirst(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.event_id").as("first_event_id"), tstr(col("m.ts")).as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))

  /** Keyed state with TTL, batch twin (ref cache staleness R28): the
    * surviving state per user = its latest event, but only if it arrived
    * within TTL of the global high-watermark. The global max(ts) rides a
    * broadcast single-row cross join — a scalar subquery, not a driver
    * collect.
    *
    * "Latest row per key" is a `max(struct(orderKeys…, payload))` hash
    * aggregate, NOT a window row_number: structs compare field-by-field
    * so the max is the (ts, event_id)-greatest row, and the aggregate
    * gets map-side partial combining — at scale that shuffles one row
    * per (key, partition) instead of sorting every event. */
  def qStateTtl(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hw = e.agg(max(col("ts")).as("hw"))
    e.crossJoin(broadcast(hw))
      .filter(col("ts") >= col("hw") - expr("INTERVAL 6 HOURS"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"), tstr(col("m.ts")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** Conditional-revalidation state machine, batch twin (ref R14,
    * `pipeline/utils/api.py:140-152`): each key's fetch sequence is a
    * fold where a matching validator (etag unchanged since the previous
    * fetch) is a 304 — the cached payload survives and only the TTL
    * clock refreshes — and a changed etag is a 200 — the payload is
    * replaced and the TTL restarts. The fetch log is synthesized
    * deterministically from `events` (cache_key = user_id % 50, etag =
    * md5(event_type) prefix), so consecutive same-type events model 304
    * revalidations. Output per key: fetch/refresh/replace counts, the
    * surviving payload version, and the TTL expiry extended by the last
    * fetch — observable refresh-extends-TTL semantics.
    * Streaming form: [[StreamOps.revalidatingCache]]. */
  def qRevalidate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("cache_key")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select((col("user_id") % 50).as("cache_key"), col("ts"), col("event_id"),
        substring(md5(col("event_type")), 1, 8).as("etag"))
      .withColumn("prev", lag(col("etag"), 1).over(w))
      .withColumn("is_replace",
        when(col("prev").isNull || col("prev") =!= col("etag"), 1L).otherwise(0L))
      .groupBy(col("cache_key"))
      .agg(count(lit(1)).as("n_fetches"),
        sum(col("is_replace")).as("n_replace"),
        (count(lit(1)) - sum(col("is_replace"))).as("n_refresh"),
        max(struct(col("ts"), col("event_id"), col("etag"))).as("m"))
      .select(col("cache_key"), col("n_fetches"), col("n_refresh"), col("n_replace"),
        col("m.etag").as("last_etag"), tstr(col("m.ts")).as("last_fetch"),
        tstr(col("m.ts") + expr("INTERVAL 600 SECONDS")).as("expires_at"))
      .orderBy(col("cache_key"))
  }

  /** Stale-while-revalidate, batch twin (ref R15, `api.py:205-206`):
    * under `stale-while-revalidate` every hit is served from cache
    * IMMEDIATELY — the payload the caller sees is the PREVIOUS state —
    * while the state updates to the origin's new payload in the
    * background. Per fetch: the served (possibly stale) etag, the
    * origin etag the state moves to, and whether the serve was stale.
    * First fetch per key is a miss (served = origin). Streaming form:
    * [[StreamOps.staleWhileRevalidateCache]]. */
  def qSwrServe(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("cache_key")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select((col("user_id") % 50).as("cache_key"), col("ts"), col("event_id"),
        substring(md5(col("event_type")), 1, 8).as("etag"))
      .withColumn("prev", lag(col("etag"), 1).over(w))
      .select(col("event_id"), col("cache_key"),
        coalesce(col("prev"), col("etag")).as("served_etag"),
        col("etag").as("origin_etag"),
        when(col("prev").isNotNull && col("prev") =!= col("etag"), 1L).otherwise(0L)
          .as("served_stale"))
      .orderBy(col("event_id"))
      .limit(500)
  }

  /** Late-data discard, batch twin: drop events older than watermark =
    * max(ts) − 1 hour (what a streaming watermark would have dropped),
    * then aggregate the survivors. */
  def qLate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hw = e.agg(max(col("ts")).as("hw"))
    e.crossJoin(broadcast(hw))
      .filter(col("ts") >= col("hw") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }
}
