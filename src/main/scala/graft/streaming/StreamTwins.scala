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
