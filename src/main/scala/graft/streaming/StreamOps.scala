package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.StandingState.CkptOps

/** Structured Streaming forms of the SURVEY §2.3 streaming operators.
  * Each mirrors a batch twin in [[StreamTwins]] — the twins carry the
  * oracle check; these carry the streaming semantics (watermarks,
  * incremental state, timeouts) and are exercised by MemoryStream tests.
  *
  * Ref lineage: bounded-queue producer/consumer with backpressure
  * (`pipeline/collectors/nft.py:62-96`) → micro-batch triggers + rate
  * limits; Redis TTL state (`pipeline/utils/cache.py:135-182`) →
  * keyed state with ProcessingTime/EventTime timeout.
  *
  * 100 TB configuration (pure config — no operator here changes):
  *  - `spark.sql.streaming.stateStore.providerClass =
  *    ...state.RocksDBStateStoreProvider`: keyed state (dedup sets,
  *    session maps, join buffers) off the JVM heap onto local disk
  *    with incremental checkpointing; StreamOpsSpec pins identical
  *    results under this provider.
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger` on file sources
  *    bound each micro-batch (the backpressure the reference's
  *    bounded queue provided); prefer `Trigger.AvailableNow` for
  *    catch-up runs so rate limits still apply.
  *  - watermarks bound every stateful operator here — state size is
  *    O(keys in the watermark horizon), not O(stream history).
  */
object StreamOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class UserState(user_id: Long, last_event_id: Long, last_type: String,
    last_ts: java.sql.Timestamp)

  /** Tumbling 5-minute counts with a watermark: late data beyond
    * `delay` is dropped (Q-tumble + Q-late). Append-mode-safe. */
  def tumbling(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 10/5-minute windows (Q-slide). */
  def sliding(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))

  /** Streaming deduplication (Q-dedup streaming form): keep the FIRST
    * arrival per (user_id, event_type); the watermark bounds the dedup
    * state — keys older than `delay` are dropped from state, the scale
    * requirement (unbounded exact dedup state is a memory leak at
    * 100 TB/day; bounded-lateness dedup is the production shape).
    * Batch twin: [[StreamTwins.qDedupFirst]] (argmin by event time). */
  def dedupFirst(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Session windows with a 10-minute gap per user (Q-session). */
  def sessions(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Stream-stream interval join: purchases within one hour after the
    * same user's signup. Watermarks on BOTH sides + the time-band
    * condition bound the join state (Spark evicts buffered rows once
    * the watermark passes the band) — without them a stream-stream join
    * buffers forever. Batch twin: Relational.qIntervalJoin (oracle). */
  def signupPurchaseJoin(signups: DataFrame, purchases: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    s.join(p, col("user_id") === col("p_user")
      && col("p_ts") >= col("s_ts")
      && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("signup_id"), col("purchase_id"), col("s_ts"), col("p_ts"))
  }

  /** LEFT OUTER stream-stream interval join: signups that never saw a
    * purchase within the hour still emit (with null purchase columns)
    * once the watermark passes the end of their join window — the
    * state-expiry-driven emission that distinguishes streaming outer
    * joins from batch ones. Both sides' state is bounded by the
    * watermark + interval, the 100 TB requirement. Batch twin:
    * [[graft.ops.Relational.qIntervalJoin]] with a left join. */
  def signupPurchaseLeftJoin(signups: DataFrame, purchases: DataFrame,
      delay: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    s.join(p, col("user_id") === col("p_user")
      && col("p_ts") >= col("s_ts")
      && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("user_id"), col("signup_id"), col("purchase_id"), col("s_ts"), col("p_ts"))
  }

  /** Streaming near-dup flagging: incoming documents hash to banded
    * MinHash signatures IN the stream (the custom MinhashSlices
    * expression is a deterministic projection, so it runs unchanged in
    * a streaming plan) and equi-join the STATIC persisted band index —
    * zero stream state, candidates emitted at-least-once per colliding
    * band (downstream exact-verify dedupes, as in the batch pipeline).
    * This is [[graft.dedup.Dedup.candidatesAgainstIndex]] with the
    * delta arriving as a stream: the shape of continuous corpus
    * ingestion with online dedup against yesterday's index. */
  def streamingNearDupCandidates(docs: DataFrame, bandIndex: DataFrame): DataFrame =
    graft.dedup.Dedup.bandedSignatures(docs)
      .join(broadcast(bandIndex
        .select(col("band_idx"), col("band_hash"), col("doc_id").as("hist_id"))),
        Seq("band_idx", "band_hash"))
      .select(col("doc_id"), col("hist_id"))

  /** Stream-static enrichment: a streaming fact joined to a batch
    * dimension (the streaming form of Q-join-lookup / ref R3's per-row
    * trait enrichment). The static side broadcasts per micro-batch —
    * no stream state at all, the cheapest join a stream can do; a
    * dimension too big to broadcast becomes a stream-stream join with
    * the dim as a slowly-changing stream instead. */
  def enrichWithStatic(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  case class Fetch(cache_key: Long, event_id: Long, ts: java.sql.Timestamp, etag: String)

  case class CacheEntry(etag: String, fetched_at: java.sql.Timestamp,
    n_refresh: Long, n_replace: Long)

  case class Revalidation(cache_key: Long, event_id: Long, etag: String,
    outcome: String, n_refresh: Long, n_replace: Long)

  case class SwrServe(cache_key: Long, event_id: Long, served_etag: String,
    origin_etag: String, served_stale: Boolean)

  /** Conditional revalidation (ref R14, `pipeline/utils/api.py:140-152`):
    * keyed cache state where an origin response with a MATCHING
    * validator (same etag) is a 304 — the payload survives and only the
    * TTL clock (`fetched_at`) refreshes — while a CHANGED etag is a 200
    * that replaces the payload and restarts the TTL. Outcomes: `insert`
    * (first fetch, counted as a replace like the batch twin), `refresh`
    * (304), `replace` (200). Batch twin: [[StreamTwins.qRevalidate]].
    * Rows within a micro-batch fold in (ts, event_id) order so replays
    * are deterministic. */
  def revalidatingCache(fetches: Dataset[Fetch])(
      implicit spark: SparkSession): Dataset[Revalidation] = {
    import spark.implicits._
    fetches.groupByKey(_.cache_key)
      .flatMapGroupsWithState[CacheEntry, Revalidation](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Fetch], state: GroupState[CacheEntry]) =>
          val sorted = rows.toSeq.sortBy(f => (f.ts.getTime, f.event_id))
          sorted.iterator.map { f =>
            val (outcome, next) = state.getOption match {
              case Some(s) if s.etag == f.etag => // 304: refresh TTL, keep payload
                ("refresh", s.copy(fetched_at = f.ts, n_refresh = s.n_refresh + 1))
              case Some(s) => // 200: replace payload, restart TTL
                ("replace", CacheEntry(f.etag, f.ts, s.n_refresh, s.n_replace + 1))
              case None =>
                ("insert", CacheEntry(f.etag, f.ts, 0L, 1L))
            }
            state.update(next)
            Revalidation(key, f.event_id, f.etag, outcome, next.n_refresh, next.n_replace)
          }
      }
  }

  /** Stale-while-revalidate (ref R15, `api.py:205-206`): every hit is
    * answered from the CURRENT cache state immediately (the caller may
    * receive a stale payload), and the state then updates to the origin
    * payload — emit-stale-then-update. First fetch per key is a miss
    * (served = origin). Batch twin: [[StreamTwins.qSwrServe]]. */
  def staleWhileRevalidateCache(fetches: Dataset[Fetch])(
      implicit spark: SparkSession): Dataset[SwrServe] = {
    import spark.implicits._
    fetches.groupByKey(_.cache_key)
      .flatMapGroupsWithState[CacheEntry, SwrServe](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Fetch], state: GroupState[CacheEntry]) =>
          val sorted = rows.toSeq.sortBy(f => (f.ts.getTime, f.event_id))
          sorted.iterator.map { f =>
            val served = state.getOption.map(_.etag).getOrElse(f.etag)
            state.update(CacheEntry(f.etag, f.ts, 0L, 0L))
            SwrServe(key, f.event_id, served, f.etag, served != f.etag)
          }
      }
  }

  /** Keyed last-event state with TTL (Q-state-ttl): the streaming
    * equivalent of the reference's Redis `SET key EX ttl` + staleness
    * check (`cache.py:135-182`). State for a user expires `ttlMs` after
    * its last update (ProcessingTimeTimeout — wall-clock TTL, like
    * Redis EX); on expiry the entry is dropped and emitted as a
    * tombstone with event_id = -1. */
  /** Keyed UPSERT snapshot sink (foreachBatch): each micro-batch MERGES
    * into a parquet snapshot — latest row per key wins by (ts,
    * event_id) — rather than appending. This is the table-level form of
    * the reference's cache write (`SET key = payload`,
    * `cache.py:148-161`): last-state-wins per key, and IDEMPOTENT under
    * micro-batch replay because merging by key makes re-delivery a
    * no-op (the same rows can't win twice). The merge materializes via
    * localCheckpoint before overwriting so the snapshot being replaced
    * is never read lazily from under its own write. At scale the
    * snapshot is partitioned and only touched partitions rewrite. */
  def upsertSnapshotSink(events: DataFrame, path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.outputMode("update").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val incoming = batch.select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        val existing =
          if (new java.io.File(s"$path/_SUCCESS").exists())
            spark.read.parquet(path).select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          else incoming.limit(0)
        val merged = existing.unionByName(incoming)
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
          .select(col("user_id"), col("m.event_id").as("event_id"),
            col("m.event_type").as("event_type"), col("m.ts").as("ts"))
          .localCheckpointTracked() // materialize BEFORE overwriting the input files
        merged.write.mode("overwrite").parquet(path)
        ()
    }

  /** [[lastEventWithTtl]] re-expressed on Spark 4's transformWithState
    * — the successor to the (flat)mapGroupsWithState API and the shape
    * new stateful operators should take: named, individually-typed
    * state variables (`ValueState`/`ListState`/`MapState`) instead of
    * one opaque state object, explicit registered TIMERS instead of
    * the per-key setTimeoutDuration dance, and store-native TTL via
    * `TTLConfig` when eviction needs no callback. Runs ONLY on the
    * RocksDB state store provider — which is the 100 TB configuration
    * anyway. Semantics pinned identical to the fMGWS form in
    * StreamOpsSpec (same updates, same -1 tombstone on expiry). */
  class LastEventProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserState] {
    import org.apache.spark.sql.streaming.{TimerValues, ExpiredTimerInfo, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var last: ValueState[UserState] = _
    @transient private var armed: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[UserState]("last",
        Encoders.product[UserState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserState] = {
      import scala.math.Ordering.Implicits._
      val latest = rows.maxBy(e => (e.ts.getTime, e.event_id))
      val cur = if (last.exists()) Some(last.get()) else None
      val next =
        if (cur.exists(c => (c.last_ts.getTime, c.last_event_id) >
          ((latest.ts.getTime, latest.event_id)))) cur.get
        else UserState(userId, latest.event_id, latest.event_type, latest.ts)
      last.update(next)
      if (ttlMs > 0) {
        // one armed timer per key: re-arm on activity (sliding TTL,
        // matching the fMGWS twin's setTimeoutDuration semantics)
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        val at = timers.getCurrentProcessingTimeInMs + ttlMs
        getHandle.registerTimer(at)
        armed.update(at)
      }
      Iterator.single(next)
    }
    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[UserState] = {
      val dead = last.get()
      last.clear(); armed.clear()
      Iterator.single(UserState(userId, -1L, dead.last_type, dead.last_ts))
    }
  }

  /** transformWithState driver for [[LastEventProcessor]]. TimeMode
    * mirrors the fMGWS timeout selection: ProcessingTime only when a
    * TTL arms timers — ProcessingTime mode schedules CONTINUOUS
    * no-data micro-batches to evaluate timers, which a timerless query
    * must not pay (and which makes processAllAvailable never settle). */
  def lastEventWithTtlTws(events: Dataset[Event], ttlMs: Long)(
      implicit spark: SparkSession): Dataset[UserState] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_.user_id)
      .transformWithState(new LastEventProcessor(ttlMs), mode, OutputMode.Update())
  }

  def lastEventWithTtl(events: Dataset[Event], ttlMs: Long)(
      implicit spark: SparkSession): Dataset[UserState] = {
    import spark.implicits._
    // ttlMs <= 0 disables expiry (NoTimeout) — used by deterministic
    // tests; a positive TTL arms a wall-clock timeout per key.
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserState](
        OutputMode.Update(), timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val dead = state.get
            state.remove()
            Iterator(UserState(userId, -1L, dead.last_type, dead.last_ts))
          } else {
            import scala.math.Ordering.Implicits._
            val latest = rows.maxBy(e => (e.ts.getTime, e.event_id))
            val cur = state.getOption
            val next =
              if (cur.exists(c => (c.last_ts.getTime, c.last_event_id) >
                ((latest.ts.getTime, latest.event_id)))) cur.get
              else UserState(userId, latest.event_id, latest.event_type, latest.ts)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            Iterator(next)
          }
      }
  }
}
