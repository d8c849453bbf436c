package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Event-telemetry analytics over the `events` stream table: time-grid
  * resampling with zero-fill, conversion funnels, and retention cohorts
  * — the queries a training-data pipeline runs over its own ingestion
  * telemetry. All deterministic + oracle-checked.
  */
object EventAnalytics {

  /** Q-resample: hourly grid per user with zero-filled gaps. The grid
    * is generated (sequence+explode), not scanned — the left join
    * against hourly aggregates is grid-sized, independent of event
    * volume. */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id") < 10)
    val bounds = e.agg(
      date_trunc("hour", min(col("ts"))).as("t0"),
      date_trunc("hour", max(col("ts"))).as("t1"))
    val users = e.select(col("user_id")).distinct()
    val grid = users.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val agg = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    grid.join(agg, Seq("user_id", "hour"), "left")
      .select(col("user_id"), tstr(col("hour")).as("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("h"))
      .limit(5000)
  }

  /** Q-funnel: signup → first-purchase-after-signup conversion, with
    * floor-second conversion latency (cross-engine-stable epoch math). */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val signup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(signup, Seq("user_id"))
      .filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id"), col("s_ts")).agg(min(col("ts")).as("p_ts"))
    // total-user count rides a broadcast single-row join, not a
    // driver-side action
    val nUsers = e.agg(countDistinct(col("user_id")).as("n_users"))
    signup.join(conv.select(col("user_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("secs")),
        Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_signup"),
        count(col("secs")).as("n_converted"),
        coalesce(sum(col("secs")), lit(0L)).as("sum_convert_secs"))
      .crossJoin(broadcast(nUsers))
      .select(col("n_users"), col("n_signup"), col("n_converted"), col("sum_convert_secs"))
  }

  /** Q-retention: day-offset retention from each user's first-seen
    * cohort day (distinct active users per offset, first 15 days). */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("c0"))
    e.join(cohort, Seq("user_id"))
      .select(col("user_id"), datediff(col("d"), col("c0")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= 14)
      .distinct()
      .groupBy(col("day_offset"))
      // rows are already (user_id, day_offset)-distinct — a plain count
      // avoids a second dedup pass over the same key
      .agg(count(col("user_id")).as("n_users"))
      .orderBy(col("day_offset"))
  }

  /** SCD2 dimension versioning + point-in-time fact join — the
    * warehouse-standard "which version of the dimension was current
    * when this fact happened" chain: signup events become versioned
    * profile rows with [valid_from, valid_to) intervals via lead()
    * over a TOTAL order (ts, event_id — duplicate timestamps yield
    * zero-width intervals that can never match, keeping the join
    * deterministic), the open version carries valid_to = null, and
    * purchases join their containing interval. The equi-key is
    * user_id with the interval band as a post-join filter — same
    * hash-join shape as the interval join, never a nested loop; each
    * fact matches EXACTLY one version by interval disjointness. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from"), col("event_id"))
    val dim = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("valid_from"), col("event_id"), col("value"))
      .withColumn("version_no", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    facts.join(dim, Seq("user_id"))
      .filter(col("p_ts") >= col("valid_from")
        && (col("valid_to").isNull || col("p_ts") < col("valid_to")))
      .select(col("user_id"), col("purchase_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("pts"),
        col("version_no"),
        decToDouble(col("value").cast("decimal(18,2)")).as("version_value"),
        col("valid_to").isNull.cast("long").as("is_current"))
      .orderBy(col("purchase_id"))
  }

  /** SWEEP-LINE PEAK CONCURRENCY — "how many sessions were open at
    * once, and when did the peak happen": each event opens a 10-minute
    * interval; the classic +1/−1 boundary sweep with a running sum
    * finds each day's maximum overlap. The capacity-planning /
    * admission-control query every ingestion service runs over its own
    * telemetry (the reference bounds concurrency statically at 15
    * workers / queue 500, `pipeline/collectors/nft.py:47-99`; this
    * measures the demand curve those dials should come from).
    *
    * Scale shape: intervals are SPLIT at day boundaries (explode over
    * the covered days — ≤ 2 segments for a 10-minute interval), so the
    * running sum partitions by day: no global single-task sort, each
    * day's sweep is an independent partition and the 100 TB dial is
    * simply a finer grain (hour buckets) in the same plan. Boundary
    * multiset {(t, ±1)} ordered by (t, delta) — closes before opens at
    * the same instant, so touching intervals never overcount; equal
    * (t, delta) rows get arbitrary-but-equivalent prefix ranks (the
    * (t, run) multiset is order-independent), making max(run) and its
    * first timestamp deterministic in both engines. */
  def qConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
      .select(col("ts"), (col("ts") + expr("INTERVAL 10 MINUTES")).as("te"))
    val segs = e
      .select(col("ts"), col("te"),
        explode(sequence(to_date(col("ts")),
          to_date(col("te") - expr("INTERVAL 1 MICROSECOND")),
          expr("INTERVAL 1 DAY"))).as("day"))
      .select(col("day"),
        greatest(col("ts"), col("day").cast("timestamp")).as("s"),
        least(col("te"), (col("day") + 1).cast("timestamp")).as("x"))
    val points = segs.select(col("day"), col("s").as("t"), lit(1L).as("delta"))
      .unionByName(segs.select(col("day"), col("x").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = points.withColumn("run", sum(col("delta")).over(w))
    // one pass: lexicographic max of (run, −t) gives the peak AND its
    // earliest instant in a single aggregate — no second window pass,
    // no join-back recompute of the sweep
    swept
      .select(col("day"), struct(col("run"),
        (-unix_micros(col("t").cast("timestamp"))).as("negt")).as("rt"))
      .groupBy(col("day"))
      .agg(max(col("rt")).as("m"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"),
        col("m.run").as("peak"),
        tstr(timestamp_micros(-col("m.negt"))).as("first_peak_t"))
      .orderBy(col("d"))
  }

  /** Q-attribution: first-touch / last-touch revenue attribution — for
    * every purchase, the click that gets credit under each model: the
    * user's most recent click at or before the purchase (last-touch)
    * and the user's earliest click overall (first-touch). The standard
    * marketing/causal join that, at 100 TB, must NOT be an interval
    * join: both credits resolve inside ONE per-user event-time window
    * pass (`last(..., ignoreNulls)` running state is O(1) per row;
    * first-touch is an unbounded-frame min over the same partitioning
    * — same single shuffle on user_id).
    *
    * Touchless purchases (no prior click) surface with null last-touch
    * rather than being dropped — the attribution gap is part of the
    * answer. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("user_id"))
    e
      .withColumn("lt_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(ord))
      .withColumn("ft_ts",
        min(when(col("event_type") === "click", col("ts"))).over(all))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), tstr(col("ts")).as("t"),
        col("value"),
        tstr(col("lt_ts")).as("last_touch_t"),
        tstr(col("ft_ts")).as("first_touch_t"),
        col("lt_ts").isNull.cast("long").as("unattributed"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q-ewma: exponentially-decayed rolling feature with a DYADIC decay
    * (α = 1/2) truncated at 4 taps — each tap weight is an exact
    * binary fraction and the 4-term dag is fixed, so the float result
    * is bit-identical in any IEEE engine regardless of plan (no
    * accumulation-order dependence, unlike a true recursive EWMA or a
    * frame-summed window). The standard "recent activity" feature a
    * telemetry pipeline attaches before training.
    *
    * Scale shape: one per-user event-time window shuffle; 3 `lag`
    * reads per row, O(1) state. */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma",
        col("value")
          + coalesce(lag(col("value"), 1).over(w), lit(0.0)) * 0.5
          + coalesce(lag(col("value"), 2).over(w), lit(0.0)) * 0.25
          + coalesce(lag(col("value"), 3).over(w), lit(0.0)) * 0.125)
      .filter(col("user_id") < 200)
      .select(col("user_id"), col("event_id"), tstr(col("ts")).as("t"),
        col("value"), col("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q-ooo: out-of-order-arrival audit — per event type, how many
    * events arrive with an event time EARLIER than something already
    * seen for the same user, and how late (exact integer microseconds:
    * `unix_micros`, so both engines do integer subtraction — no
    * interval arithmetic to diverge). This distribution is the input
    * every watermark delay (`withWatermark`) is tuned from: the
    * streaming ops' lateness bound is a claim about exactly this
    * statistic.
    *
    * The driver corpus is perfectly ordered per user, so the audit
    * replays arrival under a deterministic jitter model (md5-derived
    * 0–3 slot displacement per event — the hash-sampling idiom), the
    * way a watermark design review replays a feed with simulated
    * network reordering. Every comparison and subtraction the audit
    * makes is then exercised against nonzero lateness.
    *
    * Scale shape: one per-user shuffle (same exchange any
    * sessionization pays) carrying two window sorts, then a map-side-
    * combinable aggregate; state is running-max-sized, output is
    * event-type-sized. */
  def qOoo(spark: SparkSession, dir: String): DataFrame = {
    // ts arrives TIMESTAMP_NTZ from the driver corpus; the session is
    // pinned UTC, so the NTZ→LTZ cast is value-preserving and
    // unix_micros matches DuckDB's epoch_us on the naive timestamp
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .withColumn("seq", row_number().over(wSeq).cast("long"))
      .withColumn("jit",
        conv(substring(md5(concat(lit("arr:"), col("event_id").cast("string"))), 1, 1),
          16, 10).cast("long") % 4)
      .withColumn("arr", col("seq") + col("jit"))
    val wArr = Window.partitionBy(col("user_id"))
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = col("prev_max") > col("tsu")
    base.withColumn("prev_max", max(col("tsu")).over(wArr))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(late, 1L).otherwise(0L)).as("n_late"),
        coalesce(max(when(late, col("prev_max") - col("tsu"))), lit(0L))
          .as("max_late_us"),
        sum(when(late, col("prev_max") - col("tsu")).otherwise(0L))
          .as("sum_late_us"))
      .orderBy(col("event_type"))
  }
}
