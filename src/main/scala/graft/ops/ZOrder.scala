package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-ORDER CLUSTERED WRITES — the multi-dimensional data-layout lever
  * a 100 TB table needs: interleave the bits of two quantized
  * dimensions into one Morton key, cluster files on its prefix, and
  * every engine's plain min/max file- and row-group statistics prune
  * scans filtered on EITHER dimension (a single-column sort gives
  * narrow stats on that column only; the z-curve gives ~√-law range
  * widths on both). Nothing here is engine-private: the layout is
  * ordinary parquet + directory buckets, the skipping falls out of
  * stats every reader already collects.
  *
  * Determinism contract (what the oracle pins): quantization is exact
  * integer arithmetic against the table's true min/max — floor((x−mn)
  * ·(2ᵇ−1) / span) — and the bucket is a fixed-width z prefix, so the
  * file assignment is a pure function of the row, not of sampled range
  * boundaries. The DuckDB oracle recomputes bucket/count/stat columns
  * from the raw table; the query reads them from the WRITTEN files —
  * green iff the writer laid down exactly the declared clustering.
  */
object ZOrder {

  /** Morton-interleave the low `bits` of two non-negative longs:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. 2·bits ≤ 62. */
  def interleave2(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Exact-integer range quantization to `bits` bits: floor((x − mn)
    * ·(2ᵇ−1) / span). The double division is exact-enough by
    * construction — numerator < 2⁴⁰, so the quotient's ulp is orders
    * below the 1/span gap to the next integer — and truncation of a
    * non-negative quotient is floor, matching DuckDB's integer `//`. */
  def quantize(x: Column, mn: Long, mx: Long, bits: Int): Column =
    floor((x - lit(mn)) * lit((1L << bits) - 1) /
      lit(math.max(1L, mx - mn))).cast("long")

  val Bits = 16          // per-dimension quantization width
  val BucketBits = 4     // 2^4 = 16 z-prefix file buckets
  val Epoch = "1992-01-01"

  /** lineitem with its z key over (l_partkey, shipdate-day) and the
    * fixed-width prefix bucket. Stats (`mn/mx` per dim) are one exact
    * aggregate — at 100 TB these are the standing table statistics. */
  def lineitemZ(spark: SparkSession, dir: String): DataFrame =
    lineitemZWithCount(spark, dir)._1

  /** [[lineitemZ]] plus the row count from the SAME statistics
    * aggregate (r13): the declared write query needs both the dims'
    * min/max and the table size (to scale write parallelism), and ran
    * two full-scan jobs to get them — count() and the min/max agg.
    * One aggregate row carries all five scalars, one scan. */
  def lineitemZWithCount(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        datediff(col("l_shipdate"), lit(Epoch)).cast("long").as("day"))
    val stats =
      li.agg(min("l_partkey"), max("l_partkey"), min("day"), max("day"),
        count(lit(1))).head()
    val Seq(mnP, mxP, mnD, mxD, rows) = stats.toSeq.map(_.asInstanceOf[Long])
    val z = interleave2(
      quantize(col("l_partkey"), mnP, mxP, Bits),
      quantize(col("day"), mnD, mxD, Bits), Bits)
    (li.withColumn("z", z)
      .withColumn("zfile", shiftright(col("z"), 2 * Bits - BucketBits)), rows)
  }

  /** Write `df` clustered by its `zfile` bucket, z-sorted inside each
    * bucket (so row groups inside a file carry nested narrow stats).
    * Write parallelism is decoupled from the bucket count: a RANGE
    * partition on (zfile, z) splits each bucket into contiguous z-runs,
    * so `nWriteTasks` tasks sort/write in parallel (vs one task per
    * bucket — 16 tasks sorting 600 M rows at sf100) while every file
    * still lands in exactly one zfile dir as one sorted run. Range
    * boundaries are sampled, so FILE split points vary run to run; the
    * dir-level CONTENT (and hence the manifest oracle and per-file
    * stat-width property) does not. */
  def writeZOrdered(df: DataFrame, path: String,
      nWriteTasks: Int = 4 << BucketBits): Unit =
    df.repartitionByRange(nWriteTasks, col("zfile"), col("z"))
      .sortWithinPartitions(col("zfile"), col("z"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("zfile")
      .parquet(path)

  /** Declared round trip: z-order-write lineitem, read the files back,
    * and emit the per-bucket manifest — count, the min/max stats a
    * pruning reader would consult on BOTH dimensions, and a z checksum
    * pinning the Morton computation. Oracle recomputes from source. */
  def qZorderWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.GraftPaths.sink("graft_zorder", dir.replaceAll(".*/", ""))
    // Write parallelism scaled to the data: ~2 M rows per range task,
    // floored at one task per bucket and capped at 4 per bucket. The
    // cap is the measured sf100 spill-free width (64 tasks on 600 M
    // rows: 456→97 s, PERF.md); the floor keeps small corpora at the
    // bucket count (the fixed 64-task width was pure scheduling
    // overhead on sf0.1's 600 k rows — the r6 3.7 s regression). The
    // divisor is tuned on the only decade that lands BETWEEN floor and
    // cap: sf10's 60 M rows measured 19.5 s steady at 16 tasks
    // (10 M/task — half the cores idle through the sort) and 11.6 s at
    // 30 (2 M/task); widening further to 60 tasks (1 M/task) bought
    // nothing (11.8 s — this box is one disk, so past ~a task per core
    // the writers queue on IO, PERF.md r7). The count that sizes it is
    // a parquet metadata-weight job; layout CONTENT is
    // task-count-invariant. (r13: the count rides the stats aggregate —
    // one scan job instead of two.)
    val (zdf, rows) = lineitemZWithCount(spark, dir)
    val tasks = math.min(4 << BucketBits,
      math.max(1 << BucketBits, (rows / 2000000L).toInt))
    writeZOrdered(zdf, out, tasks)
    spark.read.parquet(out)
      .groupBy(col("zfile").cast("long").as("zfile"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        sum(col("z")).as("z_sum"))
      .orderBy(col("zfile"))
  }
}
