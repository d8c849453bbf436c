package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** KEYLESS band (range) join at scale. The equi-key interval join
  * ([[Relational.qIntervalJoin]]) rides its key through a hash join;
  * with NO equi key Spark's only native plan is a broadcast nested
  * loop — O(|L|·|R|) compares and a broadcast ceiling. The binned form
  * manufactures an equi key from the band itself: bucketize both sides
  * by the tolerance, replicate ONE side into its three candidate
  * buckets (|dt| ≤ tol ⇒ bucket distance ≤ 1), equi-join on the
  * bucket, then apply the exact band predicate. Cost: 3× one side
  * through the shuffle and only intra-bucket compares — the standard
  * shape for time-proximity joins over 100 TB event streams.
  *
  * Each qualifying pair matches in exactly one bucket (the left row's
  * own), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Generic binned band join: rows of `left` × `right` with
    * |lTs − rTs| ≤ tolSec (second-truncated timestamps, matching the
    * cross-engine `floor(epoch)` discipline). */
  def binned(left: DataFrame, right: DataFrame, lTs: Column, rTs: Column,
      tolSec: Long): DataFrame = {
    val lSec = unix_timestamp(lTs)
    val rSec = unix_timestamp(rTs)
    val lb = left.withColumn("__bin", floor(lSec / tolSec))
    val rBin = floor(rSec / tolSec)
    val rb = right.withColumn("__bin", explode(array(rBin - 1, rBin, rBin + 1)))
    lb.join(rb, "__bin")
      .filter(abs(unix_timestamp(lTs) - unix_timestamp(rTs)) <= tolSec)
      .drop("__bin")
  }

  /** Declared query: cross-user signup/purchase co-occurrence within
    * ±30 s — no shared key at all, the case the equi-key interval join
    * cannot express. PlanSpec asserts the physical plan is a real join
    * on the bucket, never a nested loop. */
  def qRangeJoin(spark: SparkSession, dir: String, tolSec: Long = 30): DataFrame = {
    val e = Tables.events(spark, dir)
    val s = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    binned(s, p, col("s_ts"), col("p_ts"), tolSec)
      .select(col("signup_id"), col("purchase_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("dt_secs"))
      .orderBy(col("signup_id"), col("purchase_id"))
  }
}
