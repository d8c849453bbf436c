package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: what does the bucketed co-located layout buy on the
  * fact-fact join? Times the identical orders⋈lineitem revenue
  * aggregate (a) off raw parquet (shuffle join) and (b) off the
  * bucketed tables (no exchange below the join), steady-state
  * (second run), broadcast disabled so both forms pay their real
  * join. Usage: runMain graft.ProfileBucket [dir] */
object ProfileBucket {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/scaledata/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rev = graft.ops.Exact.money(col("l_extendedprice")) *
      (graft.ops.Exact.one - graft.ops.Exact.rate(col("l_discount")))
    def agg(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      o.filter(col("o_orderstatus") === "F")
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), graft.ops.Exact.decToDouble(sum(rev)).as("revenue"))
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$tag steady=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val t0 = System.nanoTime()
    val (ot, lt) = graft.ops.Sink.ensureBucketedFacts(spark, dir)
    println(f"bucketed layout write (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("shuffled-join") {
      agg(Tables.orders(spark, dir),
        Tables.lineitem(spark, dir).select(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount"))).count()
    }
    time("bucketed-join") {
      agg(spark.table(ot), spark.table(lt)).count()
    }
    spark.stop()
  }
}
