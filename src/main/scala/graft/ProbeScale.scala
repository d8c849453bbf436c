package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for per-query SCALING-SLOPE probes: runs the named
  * declared queries twice (cold + steady-state) at sf0.1 and at the
  * locally generated sf1 ([[ScaleGen]]), printing both timings. The
  * second-run ratio between the two dirs is the data-cost slope with
  * JIT/plan/codegen fixed cost removed — the number that exposed the
  * q_knn_join bucket-occupancy quadratic and the q_fuzzy fractional
  *-sample quadratic (see PERF.md round-4 section).
  *
  * Usage: runMain graft.ProbeScale q_a,q_b[,...] [dir1,dir2,...]
  * (default dirs: sf0.1 and the ScaleGen'd sf1)
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // Deliberately NOT raising AQE initialPartitionNum for big scale
      // dirs: measured at sf100, 256 initial partitions made the
      // spill-bound queries ~60% SLOWER (q_tpch18 159->252 s, q_knn_join
      // 49->158 s) — this box has one disk, so more shuffle partitions
      // just multiply random IO. On a real cluster the same dial is the
      // right one (shuffle capacity scales with executors).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = args(0).split(",")
    val dirs =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/scaledata/sf1")
    for (dir <- dirs; q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"PROBE $q $dir first=$t1%.2f second=$t3%.2f")
    }
    spark.stop()
  }
}
