package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for the SPILL-TIER dial study (r6): runs named declared
  * queries steady-state with the shuffle/spill directory and shuffle
  * partition count as EXPLICIT dials, reporting wall time plus the
  * task-metrics spill/shuffle volumes ([[graft.obs.Metrics]]).
  *
  * Rationale: the sf100 TPC-H composites (q_tpch18/2/8) are bound by
  * this box's single-disk shuffle tier, and r5 documented "on a cluster,
  * width is the fix" as an assertion. This harness produces the number:
  * the same query with `spark.local.dir` on tmpfs (/dev/shm — a proxy
  * for cluster-class aggregate shuffle bandwidth: RAM-speed, no seek
  * penalty) vs the one disk, at 32 vs 256 shuffle partitions. The
  * tmpfs time approximates plan cost; (disk − tmpfs) is the
  * environment's spill-tier cost; and the partitions dial shows the
  * seek-multiplication effect that made 256 partitions SLOWER on disk
  * (random IO) while harmless/beneficial on tmpfs.
  *
  * `spark.local.dir` is fixed at SparkContext start, so each config is
  * one fresh JVM: drive one invocation per (localDir, partitions) cell.
  *
  * Usage: runMain graft.ProbeSpill <localDir> <shufflePartitions> <q1,q2,..> [sfDir]
  * Output: one line per query,
  *   SPILL <q> dir=<localDir> parts=<n> first=<s> second=<s> shufW_gb=<g> spill_gb=<g>
  */
object ProbeSpill {
  def main(args: Array[String]): Unit = {
    val localDir = args(0)
    val parts = args(1)
    val qs = args(2).split(",")
    val sfDir =
      if (args.length > 3) args(3) else "/root/repo/target/scaledata/sf100"
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      // keep AQE's coalescing from erasing the partitions dial: the
      // study measures the dial itself, so pin initialPartitionNum too
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val first = (System.nanoTime() - t0) / 1e9
      // let the ContextCleaner reap run-1's shuffle files before run 2:
      // without this, two ~25 GB shuffle footprints coexist and the
      // one-disk cell dies on a full filesystem (measured r6)
      System.gc(); Thread.sleep(3000)
      val t1 = System.nanoTime()
      val (_, rep) = graft.obs.Metrics.measure(spark) {
        SparkEntry.queries(q)(spark, sfDir).count()
      }
      val second = (System.nanoTime() - t1) / 1e9
      println(f"SPILL $q dir=$localDir parts=$parts first=$first%.2f " +
        f"second=$second%.2f shufW_gb=${rep.shuffleBytesWritten / 1e9}%.2f " +
        f"spill_gb=${rep.diskSpilled / 1e9}%.2f memspill_gb=${rep.memorySpilled / 1e9}%.2f")
    }
    spark.stop()
  }
}
