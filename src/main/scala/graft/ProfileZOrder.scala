package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: cold + steady wall for the z-order clustered write
  * at a given dir (the write IS the operator — cost is the range
  * exchange + per-task sort + parquet encode). */
object ProfileZOrder {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/scaledata/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.ops.ZOrder.qZorderWrite(spark, dir).count()
      println(f"q_zorder_write pass $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
