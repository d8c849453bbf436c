package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: time the component passes of [[graft.text.TextOps.qCms]]
  * in isolation (gram emission, sketch build, exact count, full query)
  * to locate the dominant cost at a given scale dir. */
object ProfileCms {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/scaledata/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextOps.{cmsBuckets, tokens}
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val t = col("t")
    def grams = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .filter(size(t) >= 3)
      .select(explode(graft.functions.TextHashes.wordGramsAll(t, 3)).as("gram"))
    // warmup
    grams.count()
    time("gram_emit")(grams.count())
    time("gram_md5")(grams.select(cmsBuckets(col("gram"), 4).as("b")).count())
    time("posexplode_only")(grams.select(posexplode(cmsBuckets(col("gram"), 4))).count())
    time("explode_only")(grams.select(explode(cmsBuckets(col("gram"), 4))).count())
    val sketchDf = grams.select(posexplode(cmsBuckets(col("gram"), 4)))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)))
    sketchDf.explain("formatted")
    time("sketch_build")(sketchDf.count())
    time("sketch_flat")(grams.select(cmsBuckets(col("gram"), 4).as("b"))
      .select(explode(col("b")).as("bucket"),
        spark_partition_id().as("ignore"))
      .groupBy(col("bucket")).agg(count(lit(1))).count())
    time("exact_distinct")(grams.select(col("gram")).distinct().count())
    time("exact_count")(grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(50).count())
    time("full_qcms")(graft.text.TextOps.qCms(spark, dir).count())
    spark.stop()
  }
}
