package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SubstrDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val grams = Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(graft.functions.TextHashes.positionedGramHash60(
            split(col("text"), " "), 20)).as(Seq("pos", "h")))
      val freq = grams.groupBy("h").agg(count(lit(1)).as("c"))
      val stats = freq.agg(count(lit(1)).as("n_anchors"),
        sum(col("c")).as("n_grams"),
        sum(col("c") * col("c")).as("pair_mass"),
        max(col("c")).as("max_c"),
        sum(when(col("c") > 50, lit(1)).otherwise(lit(0))).as("hot_anchors"),
        sum(when(col("c") > 50, col("c") * col("c")).otherwise(lit(0))).as("hot_pair_mass")).head
      println(s"DIAG $dir $stats")
    }
    spark.stop()
  }
}
