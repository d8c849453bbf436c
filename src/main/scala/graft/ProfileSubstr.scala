package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: time the component passes of
  * [[graft.text.SubstringDedup.qSubstrCorpus]] in isolation (gram+md5
  * emission, anchor self-join, run stitching) at a given scale dir. */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/scaledata/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    def gramsMd5 = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.TextHashes.positionedGramMd5(
          split(col("text"), " "), 20)).as(Seq("pos", "h")))
    def grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.TextHashes.positionedGramHash60(
          split(col("text"), " "), 20)).as(Seq("pos", "h")))
    grams.count() // warmup
    time("gram_emit_md5str")(gramsMd5.count())
    time("gram_emit_h60")(grams.count())
    val a = grams.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("h"))
    val b = grams.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("h"))
    time("anchor_join")(a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b")).count())
    time("full_query")(graft.text.SubstringDedup.qSubstrCorpus(spark, dir).count())
    spark.stop()
  }
}
