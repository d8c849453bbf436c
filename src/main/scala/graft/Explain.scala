package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan/profiling aid: `sbt "runMain graft.Explain <query|minhash-stages> [sfDir]"`
  * prints the formatted physical plan and the timed count of a declared
  * query — or stage-by-stage timings for the minhash pipeline. */
object Explain {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("q1_pricing")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[explain] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    what match {
      case "minhash-stages" =>
        val docs = Tables.documents(spark, sfDir)
        import graft.dedup.Dedup
        timed("docs scan")(docs.count())
        val sigs = Dedup.bandedSignatures(docs)
        timed("banded signatures")(println(s"  rows=${sigs.count()}"))
        val a = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
        val b = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
        val cand = a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
        timed("candidates")(println(s"  pairs=${cand.count()}"))
        timed("full qMinhashPairs")(println(s"  out=${Dedup.qMinhashPairs(spark, sfDir).count()}"))
      case q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        df.explain("formatted")
        timed(s"$q count")(println(s"  rows=${df.count()}"))
        timed(s"$q count (2nd)")(df.count())
    }
    spark.stop()
  }
}
