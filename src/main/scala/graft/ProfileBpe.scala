package graft

import org.apache.spark.sql.SparkSession

/** Evidence runner for DISTRIBUTED BPE training at non-toy size:
  * train up to `BPE_MERGES` (default 512) merges over each given
  * corpus and print one JSON line per corpus with the vocabulary
  * size, rounds completed, the corpus-scale aggregate nothing else
  * repays (first-round cost), and per-round steady-state times.
  *
  * The claim under measurement: after the ONE corpus-sized
  * word-frequency aggregate, every training round runs on the
  * |vocab|-sized table, so round time is flat across corpus decades
  * (sf0.1 → sf1 → sf10 = 100× the data) — the property that makes
  * the merge-table build viable at 100 TB. Results recorded in
  * PERF.md / SCALING_r05.json.
  *
  * Usage: runMain graft.ProfileBpe [dir ...]
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1",
        "/root/repo/target/scaledata/sf1", "/root/repo/target/scaledata/sf10")
    val nMerges = sys.env.getOrElse("BPE_MERGES", "512").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val vocabSize = spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("word"))
        .distinct().count()
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      val learned = graft.text.Bpe.trainDistributed(spark, dir, nMerges,
        (_, s) => times += s)
      val wall = (System.nanoTime() - t0) / 1e9
      def ms(v: Double) = math.round(v * 1000) / 1000.0
      // round 0 pays the corpus aggregate; steady state = median of the rest
      val steady = times.drop(1).sorted
      val median = if (steady.isEmpty) 0.0 else steady(steady.length / 2)
      println(s"""{"dir":"$dir","vocab":$vocabSize,"rounds":${learned.length},""" +
        s""""wall_sec":${ms(wall)},"first_round_sec":${ms(times.headOption.getOrElse(0.0))},""" +
        s""""median_round_sec":${ms(median)},"p90_round_sec":${ms(
          if (steady.isEmpty) 0.0 else steady((steady.length * 9) / 10))}}""")
    }
    spark.stop()
  }
}
