package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the dedup/ANN hot paths (not part of
  * the declared surface). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    import graft.dedup.Dedup._
    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sigs = bandedSignatures(docs).persist()
    time("signatures")(sigs.count())
    val a = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct().persist()
    time("band-join candidates")(candidates.count())
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    time("candDocs")(candDocs.count())
    val shDf = docs
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .filter(size(split(col("text"), " ")) >= ShingleK)
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("sh"))
      .persist()
    time("shingle sets (verify)")(shDf.count())
    val out = candidates
      .join(shDf.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shDf.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.5)
    time("verify join+jaccard")(out.count())
    time("full qMinhashPairs fresh")(qMinhashPairs(spark, sfDir).count())

    // IVF stages
    import graft.ops.Exact._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    time("emb.count")(emb.count())
    val centroids = emb.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg((decToDouble(sum(dec(col("col"), 9))) / count(lit(1))).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("c_label"), transform(col("pm"), p => p.getField("m")).as("cv"))
    time("ivf centroids")(centroids.count())
    time("full qSimIvf fresh")(graft.vector.VectorOps.qSimIvf(spark, sfDir).count())
    time("full qSimhashPairs")(qSimhashPairs(spark, sfDir).count())
    time("full qSimhash")(qSimhash(spark, sfDir).count())
    time("full qDupClusters")(qDupClusters(spark, sfDir).count())
    spark.stop()
  }
}
