package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: run every Bench warmup step LOUDLY (the bench's
  * warmup swallows failures by design — a broken warm must not kill
  * the run — so when a standing artifact silently lands in query
  * timings, this names the step that threw). */
object ProbeWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def step(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"WARM $name ok ${(System.nanoTime() - t0) / 1e9}%.2f s") }
      catch { case e: Throwable =>
        println(s"WARM $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    step("knn-index")(graft.vector.VectorOps.knnIndexed(spark, sfDir))
    step("ivf-centroids")(graft.vector.VectorOps.ivfCentroids(spark, sfDir).count())
    step("knn-clusters")(graft.vector.VectorOps.qKnnClusters(spark, sfDir).count())
    step("fixtures")(graft.sources.Fixtures.ensure(spark))
    step("minhash-pairs")(graft.dedup.Dedup.minhashPairs(spark, sfDir).count())
    step("retrieval")(graft.text.Retrieval.warm(spark, sfDir))
    step("ledger")(graft.etl.Ledger.warm(spark, sfDir))
    step("compact-input")(graft.ops.Sink.warmCompactInput(spark, sfDir))
    step("q_emb_clusters")(graft.sources.Fixtures.qEmbClusters(spark, sfDir).count())
    step("q_ledger_zorder")(graft.etl.Ledger.qLedgerZorder(spark, sfDir).count())
    step("q_ledger_incr_join")(graft.etl.Ledger.qLedgerIncrJoin(spark, sfDir).count())
    spark.stop()
  }
}
