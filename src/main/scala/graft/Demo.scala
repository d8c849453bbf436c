package graft

import org.apache.spark.sql.SparkSession

import graft.etl.NftPipeline
import graft.multimodal.MultimodalOps
import graft.streaming.StreamOps

/** Usage sample / smoke driver for the non-query library surface:
  * the NFT ETL recomposition, the streaming operators, and the
  * multimodal plumbing. `sbt "runMain graft.Demo [outDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s: SparkSession = spark

    // --- NFT ETL: raw JSON rows -> quarantine -> cast -> explode -> parquet
    val raw = Seq(
      """{"identifier":"7","collection":"demo","contract":"0xfe","token_standard":"erc721","name":"Seven","metadata_url":"http://m/7","traits":[{"trait_type":"bg","value":"teal"}]}""",
      """{"identifier":"8","collection":"demo","contract":"0xfe","token_standard":"erc721","name":"Eight","metadata_url":null,"traits":null}""",
      """not json at all""").toDS()
    val written = NftPipeline.run(spark, raw, outDir)
    val nfts = spark.read.parquet(s"$outDir/nfts.parquet").count()
    val traits = spark.read.parquet(s"$outDir/traits.parquet").count()
    println(s"[demo] nft-pipeline: written=$written nfts=$nfts traits=$traits")

    // --- streaming: tumbling counts over a MemoryStream-less socketless
    // file source is awkward in a demo; run the batch-twin equivalence
    val twinTotal = streaming.StreamTwins.qTumble(spark, "/root/testdata/sf0.001")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    println(s"[demo] stream-twin tumble total events=$twinTotal")

    // --- streaming stateful op on a bounded stream via rate source
    val evs = Seq(
      StreamOps.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "a", 1.0),
      StreamOps.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1, "b", 2.0),
      StreamOps.Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 2, "c", 3.0)).toDS()
    // batch Dataset through the same typed state logic shape (streaming
    // execution of lastEventWithTtl is covered in StreamOpsSpec)
    val latest = evs.groupByKey(_.user_id).mapGroups { (u, it) =>
      val e = it.maxBy(x => (x.ts.getTime, x.event_id)); (u, e.event_id, e.event_type)
    }.collect().sortBy(_._1).toSeq
    println(s"[demo] latest-per-user=$latest")

    // --- multimodal: synthetic media -> features -> per-kind stats
    val media = MultimodalOps.syntheticMedia(spark, 12)
    val feats = MultimodalOps.extractFeatures(media)
    val stats = MultimodalOps.mediaStats(feats).collect()
      .map(r => s"${r.getString(0)}:n=${r.getLong(1)}").mkString(" ")
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000).count()
    println(s"[demo] multimodal stats: $stats frames=$frames")

    // --- partitioned sink + partition-pruned read-back
    val sinkOut = s"$outDir/orders_by_status"
    graft.ops.Sink.writeOrdersByStatus(spark, "/root/testdata/sf0.001", sinkOut)
    val pruned = spark.read.parquet(sinkOut)
      .filter(org.apache.spark.sql.functions.col("status") === "F").count()
    println(s"[demo] partitioned sink: rows(status=F)=$pruned")

    // --- embedding near-dup (LSH-bucketed cosine)
    val dups = graft.vector.VectorOps.embeddingDupPairs(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), threshold = 0.45).count()
    println(s"[demo] embedding pairs cos>=0.45: $dups")

    // --- skew salting + as-of join through the public API
    val big = spark.range(10000).select(
      org.apache.spark.sql.functions.lit(7L).as("k"),
      org.apache.spark.sql.functions.col("id").as("payload"))
    val small = spark.range(10).select(
      org.apache.spark.sql.functions.col("id").as("k"),
      org.apache.spark.sql.functions.col("id").as("dim"))
    val saltedN = graft.ops.Skew.saltedJoin(big, small, "k", "payload", 8).count()
    val asofN = graft.ops.AsofJoin.qAsof(spark, "/root/testdata/sf0.001").count()
    println(s"[demo] salted-join rows=$saltedN asof rows=$asofN")

    // --- DSv2 paged-API source with transient-failure retry
    val api = spark.read.format("graft.sources.PagedSource")
      .option("rows", 2000).option("pageSize", 100).option("failEvery", "5").load()
    val (apiN, rep) = graft.obs.Metrics.measure(spark)(api.count())
    println(s"[demo] paged-source rows=$apiN partitions=${api.rdd.getNumPartitions} " +
      s"tasks=${rep.tasks} failed=${rep.failedTasks}")

    println(s"[demo] OK out=$outDir")
    spark.stop()
  }
}
