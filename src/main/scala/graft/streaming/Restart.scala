package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.ops.Exact._

/** Checkpoint-restart exactly-once, run for real (SURVEY §2.3 streaming
  * family; ref R5's resumable collector loop,
  * `pipeline/collectors/nft.py:62-96`, whose `next` cursor is exactly a
  * source offset persisted across process lifetimes).
  *
  * Two stream LIFETIMES share one checkpoint: lifetime 1 drains the
  * first half of a file-source directory into a parquet sink and stops;
  * more files land; lifetime 2 starts the SAME query (same checkpoint,
  * same sink) and must process ONLY the new files — the file source's
  * seen-files log and the sink's `_spark_metadata` commit log together
  * are the exactly-once contract that lets a 100 TB ingestion survive a
  * restart without reprocessing or dropping a file. The declared query
  * aggregates the sink afterwards: a replayed first half doubles the
  * counts, a dropped second half halves them, and an uncommitted-file
  * read surfaces through the sink's commit log — any of the three
  * breaks the oracle hash, which recomputes the aggregate straight from
  * the staged subset.
  *
  * Scale shape: the staged subset is a deterministic 5% slice of
  * `events` (the semantics under test are offset tracking, not volume —
  * the per-file bookkeeping cost is identical at any file size), the
  * sink append is partition-parallel, and the restart cost is reading
  * two commit logs, never rescanning delivered data.
  */
object Restart {

  private def rm(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** One bounded lifetime: drain whatever the file source considers new
    * under this checkpoint into the sink, then stop (AvailableNow — the
    * bounded run of the same continuous query). */
  private def lifetime(spark: SparkSession, stage: String, sink: String,
      ckpt: String, schema: org.apache.spark.sql.types.StructType): Unit =
    spark.readStream.schema(schema).parquet(stage)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

  def qStreamRestart(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll(".*/", "")
    val stage = graft.GraftPaths.sink("graft_restart_stage", tag)
    val sink = graft.GraftPaths.sink("graft_restart_sink", tag)
    val ckpt = graft.GraftPaths.sink("graft_restart_ckpt", tag)
    Seq(stage, sink, ckpt).foreach(rm(spark, _))

    val subset = Tables.events(spark, dir)
      .filter(col("user_id") % 20 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val schema = subset.schema

    // half 1 staged, lifetime 1 drains it
    subset.filter(col("event_id") % 2 === 0)
      .write.mode("append").parquet(stage)
    lifetime(spark, stage, sink, ckpt, schema)
    // half 2 lands as NEW files in the same source dir; lifetime 2
    // resumes from the shared checkpoint and must deliver only these
    subset.filter(col("event_id") % 2 === 1)
      .write.mode("append").parquet(stage)
    lifetime(spark, stage, sink, ckpt, schema)

    // batch read of a streaming sink honors _spark_metadata: only files
    // the sink COMMITTED are visible — delivered-exactly-once is what
    // this aggregate measures
    spark.read.schema(schema).parquet(sink)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }
}
