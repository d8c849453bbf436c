package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Q-sink (SURVEY §2.3): partitioned, compressed parquet writes with
  * the reference's skip-empty semantics (`pipeline/load/store.py:9-11`)
  * — promoted from the reference's single-file writer to the layout a
  * 100 TB table actually needs:
  *
  *  - `partitionBy` on a low-cardinality predicate column ⇒ readers
  *    with a filter on it scan only matching directories
  *    (PartitionFilters, verified in SinkSpec);
  *  - snappy compression (splittable, cheap to decode);
  *  - `maxRecordsPerFile` caps file size so a skewed partition can't
  *    produce an unsplittable monster file.
  */
object Sink {

  /** Write `df` partitioned by `cols`; skip empty inputs (ref parity).
    * Returns true iff data was written. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Boolean = {
    if (df.isEmpty) false
    else {
      df.write.mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(cols: _*)
        .parquet(path)
      true
    }
  }

  /** Demo pipeline: orders partitioned by status — the write side of
    * the partition-pruning contract. */
  def writeOrdersByStatus(spark: SparkSession, dir: String, outPath: String): Boolean =
    writePartitioned(
      Tables.orders(spark, dir).withColumn("status", col("o_orderstatus")),
      outPath, Seq("status"))
}
