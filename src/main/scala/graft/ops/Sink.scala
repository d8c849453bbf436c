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

  /** Declared sink round-trip query: write orders partitioned by
    * status, read the files back, and emit a canonical projection. The
    * oracle compares against the ORIGINAL `orders` table — so the row
    * is green iff the sink preserved every value through the
    * partition-layout write (including the status column that became a
    * directory key). The write itself is the operator under test and
    * runs on every execution. */
  def qSink(spark: SparkSession, dir: String): DataFrame = {
    val out = s"/root/repo/target/graft_sink/${dir.replaceAll(".*/", "")}"
    writeOrdersByStatus(spark, dir, out)
    spark.read.parquet(out)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        graft.ops.Exact.tstr(col("o_orderdate")).as("odate"),
        col("o_orderpriority"), col("status").cast("string").as("status"))
      .orderBy(col("o_orderkey"))
  }
}
