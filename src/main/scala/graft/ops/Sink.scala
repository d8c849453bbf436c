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

  /** TRAINING-SHARD WRITER — materialize the deterministic global
    * shuffle ([[graft.text.TrainPrep.shardRows]]) as `nShards`
    * independently sorted parquet streams: one exchange on `shard`,
    * a per-shard `(shard, pos)` sort, `partitionBy(shard)` directories.
    * This is the write path of a training run at any scale — at 100 TB
    * `nShards` is thousands and the per-shard sort IS the parallelism;
    * `maxRecordsPerFile` keeps a skewed shard splittable. Row order
    * inside each written file is the shard's permutation order, so a
    * loader streams each file start-to-finish (asserted in SinkSpec). */
  def writeShards(spark: SparkSession, dir: String, outPath: String,
      nShards: Int = 8): Unit =
    graft.text.TrainPrep.shardRows(spark, dir, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("shard")
      .parquet(outPath)

  /** Declared shard-write round trip: write the sharded corpus, read
    * the files back, and emit the per-shard MANIFEST a loader consumes
    * — doc/token totals plus permutation checksums (`sum(pos·doc_id)`,
    * `sum(pos·n_tok)`) that pin the position→document assignment, and
    * the final running-token value. The DuckDB oracle recomputes the
    * same manifest from the raw documents table, so the row is green
    * iff the writer laid down exactly the declared permutation. */
  def qShardWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = s"/root/repo/target/graft_shards/${dir.replaceAll(".*/", "")}"
    writeShards(spark, dir, out)
    spark.read.parquet(out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        max(col("cum_tokens")).as("final_cum_tokens"),
        sum(col("pos") * col("doc_id")).as("perm_check"),
        sum(col("pos") * col("n_tok")).as("order_tok_check"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }
}
