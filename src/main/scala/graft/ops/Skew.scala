package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and co-location tooling for 100 TB joins.
  *
  * AQE's skew-join splitting (on by default) covers most hot-key cases
  * at runtime; [[saltedJoin]] is the explicit fallback for pathological
  * keys AQE can't split (e.g. a single key holding >executor-memory
  * rows on the build side of a broadcast). [[Bucketing]] removes the
  * shuffle from repeated large-large joins entirely by co-locating both
  * tables on the join key at write time.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a small-ish side:
    * the big side's rows scatter across `nSalts` sub-keys (derived
    * deterministically from `saltSrc`, any column that varies within a
    * hot key); the small side replicates `nSalts`-fold. Result equals
    * the plain inner join row-for-row (verified in SkewSpec), but the
    * hot key's rows now land on `nSalts` reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSrc: String, nSalts: Int): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(col(saltSrc)), lit(nSalts)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-stress declared query: the zipfian fixture's hot key holds
    * ~22 % of all fact rows (~7× the 32-partition average), so an
    * unsalted shuffle join would put 7× the median load on one task.
    * The salted path scatters it across 32 sub-keys; SkewSpec asserts
    * the resulting partition histogram is ≤2× median while the
    * unsalted layout violates it. The dim side carries a MERGE hint:
    * broadcasting 1,600 rows would of course be the faster plan here —
    * the point of the declared query is the shuffle-join shape that a
    * >broadcast-threshold dim forces at 100 TB, exercised for real. */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Fixtures.ensure(spark)
    val fact = spark.read.parquet(graft.sources.Fixtures.skewFactPath)
    val dim = spark.read.parquet(graft.sources.Fixtures.skewDimPath).hint("merge")
    saltedJoin(fact, dim, "k", "row_id", 32)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        Exact.decToDouble(sum(Exact.money(col("v")) * Exact.dec(col("weight"), 2)))
          .as("sum_vw"))
      .orderBy(col("k"))
  }
}

/** Bucketed-table co-location: write both sides bucketed (and sorted)
  * by the join key; subsequent joins read pre-partitioned data and plan
  * a SortMergeJoin with NO Exchange on either side (asserted in
  * SkewSpec). At 100 TB this converts every recurring fact-fact join
  * from 2 shuffles to 0. */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
