package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Bucketing, Skew}

class SkewSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}
  import spark.implicits._

  test("band-index incremental dedup: index side reads Exchange-free") {
    import graft.dedup.Dedup
    val table = "band_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(s"spark-warehouse/$table")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    val docs = Tables.documents(spark, sf)
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    Dedup.writeBandIndex(history, table, buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = Dedup.candidatesAgainstIndex(spark, delta, table)
      cand.count() // finalize AQE
      val plan = cand.queryExecution.executedPlan.toString
      // exactly the delta and the distinct shuffle; the index never moves
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin"), s"expected SMJ against the bucketed index:\n$plan")
      assert(joinPart.split("Exchange").length - 1 == 1,
        s"only the delta side may shuffle into the join:\n$plan")
      // candidate set identical to the unbucketed computation
      val live = graft.dedup.Dedup.bandedSignatures(delta)
        .join(graft.dedup.Dedup.bandedSignatures(history)
          .select(col("band_idx"), col("band_hash"), col("doc_id").as("hist_id")),
          Seq("band_idx", "band_hash"))
        .select(col("doc_id"), col("hist_id")).distinct()
      assert(cand.collect().toSet == live.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zipfian skew fixture: salted layout balances tasks, unsalted violates 2x-median") {
    graft.sources.Fixtures.ensure(spark)
    val fact = spark.read.parquet(graft.sources.Fixtures.skewFactPath)
    val parts = 32
    // emulate the join exchange exactly: hash-partition on the join keys
    // and count rows per resulting partition
    def partSizes(keys: org.apache.spark.sql.Column*): Seq[Long] = {
      val df = fact.withColumn("__salt", pmod(hash(col("row_id")), lit(32)))
      df.repartition(parts, keys: _*)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .groupBy(col("p")).count()
        .collect().map(_.getLong(1)).toSeq.sorted
    }
    def median(xs: Seq[Long]): Long = xs(xs.size / 2)
    val salted = partSizes(col("k"), col("__salt"))
    val unsalted = partSizes(col("k"))
    assert(salted.max <= 2 * median(salted),
      s"salted: no task >2x median (max=${salted.max}, median=${median(salted)})")
    assert(unsalted.max > 2 * median(unsalted),
      s"fixture must actually stress: unsalted max=${unsalted.max} vs median=${median(unsalted)}")
    // the declared query keeps the shuffle-join shape (no broadcast escape)
    val plan = graft.ops.Skew.qSkewJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "q_skew_join must exercise the shuffle join path")
  }

  test("salted join == plain join on skewed data") {
    // 90% of rows share one hot key
    val big = spark.range(20000)
      .select(when(col("id") % 10 === 0, col("id") % 100).otherwise(lit(7L)).as("k"),
        col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("dim"))
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum("payload"), sum("dim")).head
    val salted = Skew.saltedJoin(big, small, "k", "payload", 8)
      .agg(count(lit(1)), sum("payload"), sum("dim")).head
    assert(plain == salted)
  }

  test("salted join spreads the hot key across nSalts partitions") {
    val big = spark.range(1000).select(lit(7L).as("k"), col("id").as("payload"))
    val salts = big.withColumn("__salt", pmod(hash(col("payload")), lit(8)))
      .select(countDistinct("__salt")).head.getLong(0)
    assert(salts == 8)
  }

  test("persisted LSH index: probes shuffle into the index layout, index Exchange-free") {
    import org.apache.spark.sql.functions._
    val table = "lsh_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(s"spark-warehouse/$table")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    val emb = Tables.embeddings(spark, sf)
    graft.vector.VectorOps.writeLshIndex(emb, table, buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val queries = emb.filter(col("vec_id") < 5)
      val got = graft.vector.VectorOps.topkAgainstIndex(spark, queries, table)
      got.count() // finalize AQE
      val plan = got.queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin"), s"expected SMJ against the bucketed index:\n$plan")
      assert(joinPart.split("Exchange").length - 1 == 1,
        s"only the probe side may shuffle into the join:\n$plan")
      // ranking identical to the live (unpersisted) LSH computation
      val live = graft.vector.VectorOps.qSimTopkLsh(spark, sf)
        .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
      assert(got.collect().toSet == live.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental dedup: bloom pre-pass prunes history pre-shuffle, no false negatives") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val fp = (d: org.apache.spark.sql.Column) =>
      md5(lower(trim(regexp_replace(d, "\\s+", " "))))
    val bloom = delta.select(fp(col("text")).as("fp")).stat.bloomFilter("fp", 1000000L, 0.01)
    val histTotal = history.count()
    val histKept = history.select(fp(col("text")).as("fp"))
      .filter(graft.functions.Blooms.mightContain(col("fp"), bloom)).count()
    // md5 fingerprints are ~uniform: survivors = true matches + ~fpp tail
    assert(histKept < histTotal / 2,
      s"bloom pruned nothing: $histKept of $histTotal history rows kept")
    // zero false negatives: every history fp that truly matches a delta fp survives
    val trueMatches = history.select(fp(col("text")).as("fp"))
      .join(delta.select(fp(col("text")).as("fp")), Seq("fp"), "left_semi")
    assert(trueMatches.filter(!graft.functions.Blooms.mightContain(col("fp"), bloom)).count() == 0)
    // and the declared query's plan carries the probe
    val plan = graft.dedup.Dedup.qIncrementalDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected the bloom probe in the incremental dedup plan:\n$plan")
  }

  test("bucketed join plans with zero Exchange") {
    // in-memory catalog forgets tables between JVMs but the warehouse
    // dirs persist — clear both
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    // at test scale the dim side fits broadcast, which would bypass
    // bucketing entirely — disable it to expose the large-large path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.count() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
