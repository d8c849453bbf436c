package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Sink
import graft.vector.VectorOps

class SinkVectorDupSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}
  import spark.implicits._

  test("partitioned sink: writes status=... dirs, reader prunes partitions") {
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/orders"
    assert(Sink.writeOrdersByStatus(spark, sf, out))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("status=")), s"no partition dirs: ${dirs.toSeq}")
    // read back with a partition filter: plan must show partition pruning
    val df = spark.read.parquet(out).filter(col("status") === "F")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"partition filter not pushed:\n$plan")
    assert(df.count() == Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count())
  }

  test("shard writer: shard=... dirs, in-file row order is the permutation order") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/docs"
    Sink.writeShards(spark, sf, out, nShards = 8)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == (0 until 8).map(s => s"shard=$s"),
      s"unexpected shard layout: ${dirs.toSeq}")
    // every shard dir: physical row order inside each parquet file must
    // be pos-ascending (a loader streams files start-to-finish), and
    // cum_tokens must be the running sum in that order
    dirs.foreach { d =>
      new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val rows = spark.read.parquet(f.getAbsolutePath)
            .select("pos", "n_tok", "cum_tokens").collect()
          val pos = rows.map(_.getLong(0))
          assert(pos.toSeq == pos.sorted.toSeq, s"${f.getName}: rows not in pos order")
          var cum = 0L
          rows.sortBy(_.getLong(0)).foreach { r =>
            cum += r.getLong(1)
            assert(r.getLong(2) == cum, s"${f.getName}: cum_tokens drifts at pos ${r.getLong(0)}")
          }
        }
    }
    // round trip: the union of all shards is exactly the corpus
    val back = spark.read.parquet(out)
    assert(back.count() == Tables.documents(spark, sf).count())
    assert(back.select("doc_id").distinct().count() == back.count())
  }

  test("partitioned sink: empty input skipped (ref store.py parity)") {
    val out = java.nio.file.Files.createTempDirectory("sinkempty").toString + "/x"
    val empty = Tables.orders(spark, sf).filter(lit(false))
    assert(!Sink.writePartitioned(empty, out, Seq("o_orderstatus")))
    assert(!new java.io.File(out).exists())
  }

  test("embedding near-dup: planted duplicates found, unrelated vectors not") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = Seq.tabulate(50)(i => (i.toLong, vec()))
    // plant near-dups: ids 100/101 are tiny perturbations of id 0 and 1
    val planted = Seq(
      (100L, base(0)._2.map(x => x + 1e-4f)),
      (101L, base(1)._2.map(x => x * 1.0001f)))
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = VectorOps.embeddingDupPairs(emb, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), s"missed planted dup: $pairs")
    assert(pairs.contains((1L, 101L)), s"missed planted dup: $pairs")
    assert(pairs.size == 2, s"false positives: $pairs")
  }
}
