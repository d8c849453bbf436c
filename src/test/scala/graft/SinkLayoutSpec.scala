package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-lever pins: bucketed co-located joins, small-file
  * compaction, and MMR diversity selection. */
class SinkLayoutSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  import spark.implicits._

  test("bucketed fact join runs with no exchange below the join") {
    val (ot, lt) = graft.ops.Sink.ensureBucketedFacts(spark, sf)
    // at fixture scale the planner prefers broadcast (which bypasses
    // bucketing); pin the at-scale shape by disabling it here
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(ot)
        .join(spark.table(lt), $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // bucket layout co-locates both sides: zero shuffle in the join
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // the declared aggregate pays only the priority-partials exchange
      val aggPlan = graft.ops.Sink.qBucketJoin(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!aggPlan.replaceAll("(?s)HashAggregate.*", "").contains("ShuffleExchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction collapses the small-file layout and keeps every row") {
    val frag = "/root/repo/target/graft_compact_spec/frag"
    val out = "/root/repo/target/graft_compact_spec/out"
    val src = Tables.events(spark, sf)
    src.repartition(16).write.mode("overwrite")
      .partitionBy("event_type").parquet(frag)
    val (nBefore, nAfter) = graft.ops.Sink.compact(spark, frag, out, "event_type")
    assert(nBefore >= 16, s"fragmentation fixture too small: $nBefore")
    // one file per partition value after compaction
    assert(nAfter === src.select($"event_type").distinct().count())
    // content untouched
    val a = spark.read.parquet(out)
    assert(a.count() === src.count())
    assert(a.agg(sum($"event_id")).head.getLong(0) ===
      src.agg(sum($"event_id")).head.getLong(0))
  }

  test("mmr picks the most relevant first, never repeats, and diversifies") {
    val out = graft.vector.VectorOps.qMmr(spark, sf).cache()
    val rows = out.orderBy($"rn").collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(1)).distinct.length === 8)
    // first pick = argmax relevance against the query vector, and its
    // score is exactly half that relevance (empty diversity penalty)
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = emb.filter($"vec_id" === 0).select($"v".as("qv"))
    val rel = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", graft.vector.VectorOps.cosine($"qv", $"v").as("rel"))
      .cache()
    val topRow = rel.orderBy($"rel".desc, $"vec_id").limit(1).head
    assert(rows.head.getLong(1) === topRow.getLong(0))
    assert(rows.head.getDouble(2) === 0.5 * topRow.getDouble(1))
    // second pick's score is exactly 0.5·rel − 0.5·sim(pick2, pick1)
    val id1 = rows(0).getLong(1); val id2 = rows(1).getLong(1)
    val rel2 = rel.filter($"vec_id" === id2).head.getDouble(1)
    val pair = emb.filter($"vec_id" === id1).select($"v".as("v1"))
      .crossJoin(emb.filter($"vec_id" === id2).select($"v".as("v2")))
      .select(graft.vector.VectorOps.cosine($"v1", $"v2")).head.getDouble(0)
    assert(rows(1).getDouble(2) === 0.5 * rel2 - 0.5 * pair)
    rel.unpersist()
    out.unpersist()
  }
}
