package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fidelity laws of the deterministic corpus scaler — the scaling
  * slopes in PERF.md are only meaningful if the replica preserves the
  * source corpus' SHAPE (join fan-outs, group cardinalities, near-dup
  * density) while growing its volume. */
class ScaleGenSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  private lazy val out: String = {
    val dir = "target/scalegen_test"
    ScaleGen.scale(spark, sf, dir, 3)
    dir
  }

  test("star schema: row counts scale by copies, FKs stay closed") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val liSrc = Tables.lineitem(spark, sf)
    assert(li.count() == 3 * liSrc.count())
    // no orphan lineitems: every l_orderkey resolves
    val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count()
    assert(orphans == 0)
    // per-key fan-out distribution is EXACTLY the source's, 3x over
    val fanSrc = liSrc.groupBy(col("l_orderkey")).count()
      .groupBy(col("count")).count().as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    val fanOut = li.groupBy(col("l_orderkey")).count()
      .groupBy(col("count")).count().as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    assert(fanOut == fanSrc.map { case (k, v) => k -> 3 * v })
  }

  test("documents: copy 0 byte-identical; near-dup density linear (within-copy jaccard preserved, cross-copy separated)") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val src = Tables.documents(spark, sf)
    val n = src.count()
    // copy 0 is the source, byte for byte
    assert(docs.filter(col("doc_id") < n).select(col("doc_id"), col("text"))
      .except(src.select(col("doc_id"), col("text"))).count() == 0)
    // the content-hashed token map is injective per copy, so within-copy
    // shingle jaccard is exactly preserved: pair (a,b) in copy 1 has the
    // same jaccard as (a,b) in copy 0
    val t = split(col("text"), " ")
    def jacOfCopy(offset: Long) = {
      val d = docs.filter(col("doc_id") >= offset && col("doc_id") < offset + 20)
        .select((col("doc_id") - offset).as("id"), t.as("toks"))
      val a = d.select(col("id").as("ia"), col("toks").as("ta"))
      val b = d.select(col("id").as("ib"), col("toks").as("tb"))
      a.crossJoin(b).filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          graft.functions.TextHashes.shingleJaccard(col("ta"), col("tb")).as("j"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    val j0 = jacOfCopy(0L)
    val j1 = jacOfCopy(n)
    assert(j0.keySet == j1.keySet)
    j0.foreach { case (k, v) => assert(math.abs(v - j1(k)) < 1e-12, s"pair $k: $v vs ${j1(k)}") }
    // cross-copy: a doc vs its own copy stays far below the 0.7 near-dup
    // threshold (salting changes ~70% of shingles)
    val cross = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("ia"), t.as("ta"))
      .join(docs.filter(col("doc_id") >= n && col("doc_id") < n + 20)
        .select((col("doc_id") - n).as("ia"), t.as("tb")), Seq("ia"))
      .select(graft.functions.TextHashes.shingleJaccard(col("ta"), col("tb")).as("j"))
      .agg(max(col("j"))).head.getDouble(0)
    assert(cross < 0.3, s"cross-copy jaccard must sit below the separation band, got $cross")
  }

  test("embeddings: copies are unit-norm, near their parent, far from siblings") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val src = Tables.embeddings(spark, sf)
    val n = src.count()
    assert(emb.count() == 3 * n)
    val withNorm = emb.withColumn("norm",
      sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
    assert(withNorm.filter(abs(col("norm") - 1.0) > 1e-3).count() == 0, "unit vectors")
    // parent-copy cosine moderate (cluster geometry kept), sibling lower
    val pc = emb.filter(col("vec_id") < n).select(col("vec_id").as("id"), col("v").as("a"))
      .join(emb.filter(col("vec_id") >= n && col("vec_id") < 2 * n)
        .select((col("vec_id") - n).as("id"), col("v").as("b")), Seq("id"))
      .select(graft.vector.VectorOps.cosine(col("a"), col("b")).as("c"))
      .agg(avg(col("c"))).head.getDouble(0)
    assert(pc > 0.4 && pc < 0.8, s"parent-copy cosine should be moderate, got $pc")
  }
}
