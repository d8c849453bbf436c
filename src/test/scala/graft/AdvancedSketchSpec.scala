package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Advanced

/** Sketch scale paths vs their exact counterparts: the approximate
  * operators must honor their published error guarantees on the real
  * corpus — that's what makes them safe substitutes at 100 TB. */
class AdvancedSketchSpec extends AnyFunSuite {
  import SparkFixture.spark
  import SparkFixture.sf

  test("count-min sketch dominates exact counts and stays within eps*N") {
    val exact = Advanced.qHeavyHitters(spark, sf, minSupport = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cms = Advanced.heavyHittersCms(spark, sf, eps = 0.001)
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS must never under-count: key $k exact=$c est=$est")
      assert(est <= c + math.ceil(0.001 * n).toLong * 3,
        s"key $k over-estimate beyond bound: exact=$c est=$est n=$n")
    }
  }

  test("PQ recall is high on clustered data (where recall is structural)") {
    import graft.vector.VectorOps
    import graft.sources.Fixtures
    val emb = Fixtures.embClusterFixture(spark).cache()
    val cent = VectorOps.labelCentroids(emb)
    val truth = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val all = VectorOps.pqTopk(emb.select(col("vec_id"), col("v")), cent,
      nQueries = 200, k = 5) // every vector queries
      .select(col("q_id"), col("vec_id")).collect()
    val hits = all.count(r => truth(r.getLong(0)) == truth(r.getLong(1)))
    val recall = hits.toDouble / all.length
    emb.unpersist()
    assert(recall > 0.9, f"same-cluster recall $recall%.2f should be >0.9 on clustered data")
  }

  test("Lloyd-refined PQ codebooks never increase quantization error") {
    import graft.vector.VectorOps
    import graft.sources.Fixtures
    // noisy clusters: label seeds are a poor fit, refinement has room
    val emb = Fixtures.embClusterFixture(spark, noise = 0.6)
      .select(col("vec_id"), col("label"), col("v")).cache()
    val corpus = emb.select(col("vec_id"), col("v"))
    val seed = VectorOps.labelCentroids(emb).localCheckpoint()
    val refined = VectorOps.refinePqCodebooks(corpus, seed)
    val e0 = VectorOps.pqQuantizationError(corpus, seed)
    val e1 = VectorOps.pqQuantizationError(corpus, refined)
    emb.unpersist()
    assert(e1 <= e0 + 1e-9,
      f"Lloyd round must not increase quantization error: seed=$e0%.4f refined=$e1%.4f")
    assert(e1 < e0 * 0.999, f"expected measurable improvement on noisy seeds: $e0%.4f -> $e1%.4f")
  }

  test("Lloyd-refined codebooks rank at least as well as label seeds") {
    import graft.vector.VectorOps
    import graft.sources.Fixtures
    // noisy clusters: label seeds are a poor fit, refinement has room
    val emb = Fixtures.embClusterFixture(spark, noise = 0.6)
      .select(col("vec_id"), col("label"), col("v")).cache()
    val corpus = emb.select(col("vec_id"), col("v"))
    val truth = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val seed = VectorOps.labelCentroids(emb).localCheckpoint()
    def recall(cent: org.apache.spark.sql.DataFrame): Double = {
      val all = VectorOps.pqTopk(corpus, cent, nQueries = 200, k = 5)
        .select(col("q_id"), col("vec_id")).collect()
      all.count(r => truth(r.getLong(0)) == truth(r.getLong(1))).toDouble / all.length
    }
    val rSeed = recall(seed)
    val rRefined = recall(VectorOps.refinePqCodebooks(corpus, seed))
    emb.unpersist()
    assert(rRefined >= rSeed - 1e-9,
      f"refined codebooks must not rank worse: seed=$rSeed%.3f refined=$rRefined%.3f")
  }

  test("approx percentile lands within a ±2% rank band of the target quantile") {
    // rank-based check (value bands conflate rank error with value
    // gaps: exact percentile() interpolates, the sketch returns a real
    // element — compare positions, not interpolated values)
    val bands = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.48)").as("m_lo"),
        expr("percentile(o_totalprice, 0.52)").as("m_hi"),
        expr("percentile(o_totalprice, 0.88)").as("p_lo"),
        expr("percentile(o_totalprice, 0.92)").as("p_hi"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    Advanced.approxPercentile(spark, sf).collect().foreach { r =>
      val (mLo, mHi, pLo, pHi) = bands(r.getString(0))
      assert(r.getDouble(2) >= mLo && r.getDouble(2) <= mHi,
        s"median rank drift: ${r.getDouble(2)} outside [$mLo, $mHi]")
      assert(r.getDouble(3) >= pLo && r.getDouble(3) <= pHi,
        s"p90 rank drift: ${r.getDouble(3)} outside [$pLo, $pHi]")
    }
  }
}
