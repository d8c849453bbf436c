package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Retrieval
import graft.vector.RetrievalEval

/** Semantic pins for the retrieval-quality batch (BM25, rank fusion,
  * NDCG/MRR eval, MaxSim, correlation matrix). Oracle hashes are the
  * correctness gate; these assert the invariants a hash can't see —
  * metric bounds, score monotonicity, and the plan shapes the 100 TB
  * posture depends on. */
class RetrievalSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bm25: scores non-increasing, every hit contains a query term") {
    val rows = Retrieval.qBm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "top-10 must be score-descending")
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= Retrieval.queryTerms.length))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getLong(0)).toSeq
    val withTerm = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .filter(Retrieval.queryTerms
        .map(t => array_contains(split(col("text"), " "), t))
        .reduce(_ || _))
      .count()
    assert(withTerm == ids.length, "a scored doc lacks all query terms")
  }

  test("bm25: global top-k plans as TakeOrderedAndProject") {
    val plan = planOf(Retrieval.qBm25(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("rank fusion: rrf recomputes from the two ranks, shortlists bounded") {
    val rows = Retrieval.qRankFusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rt = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rb.nonEmpty || rt.nonEmpty, "fused doc missing from both shortlists")
      assert(rb.forall(x => x >= 1 && x <= 20) && rt.forall(x => x >= 1 && x <= 20))
      def c(o: Option[Long]): Long =
        o.map(x => math.floor(1e9 / (60.0 + x)).toLong).getOrElse(0L)
      assert(r.getLong(1) == c(rb) + c(rt), "rrf != contrib(rank_b) + contrib(rank_t)")
    }
  }

  test("ndcg: metric bounds hold and recall matches the hit count") {
    val rows = RetrievalEval.qNdcg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSys, nHits) = (r.getLong(1), r.getLong(2))
      val (dcgU, ndcg, mrrU, recall) =
        (r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6))
      assert(nHits <= nSys && nSys <= RetrievalEval.evalK)
      assert(dcgU >= 0 && dcgU <= RetrievalEval.idcgU(), "DCG above ideal")
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(mrrU >= 0 && mrrU <= 1000000L)
      assert(recall == nHits.toDouble / RetrievalEval.evalK)
      if (nHits == 0) assert(dcgU == 0 && mrrU == 0 && ndcg == 0.0)
    }
    // discount table is strictly decreasing; ideal is its sum
    val d = RetrievalEval.dcgU()
    assert(d.zip(d.tail).forall { case (a, b) => a > b })
    assert(RetrievalEval.idcgU() == d.sum)
  }

  test("maxsim: per-query ranking bounded by the query-vector budget") {
    val rows = RetrievalEval.qMaxsim(spark, sf).collect()
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Set(0, 1))
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // ≤ 4 query vectors, each max-cosine ≤ 1 (scaled 1e6, +rounding)
      assert(scores.head <= 4000002L)
    }
  }

  test("corr: matrix bounded, one aggregate pass over the fact") {
    val df = graft.ops.MlStats.qCorr(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    // ONE scan of lineitem: sufficient statistics, not six passes
    // (AQE's toString repeats nodes under "== Initial Plan ==" — count
    // only the final section)
    val plan = planOf(df).split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"corr matrix must read the fact exactly once:\n$plan")
  }
}
