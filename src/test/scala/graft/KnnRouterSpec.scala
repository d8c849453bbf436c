package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.{KnnPart, KnnRouter, VectorOps}

/** Laws of the filtered-ANN arm ROUTER: the decision must follow the
  * measured served/escalated split (escalation pair work vs the
  * partitioned arm's probe-join budget), the decisively correlated
  * shape must route to the per-value trie, the uncorrelated shape must
  * stay on the shared trie, a MILDLY clustered shape must stay shared
  * too (the rule follows cost, not label shape), and the routed result
  * must be byte-identical to the chosen arm's direct result. Runs at
  * trie scale where the arms genuinely diverge. */
class KnnRouterSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val k = 3

  /** The DECLARED router fixture (label 7 = tight σ=0.05 cluster,
    * 2400/12000) — the corpus q_knn_routed serves. */
  private lazy val dir: String = KnnRouter.fixtureDir(spark)

  /** A MILDLY clustered twin (σ = 0.15 — KnnPartSpec's stranding
    * fixture shape): it strands hundreds of queries, but the
    * escalation product stays under the pair budget, so the router
    * must keep it on the shared trie. */
  private lazy val mildDir: String = {
    val d = "target/knn_router_mild_test"
    val rnd = new scala.util.Random(29)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val hot = unit(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 12000).map { i =>
      if (i < 2400)
        (i.toLong, unit(hot.map(_ + rnd.nextGaussian() * 0.15))
          .map(_.toFloat).toSeq, 7)
      else
        (i.toLong, unit(Array.fill(64)(rnd.nextGaussian()))
          .map(_.toFloat).toSeq, i % 7)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("the decisively correlated predicate routes PARTITIONED, justified by the measured split") {
    val r = KnnRouter.routeFiltered(spark, dir, col("label") === 7, "label7", k)
    assert(r.nFilt == 2400 && r.n == 12000)
    // the decision rule is exactly the measured comparison — no hidden
    // dial: escalation pair work exceeds the partitioned probe budget
    assert(r.escalated * r.nFilt > r.pairBudget,
      s"fixture must make the correlated shape dominate: $r")
    assert(r.partitioned, s"correlated predicate must route partitioned: $r")
    // and the split is the pathology the arm exists for: most of the
    // corpus escalates (the shared trie separates the tight cluster,
    // so out-cluster probes find almost no label-7 mass)
    assert(r.escalated > r.n / 3, s"escalated mass must dominate: $r")
  }

  test("the uncorrelated predicate routes SHARED: every leaf keeps ~half its occupancy") {
    val r = KnnRouter.routeFiltered(spark, dir, col("vec_id") % 2 === 0, "par0", k)
    assert(!r.partitioned, s"uncorrelated predicate must stay shared: $r")
    assert(r.escalated * r.nFilt <= r.pairBudget, s"split must justify it: $r")
    // parity halves every leaf: under the ≥125 target occupancy no
    // occupied leaf drops below k = 3 matches, so escalation ≈ 0
    assert(r.escalated < r.n / 20, s"escalated set must be ~empty: $r")
    assert(math.abs(r.nFilt - r.n / 2) < r.n / 10)
  }

  test("a MILDLY clustered predicate stays SHARED: the rule follows cost, not shape") {
    val r = KnnRouter.routeFiltered(spark, mildDir, col("label") === 7, "label7_mild", k)
    // the σ=0.15 cluster genuinely strands queries (KnnPartSpec's
    // fixture measured ~510 at this seed) ...
    assert(r.escalated > 100, s"mild fixture must strand some queries: $r")
    // ... but the escalation product is smaller than a second standing
    // index's serving volume, so a per-value trie would COST more than
    // it saves — shared is the right arm and the router must say so
    assert(r.escalated * r.nFilt <= r.pairBudget, s"product must stay under budget: $r")
    assert(!r.partitioned, s"mild correlation must stay shared: $r")
  }

  test("routed == the chosen arm's direct result on both shapes, and the arms diverge") {
    val routedCorr = rows(KnnRouter.knnFilteredRouted(
      spark, dir, col("label") === 7, "label7", Some(7), k))
    assert(routedCorr == rows(KnnPart.knnFilteredPartitioned(spark, dir, 7, k)))
    val routedUnc = rows(KnnRouter.knnFilteredRouted(
      spark, dir, col("vec_id") % 2 === 0, "par0", None, k))
    assert(routedUnc == rows(VectorOps.knnFiltered(spark, dir, col("vec_id") % 2 === 0, k)))
    // the routing is load-bearing, not a relabeling: the shared arm's
    // answer under label = 7 differs at these diverged dials
    val sharedCorr = rows(VectorOps.knnFiltered(spark, dir, col("label") === 7, k))
    assert(sharedCorr != routedCorr,
      "fixture must diverge the arms or the route pin proves nothing")
  }

  test("q_knn_routed_range serves the shared arm under a generic range predicate") {
    // the declared fallback-arm gate (r12 VERDICT #3): a range is no
    // partition-key equality, so the shared arm must serve — and the
    // result must equal the direct shared-arm call under that predicate
    val got = rows(KnnRouter.qKnnRoutedRange(spark, dir, k))
    assert(got == rows(VectorOps.knnFiltered(
      spark, dir, col("label").between(3, 5), k)))
    assert(got.nonEmpty)
  }

  test("the route memo keys on the predicate, not just the caller's tag") {
    // a reused tag under a DIFFERENT predicate must measure its own
    // split, never inherit the other predicate's memoized route
    val a = KnnRouter.routeFiltered(spark, dir, col("label") === 7, "reused", k)
    val b = KnnRouter.routeFiltered(spark, dir, col("vec_id") % 2 === 0, "reused", k)
    assert(a.partitioned && !b.partitioned,
      s"second predicate under a reused tag must get its own route: $a / $b")
    assert(a.nFilt != b.nFilt)
  }

  test("a generic predicate without a partition key serves shared even when the split says partitioned") {
    // same correlated predicate, but expressed without a partition
    // key: the router cannot build a per-value trie for it, so the
    // shared arm (with its exact escalation) serves — correct, if
    // slower; never an error
    val got = rows(KnnRouter.knnFilteredRouted(
      spark, dir, col("label") === 7, "label7", None, k))
    assert(got == rows(VectorOps.knnFiltered(spark, dir, col("label") === 7, k)))
  }
}
