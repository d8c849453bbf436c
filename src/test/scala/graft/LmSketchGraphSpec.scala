package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.TextOps
import graft.vector.VectorOps

/** Laws for the round-4 additions: LM perplexity scoring, the
  * count-min sketch, and PageRank centrality over the mutual-kNN
  * graph. Oracle queries pin exact values; these specs pin the
  * properties that must hold at ANY scale. */
class LmSketchGraphSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("perplexity: holdout split, positive surprisal, oov bounded") {
    val rows = TextOps.qPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 7 == 0, "scored docs must be the holdout split")
      val nBigrams = r.getLong(1)
      val nOov = r.getLong(2)
      val nll = r.getLong(3)
      assert(nBigrams > 0 && nOov >= 0 && nOov <= nBigrams)
      // add-one smoothing keeps every probability < 1 → surprisal > 0
      assert(nll > 0)
      assert(math.abs(r.getDouble(4) - nll.toDouble / nBigrams) < 1e-9)
    }
  }

  test("perplexity: per-doc surprisal stays inside the smoothing bounds") {
    // Add-one smoothing bounds every bigram's probability: the LEAST
    // probable event is an unseen continuation of the most frequent
    // head (p = 1/(maxH+V) → surprisal ln(maxH+V)); the MOST probable
    // is bounded below ln((h+V)/(n+1)) > 0. So every per-doc mean must
    // sit in (0, ln(maxH+V)] micro-nats.
    val perDoc = TextOps.qPerplexity(spark, sf)
    val maxMean = perDoc.agg(max(col("mean_nll_unats"))).head.getDouble(0)
    val train = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("t"))
    val v = train.agg(countDistinct(col("t"))).head.getLong(0)
    val maxH = train.groupBy(col("t")).count()
      .agg(max(col("count"))).head.getLong(0)
    val ceiling = math.floor(1e6 * math.log((maxH + v).toDouble) + 0.5)
    assert(maxMean > 0 && maxMean <= ceiling + 1,
      s"mean surprisal $maxMean outside (0, $ceiling]")
  }

  test("cms: estimates never underestimate and sketch is constant-size") {
    val rows = TextOps.qCms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
  }

  test("tokenPairs emits exactly the positioned-join pair multiset") {
    // the one-pass expression must reproduce the (doc_id, pos+off=pos)
    // equi-join formulation bit-for-bit — the oracle SQL still uses
    // the join form, so this equality IS the correctness bridge
    import spark.implicits._
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val a = toks.select(col("doc_id"), col("term").as("term_a"),
        explode(array(lit(1), lit(2))).as("off"), col("pos"))
      .select(col("doc_id"), (col("pos") + col("off")).as("pos"), col("term_a"))
    val b = toks.select(col("doc_id"), col("pos"), col("term").as("term_b"))
    val joined = a.join(b, Seq("doc_id", "pos"))
      .select(concat(col("term_a"), lit("\u0001"), col("term_b")).as("pair"))
      .as[String].collect().sorted.toSeq
    val onePass = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextHashes.tokenPairs(
        TextOps.tokens(col("text")), 2)).as("pair"))
      .as[String].collect().sorted.toSeq
    assert(joined.nonEmpty && joined == onePass)
  }

  test("pagerank: mass conservation, teleport floor, determinism") {
    val scale = 1000000000000L
    val pr = VectorOps.qPagerank(spark, sf)
    val rows = pr.collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getLong(1)).sum
    // integer truncation only LEAKS mass: total ≤ SCALE, and the leak
    // is bounded by ~(outdeg sum + n) ulps per round — far under 0.1%
    assert(total <= scale, "fixed-point PageRank must never create mass")
    assert(total >= scale - scale / 1000, s"leak too large: $total")
    // every node holds at least the damped teleport share
    val floorPr = (15L * (scale / n)) / 100L
    rows.foreach(r => assert(r.getLong(1) >= floorPr))
    // ranking must not be flat: the mutual-kNN graph has hubs
    assert(rows.map(_.getLong(1)).distinct.length > 1)
    // bitwise deterministic across a second run
    val again = VectorOps.qPagerank(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("triangles: degree-ordered count == unoriented 3-way-join twin") {
    val m = VectorOps.knnMutualEdges(spark, sf).select(col("a"), col("b"))
    // brute-force twin: every id-ordered vertex triple with all 3 edges
    // present in the canonical a<b list (counts each triangle once)
    val e1 = m.select(col("a").as("u"), col("b").as("v1"))
    val e2 = m.select(col("a").as("v1"), col("b").as("w"))
    val e3 = m.select(col("a").as("u"), col("b").as("w"))
    val naive = e1.join(e2, Seq("v1")).join(e3, Seq("u", "w")).count()
    val got = VectorOps.qTriangles(spark, sf)
    val triSum = got.agg(sum(col("n_tri"))).head().getLong(0)
    assert(triSum == 3 * naive,
      s"per-node counts must sum to 3x the ${naive} distinct triangles")
    // coefficient bounds: 0 < coeff <= 1 for every emitted node
    assert(got.filter(col("clustering_coeff") <= 0 || col("clustering_coeff") > 1)
      .count() == 0)
  }
}
