package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorOps

/** Laws of the occupancy-adaptive kNN dial (the LSH-forest trie):
  * above oracle scale every vector rests in exactly ONE trie leaf,
  * leaf occupancy is capped (hot cells split deeper, cold cells stay
  * shallow), and the leaf set is prefix-free — the properties that
  * bound per-vector candidate volume by a constant at every corpus
  * size, skew included. The fixture corpus is deliberately SKEWED
  * (a 1200-vector cluster around one direction) because index-blind
  * splitting passes a uniform corpus and fails exactly this one. */
class KnnDialSpec extends AnyFunSuite {
  import SparkFixture.spark

  test("dial: gate corpora stay flat 4-plane; adaptive depths track ceil(n/125)") {
    assert(VectorOps.knnDialFor(1) == ((4, 4)))
    assert(VectorOps.knnDialFor(2000) == ((4, 4)), "oracle-scale corpora must stay flat")
    assert(VectorOps.knnDialFor(2001) == ((4, 12)), "adaptive path opens just above gate scale")
    assert(VectorOps.knnDialFor(200000) == ((10, 18)))  // sf10: ceil(n/125)=1600
    assert(VectorOps.knnDialFor(2000000) == ((13, 21))) // sf100: 16000
  }

  /** 3000 unit vectors, 1200 of them clustered (σ=0.25 around one
    * seeded direction) — a hot LSH cell chain the trie must split. */
  private lazy val dir: String = {
    val d = "target/knn_dial_test"
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val hot = unit(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 3000).map { i =>
      val v =
        if (i < 1200) unit(hot.map(_ + rnd.nextGaussian() * 0.25))
        else unit(Array.fill(64)(rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("adaptive trie: one leaf per vector, occupancy capped, leaf set prefix-free") {
    val (emb, p0, maxD) = VectorOps.knnIndexed(spark, dir)
    assert(p0 == 4 && maxD == 12)
    val occ = emb.groupBy(col("ld"), col("bucket")).count().collect()
    assert(occ.map(_.getLong(2)).sum == 3000, "leaves must partition the corpus")
    occ.foreach { r =>
      assert(r.getLong(2) <= VectorOps.KnnCapOcc || r.getInt(0) == maxD,
        s"leaf at depth ${r.getInt(0)} holds ${r.getLong(2)} > cap before the floor")
    }
    assert(occ.exists(_.getInt(0) > p0), "the skewed fixture must force a split")
    assert(occ.exists(_.getInt(0) == p0), "cold cells must stay at base depth")
    // prefix-free: no leaf key is an ancestor of another (this is what
    // makes the all-depth probe explode match at most once)
    val keys = occ.map(r => (r.getInt(0), r.getLong(1) - (1L << r.getInt(0))))
    for ((d1, pf1) <- keys; (d2, pf2) <- keys if d1 < d2)
      assert((pf2 & ((1L << d1) - 1)) != pf1,
        s"leaf ($d1,$pf1) is an ancestor of leaf ($d2,$pf2)")
    // the min-depth rule: a leaf below base depth implies its parent
    // cell was hot — recompute parent occupancy from the leaves
    val byPrefix = keys.zip(occ.map(_.getLong(2)))
    for (((d, pf), _) <- byPrefix if d > p0) {
      val parentMask = (1L << (d - 1)) - 1
      val parentOcc = byPrefix.collect {
        case ((dc, pc), c) if dc >= d && (pc & parentMask) == (pf & parentMask) => c
      }.sum
      assert(parentOcc > VectorOps.KnnCapOcc,
        s"leaf at depth $d exists but its parent held only $parentOcc ≤ cap")
    }
  }

  test("adaptive kNN join: no plan literal scales with the corpus (leaf set stays a relation)") {
    // The r5 probe embedded the collected leaf-key set as an InSet —
    // ~n/125 longs in the PLAN and on the DRIVER, i.e. hundreds of MB
    // at 10^10 vectors. The probe must resolve flipped-code → leaf by
    // joining the index-resident leaf relation instead: assert the
    // executed plan carries no InSet/IN-list membership test at all
    // (the only long-list literals allowed are the fixed 64-double
    // hyperplane rows, which are corpus-independent).
    val plan = VectorOps.qKnnJoin(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("INSET"), "adaptive probe must not embed a driver-collected key set")
    assert(!plan.contains(" IN ("), "adaptive probe must not embed an IN-list of leaf keys")
  }

  test("multi-probe P=1 is row-identical to the declared single-probe join") {
    // the declared-dial contract: q_knn_join_mp generalizes the probe
    // set, it must not MOVE the single-probe plan's output — probe 1 is
    // the same lowest-|margin| flip (first-minimum tie-break) on both
    // paths, here exercised on the ADAPTIVE trie (the scale path)
    val p1 = VectorOps.qKnnJoin(spark, dir).collect()
    val mp1 = VectorOps.qKnnJoinMp(spark, dir, probes = 1).collect()
    assert(p1.length == mp1.length && p1.sameElements(mp1),
      "P=1 multi-probe must be byte-identical to the single-probe join")
  }

  /** 500 vectors — stays on the flat 4-plane gate dial. */
  private lazy val flatDir: String = {
    val d = "target/knn_dial_flat_test"
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until 500).map { i =>
      (i.toLong, unit(Array.fill(64)(rnd.nextGaussian())).map(_.toFloat).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("multi-probe on the flat gate dial: P=1 identity, P=2 candidates dominate") {
    val p1 = VectorOps.qKnnJoin(spark, flatDir).collect()
    val mp1 = VectorOps.qKnnJoinMp(spark, flatDir, probes = 1).collect()
    assert(p1.length == mp1.length && p1.sameElements(mp1))
    // P=2 searches a strict SUPERSET of buckets per query: per-query
    // row count can only grow toward k, and the best similarity found
    // can only improve (the recall buy-back the dial study measured)
    val mp2 = VectorOps.qKnnJoinMp(spark, flatDir, probes = 2).collect()
    assert(mp2.length >= p1.length)
    val top1 = p1.filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val top2 = mp2.filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    top1.foreach { case (q, s1) =>
      assert(top2.getOrElse(q, Double.NegativeInfinity) >= s1,
        s"query $q: P=2 top-1 sim regressed below P=1")
    }
  }

  test("adaptive kNN join: deterministic, ≤k rows per query, never self-paired") {
    val r1 = VectorOps.qKnnJoin(spark, dir).collect()
    val r2 = VectorOps.qKnnJoin(spark, dir).collect()
    assert(r1.length == r2.length && r1.sameElements(r2), "two runs must be byte-identical")
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 3)
      assert(r.getLong(0) != r.getLong(2), "a vector must not be its own neighbor")
    }
    val perQ = r1.groupBy(_.getLong(0))
    perQ.foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q returned ${rows.length} > k rows")
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length),
        s"query $q ranks must be 1..k dense")
    }
  }
}
