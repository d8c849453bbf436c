package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorOps

/** Laws of filtered kNN (q_knn_filtered): every neighbor satisfies the
  * predicate; a query with ≥ k filtered candidates in its probed
  * leaves is served from EXACTLY them (post-filter); a query whose
  * probed leaves run dry is escalated to the EXACT top-k over the
  * filtered corpus — never a silently truncated list. The whole-result
  * law recomputes both arms independently from the probe relation and
  * the raw corpus. */
class KnnFilteredSpec extends AnyFunSuite {
  import SparkFixture.spark

  private val k = 3

  private def law(dir: String): Unit = {
    val res = VectorOps.qKnnFiltered(spark, dir, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byId = rows.map(t => t._1 -> t).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val filteredIds = rows.filter(_._2 == 7).map(_._1).toSet
    // law 1: every neighbor satisfies the predicate
    assert(res.forall { case (_, _, nbr, _) => filteredIds.contains(nbr) })
    // law 2: ranks are 1..m with m <= k, sims non-increasing
    res.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= k)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
    // whole-result law: recompute both arms from the probe relation
    val (idx, p0, maxD) = VectorOps.knnIndexed(spark, dir)
    val probes = VectorOps.knnProbeQueries(spark, dir, idx, p0, maxD)
      .select(col("q_id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bucketOf = idx.select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def topk(q: Long, cands: Seq[Long]): Seq[(Long, Long, Long, Double)] = {
      val qv = byId(q)._3
      cands.map(c => (c, cos(qv, byId(c)._3)))
        .sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (q, i + 1L, id, s) }
    }
    val probesByQ = probes.groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val filteredSeq = rows.map(_._1).filter(filteredIds.contains)
    val expected = rows.map(_._1).flatMap { q =>
      val probed = probesByQ.getOrElse(q, Set.empty)
      val cand = filteredSeq.filter(c => c != q && probed.contains(bucketOf(c)))
      if (cand.length >= k) topk(q, cand) // post-filter arm
      else topk(q, filteredSeq.filter(_ != q)) // exact escalation arm
    }.toSet
    assert(res.toSet == expected)
  }

  test("filtered kNN law at sf0.001") { law(SparkFixture.sf) }

  /** 3000 labeled vectors, 1200 clustered (KnnDialSpec's skewed
    * recipe + labels) — the TRIE dial (p0=4, maxD=12), where the
    * probe set resolves through leaf keys and the filtered arms must
    * still partition correctly. */
  private lazy val trieDir: String = {
    val d = "target/knn_filtered_trie_test"
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val hot = unit(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 3000).map { i =>
      val v =
        if (i < 1200) unit(hot.map(_ + rnd.nextGaussian() * 0.25))
        else unit(Array.fill(64)(rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq, i % 10)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("filtered kNN law at the trie dial (skewed 3000-vector corpus)") {
    val (_, p0, maxD) = VectorOps.knnIndexed(spark, trieDir)
    assert(p0 == 4 && maxD == 12, "fixture must open the adaptive dial")
    law(trieDir)
  }

  test("filtered kNN law at sf0.01 (both arms live)") {
    val dir = "/root/testdata/sf0.01"
    law(dir)
    // pin that BOTH arms actually fire at the gate corpus: some query
    // has >= k filtered candidates in its probed buckets, some doesn't
    val (idx, p0, maxD) = VectorOps.knnIndexed(spark, dir)
    val nQ = idx.count()
    val filtered = idx.filter(col("label") === 7)
      .select(col("bucket"), col("vec_id").as("c_id"))
    val counts = VectorOps.knnProbeQueries(spark, dir, idx, p0, maxD)
      .join(filtered, Seq("bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .groupBy(col("q_id")).count().collect().map(_.getLong(1))
    val served = counts.count(_ >= k)
    assert(served > 0, "expected at least one post-filter-served query")
    assert(served < nQ, "expected at least one escalated query")
  }
}
