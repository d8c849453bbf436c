package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vector.VectorOps.{cosine, hyperplanes, lshBucket}

/** Retrieval QUALITY measurement and late-interaction scoring — the
  * eval half of the ANN stack (VectorOps builds the indexes; this
  * module grades them and adds the multi-vector scorer).
  *
  * Determinism contract: every rank-dependent term (DCG discount,
  * reciprocal rank) is a PRECOMPUTED scaled-integer literal indexed by
  * rank — the discount table is a model-sized artifact embedded in
  * both plans, so there is no runtime transcendental to drift between
  * engines and all cross-row sums are exact BIGINT sums. Cosines are
  * collapsed to scaled BIGINTs (floor(1e6·x + 0.5)) before summation,
  * the q_perplexity discipline.
  *
  * Reference analogue: the reference's collection-quality summaries
  * (pipeline/processors/transform.py) — re-expressed as the standard
  * public IR metrics (NDCG@k, MRR, recall@k) over the ANN retriever.
  */
object RetrievalEval {

  val evalK = 10
  val nQueries = 5

  /** DCG discount table: u(r) = floor(1e6·ln2/ln(r+1) + 0.5),
    * r = 1..k. Computed once on the driver, embedded as literals in
    * BOTH the Spark plan and the oracle SQL. */
  def dcgU(k: Int = evalK): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 * math.log(2.0) / math.log(r + 1.0) + 0.5).toLong)

  /** Ideal DCG@k when all k slots are relevant (truth lists always
    * carry k items here): a single literal. */
  def idcgU(k: Int = evalK): Long = dcgU(k).sum

  /** Reciprocal-rank table: floor(1e6 / r), exact integer division. */
  def mrrU(k: Int = evalK): Seq[Long] = (1 to k).map(r => 1000000L / r)

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Q-ndcg: grade the sign-LSH retriever (the 100 TB ANN path)
    * against exact brute-force ground truth with NDCG@10, MRR and
    * recall@10 per query. Truth = exact top-10 (the bounded
    * brute-force baseline, broadcast queries × corpus scan); system =
    * the 4-plane LSH bucket join top-10 — the same two plans
    * q_sim_topk / q_sim_lsh declare. At scale the truth side is the
    * expensive-but-bounded offline eval pass every production ANN
    * deployment runs on a sampled query set; the metric join itself
    * is rank-table-sized. */
  def qNdcg(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))

    val truth = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= evalK)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))

    val planes = hyperplanes(4, 64)
    val bk = e.withColumn("bucket", lshBucket(col("v"), planes))
    val qb = bk.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val sys = bk.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= evalK)

    val dcgArr = array(dcgU().map(lit): _*)
    val mrrArr = array(mrrU().map(lit): _*)
    sys.join(truth, Seq("q_id", "vec_id"), "left")
      .select(col("q_id"), col("rn"), coalesce(col("hit"), lit(0)).as("hit"))
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_sys"),
        sum(col("hit")).cast("long").as("n_hits"),
        sum(col("hit") * element_at(dcgArr, col("rn").cast("int"))).as("dcg_u"),
        coalesce(max(when(col("hit") === 1,
          element_at(mrrArr, col("rn").cast("int")))), lit(0L)).as("mrr_u"))
      .withColumn("ndcg", col("dcg_u").cast("double") / lit(idcgU()).cast("double"))
      .withColumn("recall", col("n_hits").cast("double") / lit(evalK).cast("double"))
      .select(col("q_id"), col("n_sys"), col("n_hits"), col("dcg_u"),
        col("ndcg"), col("mrr_u"), col("recall"))
      .orderBy(col("q_id"))
  }

  /** Per-group deterministic hash-rank sample of vectors: the bounded
    * multi-vector "document" (ColBERT-style late interaction caps
    * vectors per item; the cap is what keeps MaxSim linear). */
  private def vecSample(e: DataFrame, salt: String, cap: Int): DataFrame = {
    val hk = graft.text.TextOps.sampleHash(col("vec_id"), salt)
    val w = Window.partitionBy(col("label")).orderBy(hk, col("vec_id"))
    e.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap).drop("rk")
  }

  /** Q-maxsim: late-interaction multi-vector scoring (the public
    * ColBERT MaxSim operator): each label is a multi-vector item
    * (capped at 8 vectors by deterministic hash-rank), the first two
    * labels' 4-vector samples are the queries; score(q, d) =
    * Σ_{qv ∈ q} max_{dv ∈ d} cos(qv, dv), with each max collapsed to
    * floor(1e6·max + 0.5) before the exact BIGINT sum. Scale shape:
    * the query side broadcasts (model-sized), the corpus side streams
    * through one cosine pass and a two-level aggregate (max then sum
    * — both map-side combinable); ranking is per-query top-5. */
  def qMaxsim(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val docs = vecSample(e, "ms", 8)
      .select(col("label").as("d_label"), col("vec_id").as("d_vec"), col("v"))
    val qs = vecSample(e.filter(col("label") < 2), "msq", 4)
      .select(col("label").as("q_label"), col("vec_id").as("q_vec"), col("v").as("qv"))
    val mx = docs.crossJoin(broadcast(qs))
      .select(col("q_label"), col("d_label"), col("q_vec"),
        cosine(col("qv"), col("v")).as("sim"))
      .groupBy(col("q_label"), col("d_label"), col("q_vec"))
      .agg(max(col("sim")).as("mx"))
      .select(col("q_label"), col("d_label"),
        floor(lit(1e6) * col("mx") + lit(0.5)).cast("long").as("u"))
    val w = Window.partitionBy(col("q_label")).orderBy(col("score").desc, col("d_label"))
    mx.groupBy(col("q_label"), col("d_label"))
      .agg(sum(col("u")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_label"), col("rnk"), col("d_label"), col("score"))
      .orderBy(col("q_label"), col("rnk"))
  }
}
