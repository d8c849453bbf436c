package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHashes

/** EXACT SUBSTRING (verbatim-run) dedup — the cross-document
  * long-common-substring pass industrial corpora run to strip verbatim
  * copies (licenses, boilerplate, plagiarized spans) that jaccard-level
  * near-dup detection under-weighs when documents are long.
  *
  * Algorithm (anchor equi-join — NEVER all-pairs):
  *  1. hash every positioned L-token gram of every document
  *     ([[graft.functions.PositionedGramMd5]], one codegen'd pass);
  *  2. self-equi-join on the gram hash — only documents sharing a
  *     verbatim L-run ever meet, so candidate volume is bound by true
  *     match density, not corpus size²;
  *  3. stitch runs: anchors of one shared span land on one DIAGONAL
  *     (pos_a − pos_b constant); consecutive positions along a diagonal
  *     group by the classic `pos − row_number()` gap trick, and a run of
  *     `c` consecutive anchors is a verbatim span of `c + L − 1` tokens.
  *
  * Scale shape: one narrow gram pass, one shuffle on gram hash, one
  * window per (pair, diagonal) — each partitioned by keys whose
  * cardinality grows with MATCHES, not with the corpus square. At
  * 100 TB the only extra dial is gram stride > 1 for the anchor pass
  * (classic suffix-anchor trade: stride s detects runs ≥ L + s − 1)
  * plus a frequency cap dropping degenerate grams (boilerplate seen in
  * thousands of docs) before the join — both documented, neither needed
  * at fixture scale.
  */
object SubstringDedup {

  /** Minimum verbatim run length (tokens) the declared query reports. */
  val MinRun = 20

  /** Verbatim runs of ≥ `l` tokens across documents of `docs`
    * (`doc_id`, `text`). Output: one row per unordered doc pair with
    * the longest shared run and the number of maximal shared runs. */
  def verbatimRuns(docs: DataFrame, l: Int = MinRun): DataFrame = {
    // 60-bit md5-prefix anchors (PositionedGramHash60): longs shuffle
    // instead of 40-byte hex strings, and the digest streams token
    // bytes with no per-gram string build. Materialized ONCE — the
    // self-join's two sides otherwise re-run the whole gram+digest
    // pass each (2×16 s of the query's 27 s at sf10).
    val grams = docs
      .select(col("doc_id"),
        posexplode(TextHashes.positionedGramHash60(split(col("text"), " "), l))
          .as(Seq("pos", "h")))
      .localCheckpoint()
    val a = grams.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("h"))
    val b = grams.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("h"))
    val pairs = a.join(b, Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy(col("pa"))
    pairs
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg((count(lit(1)) + (l - 1)).cast("long").as("run_len"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("run_len")).as("max_run"), count(lit(1)).as("n_runs"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Declared query over the planted-verbatim-span fixture
    * ([[graft.sources.Fixtures.substrFixture]]): recovers exactly the
    * planted ≥ MinRun spans; sub-threshold plants stay invisible. */
  def qSubstringDup(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Fixtures.ensure(spark)
    verbatimRuns(spark.read.parquet(graft.sources.Fixtures.substrPath))
  }

  /** The same detector over the REAL corpus: the driver's near-dup
    * documents are edit-variants that still share long verbatim spans
    * (24 pairs at the sf0.01 gate), so this exercises anchor-join
    * selectivity on natural data, not just plants. */
  def qSubstrCorpus(spark: SparkSession, dir: String): DataFrame =
    verbatimRuns(graft.Tables.documents(spark, dir).select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")))
}
