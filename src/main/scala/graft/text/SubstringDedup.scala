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
  * Algorithm (anchor grouping — NEVER all-pairs):
  *  1. hash every positioned L-token gram of every document
  *     ([[graft.functions.PositionedGramMd5]], one codegen'd pass);
  *  2. group by gram hash (one shuffle) and emit pairs within each
  *     2..cap-occurrence group — only documents sharing a verbatim
  *     L-run ever meet, so candidate volume is bound by true match
  *     density, not corpus size²; anchors hotter than
  *     [[HotAnchorCap]] (boilerplate) are dropped with hard-bounded
  *     aggregation state ([[graft.functions.CappedCollect]]);
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

  /** Stop-anchor cap: grams seen at more than this many positions are
    * dropped before the self-join. Measured necessity, not hygiene: at
    * sf100 exactly 30 boilerplate anchors held 33M of 228M pair mass
    * (their occupancy grows linearly with the corpus, so their pair
    * volume grows QUADRATICALLY — 0.33M at sf10, 100x at 10x data,
    * the whole super-linear term of the query). Dropping them is the
    * standard suffix-anchor trade (boilerplate shared by hundreds of
    * docs is not plagiarism signal); the oracle SQL applies the same
    * HAVING bound, so parity holds at every scale. No anchor reaches
    * the cap at the sf0.01/sf0.1 gate corpora — declared outputs there
    * are byte-identical with or without it. */
  val HotAnchorCap = 50

  /** Verbatim runs of ≥ `l` tokens across documents of `docs`
    * (`doc_id`, `text`). Output: one row per unordered doc pair with
    * the longest shared run and the number of maximal shared runs. */
  def verbatimRuns(docs: DataFrame, l: Int = MinRun): DataFrame = {
    // 60-bit md5-prefix anchors (PositionedGramHash60): longs shuffle
    // instead of 40-byte hex strings, and the digest streams token
    // bytes with no per-gram string build.
    val grams = docs
      .select(col("doc_id"),
        posexplode(TextHashes.positionedGramHash60(split(col("text"), " "), l))
          .as(Seq("pos", "h")))
    // ONE shuffle of the gram relation, grouped by anchor. The earlier
    // self-join formulation shuffled it three times (stop-anchor count
    // pass + both join sides) and moved the ~95% singleton anchors
    // through every one of them; grouping emits pairs only from groups
    // of 2..cap occurrences, so singletons generate nothing and the
    // stop-anchor cap (see [[HotAnchorCap]]) is the same filter.
    // [[graft.functions.CappedCollect]] hard-bounds per-group state at
    // cap+1 packed longs no matter how hot the anchor — a buffer of
    // length cap+1 means "over cap", which the size filter drops.
    import graft.functions.CappedCollect.{cappedCollect, PosBits, PosMask}
    val groups = grams
      .groupBy(col("h"))
      .agg(cappedCollect(HotAnchorCap)(col("doc_id"), col("pos")).as("xs"))
      .filter(size(col("xs")).between(2, HotAnchorCap))
    val pairs = groups
      .select(explode(col("xs")).as("x"), col("xs"))
      .select(col("x"), explode(col("xs")).as("y"))
      .filter(shiftright(col("x"), PosBits) < shiftright(col("y"), PosBits))
      .select(shiftright(col("x"), PosBits).as("doc_a"),
        shiftright(col("y"), PosBits).as("doc_b"),
        col("x").bitwiseAND(lit(PosMask)).as("pa"),
        (col("x").bitwiseAND(lit(PosMask)) - col("y").bitwiseAND(lit(PosMask))).as("diag"))
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
