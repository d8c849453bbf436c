package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact._

/** Text-analysis operators for LLM-data pipelines over `documents`:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * document fingerprinting, term frequencies. All pure built-in
  * expressions — codegen'd, shuffle only where a groupBy demands it.
  */
object TextOps {

  /** Whitespace tokenizer (the corpus is single-space word soup). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-count estimate: word count + extra splits for long
    * words (approximates tokenizer behavior with a deterministic,
    * SQL-expressible formula: every started chunk of 6 chars counts).
    * floor() keeps the per-token division exact in both engines. */
  def bpeishTokenCount(text: Column): Column =
    aggregate(transform(tokens(text), t => floor((length(t) + lit(5)) / lit(6))),
      lit(0L), (acc, x) => acc + x)

  /** Canonical fingerprint: md5 of whitespace-collapsed, lowercased,
    * trimmed text. Identical in DuckDB (`md5(...)`). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  private val stopEn = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Stopword hits (array intersection size against a tiny embedded
    * list) — building block for quality + language-ID. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => lit(w)): _*)))

  /** Per-document token stats + quality score. Score formula (all
    * deterministic per-row double ops): rewards mid-length docs, token
    * diversity and stopword presence — a stand-in for fastText-style
    * quality classifiers, SQL-expressible for the oracle. */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .select(
        col("doc_id"), col("lang"),
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        stopwordHits(t, stopEn).cast("long").as("n_stop"),
        bpeishTokenCount(col("text")).as("n_bpeish"),
        // diversity * stopword-ratio, scaled by a length factor — int/int
        // divisions in double, deterministic cross-engine
        (size(array_distinct(t)).cast("double") / size(t)
          * least(col("n_chars").cast("double") / 200.0, lit(1.0))).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Corpus token statistics per (lang, source): document counts, token
    * totals, exact mean chars. */
  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"), size(t).as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Language-ID heuristic: CJK codepoint presence ⇒ zh; otherwise
    * argmax of per-language stopword hits with a fixed precedence order
    * (deterministic tie-break), 'und' when nothing hits. The declared
    * query emits the (actual lang × guess) confusion matrix. */
  private val langGroups = Seq(
    stopEn,
    Seq("el", "la", "de", "que", "y", "los"),
    Seq("der", "die", "und", "das", "ist", "ein"),
    Seq("le", "la", "et", "les", "des", "un"))
  private val langLabels = Seq("en", "es", "de", "fr")

  /** Language ID as ONE expression pass ([[graft.functions.LangGuess]]).
    * The Column-composed twin below re-evaluates its StopwordHits
    * subtree at every when-branch reference (CSE does not hoist into
    * CASE branches) — ~10 tokenize+scan walks per row, 20 s at sf10.
    * Twin kept, spec-pinned equal; the oracle SQL is unchanged. */
  def langGuess(text: Column): Column =
    graft.functions.TextHashes.langGuess(text, langGroups, langLabels)

  /** Column-composed reference form (the decision the oracle mirrors). */
  def langGuessComposed(text: Column): Column = {
    val t = tokens(text)
    val hits = graft.functions.TextHashes.stopwordHits(t, langGroups)
    val en = hits.getItem(0)
    val es = hits.getItem(1)
    val de = hits.getItem(2)
    val fr = hits.getItem(3)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(en >= es && en >= de && en >= fr && en > 0, lit("en"))
      .when(es >= de && es >= fr && es > 0, lit("es"))
      .when(de >= fr && de > 0, lit("de"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  def qLangid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), langGuess(col("text")).as("guess"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))

  /** Term frequency: top-20 tokens corpus-wide (explode → count →
    * TakeOrderedAndProject; the explode fan-out is the only wide step). */
  def qTermFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** COUNT-MIN SKETCH — memory-bounded frequency estimation, the
    * sketch family's counting member next to HLL (distinct) and the
    * bounded-heap top-k: d=4 hash rows × w=4096 counters summarize an
    * unbounded token stream in constant space, estimate(t) = min over
    * rows of counter[r][h_r(t)] — never an underestimate, overestimate
    * ≤ εN with ε = e/w at the standard depth/width guarantees.
    *
    * Fully DETERMINISTIC (unlike Spark's built-in count_min_sketch,
    * whose serialized form the oracle can't reproduce): ONE md5 per
    * key, row r's bucket = hex chars [1+3r, 3+3r) of the digest parsed
    * as an integer — 4 disjoint 12-bit slices of one 128-bit digest
    * are independent row hashes at a quarter of the digest cost (the
    * per-row-md5 form measured 97 s at sf10; one digest, four slices
    * is the same stream cost as a single hash). Bitwise identical in
    * DuckDB via CAST('0x'||substr(…)), so the sketch table, the
    * estimates, and the declared output all hash-match.
    *
    * Build evolution (all three forms cell-identical): per-row md5 ×4
    * (97 s at sf10) → one sliced digest through posexplode+groupBy
    * (70 s — the d·N-row Generate dominates) → the CMS as an
    * aggregation buffer ([[graft.functions.CmsSketch]], 22.6 s — the
    * residual is the exact-count audit the sketch is compared against).
    *
    * Scale shape: the build is one explode + one groupBy down to a
    * CONSTANT-size table (d·w = 16384 rows regardless of corpus);
    * estimation joins the probe keys against that table broadcast.
    * The sketched stream is the word-3-gram stream (the corpus
    * vocabulary is 31 tokens — dense 3-grams give a ~16k-key domain,
    * so the 4096-bucket rows genuinely collide and the estimates
    * genuinely overestimate). The declared output compares CMS
    * estimates against exact counts for the top-50 grams — the
    * overestimate audit a pipeline logs when it swaps exact counting
    * for the sketch. */
  def cmsBuckets(key: Column, d: Int): Column = {
    val digest = md5(concat(lit("cms:"), key))
    array((0 until d).map(r =>
      conv(substring(digest, 1 + 3 * r, 3), 16, 10).cast("long")): _*)
  }

  def qCms(spark: SparkSession, dir: String, d: Int = 4, k: Int = 50): DataFrame = {
    val t = col("t")
    // gram stream via the one-pass WordGramsAll expression — the
    // interpreted transform(sequence)+concat_ws HOF twin below costs
    // interpreted-lambda per token and runs TWICE (sketch + exact):
    // swapping it cut q_cms 88.8 → (see PERF) at sf10. NOT WordGrams:
    // that dedups, and a frequency sketch needs the multiset.
    val grams = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .filter(size(t) >= 3)
      .select(explode(graft.functions.TextHashes.wordGramsAll(t, 3)).as("gram"))
    // sketch build: the CMS is the aggregation buffer itself
    // (functions/CmsSketch.scala) — one pass, no d·N-row Generate, 128 KB
    // partials merged element-wise. The cell layout/values are identical
    // to the explode+groupBy form (hash slicing shared with cmsBuckets),
    // so the oracle and the probe join are untouched.
    val sketch = grams
      .agg(graft.functions.CmsSketch.cmsSketch(d, 4096)(col("gram")).as("s"))
      .select(posexplode(col("s")).as(Seq("idx", "cnt")))
      .filter(col("cnt") > 0)
      .select(floor(col("idx") / lit(4096)).cast("int").as("row"),
        pmod(col("idx"), lit(4096)).cast("long").as("bucket"), col("cnt"))
    val exact = grams.groupBy(col("gram")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("gram")).limit(k)
    val probes = exact.select(col("gram"), col("exact_n"),
        posexplode(cmsBuckets(col("gram"), d)))
      .select(col("gram"), col("exact_n"), col("pos").as("row"), col("col").as("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("gram"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_n"))
      .orderBy(col("exact_n").desc, col("gram"))
  }

  /** Word n-grams of a token array (deduplicated set), parameterized k
    * — decontamination wants longer grams than dedup's 3-shingles. */
  def wordGrams(toks: Column, k: Int): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))

  /** Benchmark DECONTAMINATION — the eval-leak check every LLM data
    * pipeline runs before training: flag corpus documents sharing any
    * word k-gram with a benchmark/eval set. Shape: the benchmark gram
    * set is small (eval suites are thousands of prompts, not billions)
    * so it broadcasts; the corpus explodes its grams ONCE and
    * inner-joins the broadcast set — per-doc match counts without a
    * corpus shuffle (the group-by key is doc_id, map-side combined).
    * Contaminated docs then leave the training set via the same
    * anti-join pattern as near-dup removal. Here the "benchmark" is
    * the doc_id % 7 == 0 slice of the corpus itself (driver corpus
    * ships no eval table), which guarantees hits. */
  /** The "benchmark suite" is an ABSOLUTELY-bounded hash-rank sample
    * of documents, never a fractional split: an eval suite is a
    * fixed-size artifact, and the suite's distinct grams ride a
    * broadcast — a `doc_id % 7` split made that broadcast grow
    * linearly with the corpus (the q_ngram_pairs/q_fuzzy
    * fractional-sample bug class; the gram set of 1/7 of an sf10
    * corpus is already tens of MB and would OOM the broadcast long
    * before 100 TB). With a fixed 100-doc suite the broadcast is
    * constant-size at every scale and the scan side streams. */
  val DecontaminateBenchDocs = 100

  def qDecontaminate(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // gram construction via the one-pass WordGrams expression (the HOF
    // twin `wordGrams` below is the oracle-mirrored reference form —
    // interpreted, spec-pinned equal)
    val grams = (t: Column) => graft.functions.TextHashes.wordGrams(t, k)
    val docs = Tables.documents(spark, dir)
      .filter(size(tokens(col("text"))) >= k)
    val bench = docs
      .orderBy(md5(concat(lit("decon:"), col("doc_id").cast("string"))), col("doc_id"))
      .limit(DecontaminateBenchDocs)
    val benchGrams = bench
      .select(explode(grams(tokens(col("text")))).as("gram")).distinct()
    docs.join(broadcast(bench.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), explode(grams(tokens(col("text")))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic sampling predicate: keep a row iff the md5 of its
    * salted key falls below the fraction's 8-hex threshold (fixed-width
    * hex compare == unsigned numeric compare). Unlike rand()-based
    * sampling this is reproducible across engines, runs, partitionings
    * and retries — the property a training-data pipeline needs for
    * auditable corpus subsets. */
  def sampleHash(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 8)

  def sampleThreshold(fraction: Double): String =
    f"${math.min((fraction * (1L << 32)).toLong, (1L << 32) - 1)}%08x"

  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = "s0"): DataFrame =
    df.filter(sampleHash(key, salt) < lit(sampleThreshold(fraction)))

  /** Declared query: 20 % reproducible sample of documents, audited
    * per language (counts + sampled token volume). */
  def qSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    deterministicSample(docs, col("doc_id"), 0.2)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(size(tokens(col("text")))).as("sum_tokens"))
      .orderBy(col("lang"))
  }

  /** LENGTH HISTOGRAM — corpus profiling: fixed-width token-count
    * buckets per language (the distribution every pipeline logs before
    * and after each filter stage to see what a cut actually removed).
    * Bucket = floor(n/20)·20 in exact integer arithmetic; one narrow
    * scan + one (lang, bucket) shuffle regardless of corpus size. */
  def qHistogram(spark: SparkSession, dir: String, width: Int = 20): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bucket", (col("n_tok") - (col("n_tok") % width)))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** TERM CO-OCCURRENCE — skip-gram statistics (window ±2), the
    * counting pass behind word2vec-style embedding training and PMI
    * collocation mining. Tokens explode with their position; each
    * token then fans out to its `window` forward offsets and pairs
    * ride a FULL (doc_id, pos) equi-join — O(n·window) work per doc,
    * never O(n²) pairs; counts are exact integers so the ranking
    * needs no libm.
    * Top-50 by (count desc, term pair) is a deterministic total
    * order. At 100 TB this is the canonical (term,term) shuffle;
    * vocabulary skew is AQE's skew-join case and stopword pruning
    * (not applied here) is the standard volume dial. */
  def qCooccur(spark: SparkSession, dir: String, window: Int = 2, k: Int = 50): DataFrame = {
    // one-pass codegen'd pair emission (TokenPairs) — the r4 rewrite of
    // the offset-explode + (doc_id, pos) equi-join form: the join moved
    // ~2n positioned rows per doc through an Exchange before the pair
    // aggregate (34 s at sf10); emitting packed "a\u0001b" pairs
    // directly from the token array goes scan → explode → one partial-
    // aggregated (pair) shuffle. The \u0001 separator sorts below every
    // token byte, so top-k order on the packed string equals the
    // (n desc, term_a, term_b) order the oracle's join form uses.
    Tables.documents(spark, dir)
      .select(explode(
        graft.functions.TextHashes.tokenPairs(tokens(col("text")), window)).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
      .select(substring_index(col("pair"), "\u0001", 1).as("term_a"),
        substring_index(col("pair"), "\u0001", -1).as("term_b"),
        col("n"))
      .orderBy(col("n").desc, col("term_a"), col("term_b"))
  }

  /** BIGRAM LANGUAGE-MODEL TABLE — top-k next words per head word
    * with conditional probabilities (the count-based LM a pipeline
    * builds for perplexity-ish scoring and synthetic-data detection).
    * Adjacent pairs ride the (doc_id, pos+1 = pos) equi-join; the
    * probability is an exact-integer count ratio (n / head_total), so
    * the ranking and values are bitwise deterministic. Two shuffles
    * (pair counts, head totals) + one broadcast-ready vocab join. */
  def qBigramLm(spark: SparkSession, dir: String, k: Int = 3, minHead: Long = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // adjacent pairs are TokenPairs(window=1) — one narrow pass into
    // the pair aggregate instead of the positioned (doc_id, pos+1=pos)
    // self-join (the same r4 rewrite as qCooccur); the w1/w2 split
    // happens on the AGGREGATED pair table, vocabulary-sized
    val pairs = Tables.documents(spark, dir)
      .select(explode(
        graft.functions.TextHashes.tokenPairs(tokens(col("text")), 1)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .select(substring_index(col("pair"), "\u0001", 1).as("w1"),
        substring_index(col("pair"), "\u0001", -1).as("w2"), col("n"))
    val heads = pairs.groupBy(col("w1")).agg(sum(col("n")).as("head_total"))
      .filter(col("head_total") >= minHead)
    val w = Window.partitionBy(col("w1")).orderBy(col("n").desc, col("w2"))
    pairs.join(heads, Seq("w1"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("w1"), col("rnk"), col("w2"), col("n"), col("head_total"),
        (col("n").cast("double") / col("head_total").cast("double")).as("p"))
      .orderBy(col("w1"), col("rnk"))
  }

  /** PERPLEXITY SCORING — held-out documents scored under an add-one-
    * smoothed bigram LM trained on the rest of the corpus (the
    * CCNet-style LM quality filter: low perplexity ≈ fluent text, high
    * ≈ noise/boilerplate; ref analogue: the reference scores pages for
    * keep/drop, `pipeline/processors/validate.py`). Train/holdout split
    * is the same deterministic `doc_id % 7` the decontamination op uses.
    *
    * Cross-engine determinism: per-bigram surprisal is quantized to
    * micro-nats — `floor(1e6·ln((h+V)/(n+1)) + 0.5)` as BIGINT — and
    * summed in exact integer arithmetic. `ln` differs between the JVM
    * and DuckDB by 1 ulp on ~1e-4 of inputs (measured over 200k domain
    * samples), but a quantization flip needs the true value within one
    * ulp of a k+0.5 boundary AND an engine disagreement there — joint
    * odds ≈ 1e-13 per distinct bigram; the mean is one double division
    * of exact integers. Perplexity = exp(mean_nll_unats/1e6), left to
    * the caller so the declared output stays libm-quantization-free.
    *
    * Scale shape: the LM is a (w1,w2)-keyed corpus artifact (two
    * aggregations); scoring is a narrow bigram explode + LEFT equi-join
    * against it + an integer aggregate — at 100 TB the LM table
    * partitions by w1 and never broadcasts, vocabulary skew (stopword
    * heads) is AQE's skew-join case. */
  def qPerplexity(spark: SparkSession, dir: String): DataFrame = {
    // adjacent bigrams via TokenPairs(window=1) (the qCooccur rewrite):
    // the LM probe joins on the packed pair string, one key instead of
    // two; the w1 head key splits off the pair only where needed
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val hold = docs.filter(col("doc_id") % 7 === 0)
    def bigrams(t: DataFrame) = t.select(col("doc_id"), explode(
      graft.functions.TextHashes.tokenPairs(tokens(col("text")), 1)).as("pair"))
    val pairs = bigrams(train).groupBy(col("pair")).agg(count(lit(1)).as("n"))
    val heads = pairs
      .select(substring_index(col("pair"), "\u0001", 1).as("w1"), col("n"))
      .groupBy(col("w1")).agg(sum(col("n")).as("head_total"))
    val vocab = train.select(explode(tokens(col("text"))).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    val scored = bigrams(hold)
      .join(pairs, Seq("pair"), "left")
      .withColumn("w1", substring_index(col("pair"), "\u0001", 1))
      .join(heads, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n0"),
        coalesce(col("head_total"), lit(0L)).as("h0"),
        col("v"))
    val surprisal = floor(lit(1e6) *
      log((col("h0") + col("v")).cast("double") / (col("n0") + 1).cast("double"))
      + lit(0.5))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("n0") === 0, 1L).otherwise(0L)).as("n_oov"),
        sum(surprisal).as("nll_unats"))
      .withColumn("mean_nll_unats",
        col("nll_unats").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** INVERTED INDEX — term → sorted posting list + document frequency
    * (the retrieval artifact; also the exact-match side of
    * decontamination at scale). Postings serialize to a CSV string so
    * the declared output stays scalar for the compare harness; the
    * sort inside the aggregate makes the list order deterministic
    * regardless of partitioning. df ≥ 10 bounds the declared output
    * to the interesting vocabulary. */
  def qInvertedIndex(spark: SparkSession, dir: String, minDf: Long = 10): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
      .orderBy(col("term"))
  }

  /** PHRASE SEARCH over a positional posting list — the retrieval twin
    * of [[qInvertedIndex]] (that one is the doc-level index artifact;
    * real search needs positions for adjacency). Query phrases are the
    * leading trigrams of the k lowest-id documents (deterministic and
    * corpus-derived, so planted duplicates guarantee multi-doc hits at
    * every scale). Scale shape: the phrase-term set broadcasts and
    * prunes the posting stream BEFORE any join (the posting scan emits
    * only rows whose term appears in some phrase — at 100 TB the index
    * side is a bucketed standing table and this is an index probe, not
    * a scan); adjacency is two equi-joins on (phrase, doc, pos) over
    * the pruned — tiny — match sets. */
  def qPhraseSearch(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val t = tokens(col("text"))
    val d = Tables.documents(spark, dir)
      .filter(size(t) >= 3)
      .select(col("doc_id"), t.as("t"))
    // the query phrases: a tiny runtime artifact (k strings), collected
    // like the Lloyd centroids and carried in the GramHits expression —
    // the corpus is then walked ONCE with no posexplode (the
    // position-join form ran 3 corpus-scale Generates: 16.4 s at sf10
    // vs ~4 s for the one-pass kernel)
    val phrases = d.orderBy(col("doc_id")).limit(k)
      .select(concat_ws(" ", element_at(col("t"), 1), element_at(col("t"), 2),
        element_at(col("t"), 3)).as("phrase"))
      .distinct().orderBy(col("phrase"))
      .collect().map(_.getString(0)).toSeq
    val phraseIdx = phrases.zipWithIndex.map { case (p, i) => (i, p) }.toDF("pidx", "phrase")
    Tables.documents(spark, dir)
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        posexplode(graft.functions.TextHashes.phraseCounts(col("text"), phrases))
          .as(Seq("pidx", "cnt")))
      .filter(col("cnt") > 0)
      .join(broadcast(phraseIdx), Seq("pidx"))
      .groupBy(col("phrase"))
      .agg(sum(col("cnt")).as("n_matches"),
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("phrase"))
  }

  /** REPETITION scoring — the boilerplate/degenerate-text signal every
    * LLM quality filter carries: fraction of duplicate word n-grams
    * per document (1 - distinct/total), at n=2 and n=3. Pure per-row
    * computation (one WordGrams pass per n, no shuffle); the declared
    * query keeps docs with any repetition. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val tot2 = (size(t) - 1).cast("long")
    val tot3 = (size(t) - 2).cast("long")
    val dist2 = size(graft.functions.TextHashes.wordGrams(t, 2)).cast("long")
    val dist3 = size(graft.functions.TextHashes.wordGrams(t, 3)).cast("long")
    Tables.documents(spark, dir)
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        tot2.as("n_grams2"), dist2.as("n_distinct2"),
        ((tot2 - dist2).cast("double") / tot2).as("rep2"),
        tot3.as("n_grams3"), dist3.as("n_distinct3"),
        ((tot3 - dist3).cast("double") / tot3).as("rep3"))
      .filter(col("rep2") > 0 || col("rep3") > 0)
      .orderBy(col("doc_id"))
  }

  /** Email pattern for PII redaction — identical semantics in Java
    * regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs. */
  val emailPattern: String = "[a-z0-9]+@[a-z]+\\.[a-z]+"

  /** PII REDACTION: detect and mask email-shaped spans (the scrubbing
    * pass a training pipeline runs before tokenization). The corpus
    * carries no PII, so each doc gets a deterministic planted address
    * derived from its id — BOTH engines derive the same input, so
    * detection counts and the redacted-text fingerprint are exact.
    * Narrow per-row regex work, no shuffle. */
  def qRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com now"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("text2"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text2"), lit(emailPattern), lit(0))).cast("long")
          .as("n_emails"),
        md5(regexp_replace(col("text2"), emailPattern, "<EMAIL>")).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints per source: exact-dup detection via md5
    * canonical hash (ref cache-key dedup, `cache.py:57-74`). */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"))
      .orderBy(col("source"))
}
