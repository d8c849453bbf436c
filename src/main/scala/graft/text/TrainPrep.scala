package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps.{sampleHash, sampleThreshold, tokens}

/** Training-data preparation operators over `documents` — the steps
  * between a curated corpus and a tokenized training shard: chunking
  * long documents into context windows, packing sequences into
  * fixed-budget bins, mixture-weighted source sampling, and
  * distinctive-term extraction (TF-IDF-style inverted statistics).
  * All deterministic and oracle-mirrored in DuckDB SQL.
  */
object TrainPrep {

  /** Sliding-window CHUNKING: split each document's token stream into
    * windows of `chunk` tokens at `stride` offsets (stride < chunk ⇒
    * overlap, the usual context-window prep for LLM training). The
    * last window may be shorter (partial tail kept, nothing dropped);
    * docs shorter than one window yield exactly one chunk. Integer
    * window count: 1 + ceil(max(n-chunk,0)/stride), all arithmetic
    * exact in double well below 2^53. Scale shape: pure per-row
    * narrow explode — no shuffle at all; output order is the only
    * (declared-query) sort. */
  def qChunk(spark: SparkSession, dir: String, chunk: Int = 64, stride: Int = 48): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    docs
      .withColumn("n_chunks",
        greatest(floor((col("n") - chunk + (stride - 1)) / lit(stride.toDouble)) + 1, lit(1L)))
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start"),
        least(lit(chunk.toLong), col("n") - col("chunk_idx") * stride).as("chunk_len"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunk)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Greedy SEQUENCE PACKING: fill fixed token-budget bins with
    * documents in deterministic (doc_id) order, one packing stream per
    * `source` — the shard-building step that turns a corpus into
    * fixed-size training batches. A document goes to the bin its
    * cumulative token offset starts in (contiguous first-fit; a doc
    * may straddle its bin's boundary, as real packers split across
    * sequence boundaries). Scale shape: the window runs per source
    * partition — parallelism = number of sources (at 100 TB, pack per
    * shard key: date × source × hash-bucket), shuffle = one exchange
    * on the partition key. */
  def qPack(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(budget.toDouble)))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Mixture weights: per-language keep-fractions (the data-mixture
    * dial every LLM training run tunes). Shared with the generated
    * oracle SQL so both engines embed identical thresholds. */
  val mixtureWeights: Seq[(String, Double)] =
    Seq("en" -> 0.9, "es" -> 0.5, "de" -> 0.25, "fr" -> 0.1)
  val mixtureDefault: Double = 0.05
  val mixtureSalt: String = "mix"

  /** MIXTURE SAMPLING: deterministic hash-threshold sampling with
    * per-language rates — reweighting sources into a target training
    * mixture, reproducible across engines/runs/retries (same property
    * as [[TextOps.deterministicSample]], per-group thresholds). The
    * weights ride a broadcast dim join (mixture config is data, not
    * code). Declared output audits per language: total, kept, achieved
    * rate. */
  def qMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = broadcast(
      mixtureWeights.map { case (l, f) => (l, sampleThreshold(f)) }.toDF("lang", "thr"))
    Tables.documents(spark, dir)
      .join(weights, Seq("lang"), "left")
      .withColumn("thr", coalesce(col("thr"), lit(sampleThreshold(mixtureDefault))))
      .withColumn("kept", (sampleHash(col("doc_id"), mixtureSalt) < col("thr")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        (sum(col("kept")).cast("double") / count(lit(1))).as("rate"))
      .orderBy(col("lang"))
  }

  /** STRATIFIED SAMPLING — exactly `n` documents per source, chosen by
    * deterministic hash rank (not a rate): the "fixed eval slice per
    * domain" op. Unlike threshold sampling, the output size is exact
    * regardless of source skew. Spark plans the rank-filter as
    * WindowGroupLimit (partial per-partition top-n before the
    * shuffle), so at 100 TB each source moves only ~n·partitions rows,
    * not its whole corpus, into the window sort. */
  def qStratified(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(sampleHash(col("doc_id"), "strat"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .orderBy(col("source"), col("rk"))
  }

  /** TEMPERATURE RESAMPLING (α = 0.5): per-language keep-rates derived
    * FROM the data — rate_l = sqrt(cnt_min / cnt_l), the α-temperature
    * flattening that upsamples rare languages relative to dominant
    * ones (rarest language keeps everything, p ∝ share^α). α is fixed
    * at 0.5 so the rate computation is a sqrt of a count ratio — both
    * IEEE-exact operations, bitwise identical cross-engine, where a
    * pow() would drift with libm. The double rate becomes an 8-hex
    * md5 threshold (floor to 2^32 grid, clamped) compared against the
    * same deterministic sample hash the mixture op uses; the rate
    * table is lang-count-sized and broadcasts. */
  def qTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val rates = counts.crossJoin(broadcast(counts.agg(min(col("cnt")).as("min_cnt"))))
      .select(col("lang"),
        sqrt(col("min_cnt").cast("double") / col("cnt").cast("double")).as("rate"))
    val thr = lpad(lower(hex(
      least(floor(col("rate") * lit(4294967296.0)).cast("long"), lit(4294967295L)))), 8, "0")
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("kept", (sampleHash(col("doc_id"), "temp") < thr).cast("long"))
      .groupBy(col("lang"))
      .agg(max(col("rate")).as("rate"),
        count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"))
      .orderBy(col("lang"))
  }

  /** QUALITY-PERCENTILE GATE: keep each source's top-half documents by
    * the quality score (percent_rank ≤ 0.5 over quality desc) — the
    * per-domain relative filter used when absolute quality thresholds
    * would wipe out weak domains entirely. percent_rank is
    * (rank−1)/(n−1) over a total order (quality desc, doc_id), so the
    * cut is deterministic; the aggregate reports the kept count and
    * the worst admitted quality per source (min = row selection, no
    * float summation). */
  def qQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        (size(array_distinct(t)).cast("double") / size(t)
          * least(col("n_chars").cast("double") / 200.0, lit(1.0))).as("quality"))
    val w = Window.partitionBy(col("source")).orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), min(col("quality")).as("worst_kept"))
      .orderBy(col("source"))
  }

  /** DISTRIBUTION MATCHING — sample the source language's corpus so
    * its token-length histogram matches the target language's SHAPE
    * (the curation step behind "make the web scrape look like the
    * curated set" / domain-transfer mixing). Both corpora bucket into
    * fixed 20-token bins; each bucket's keep-rate is the target:source
    * count ratio normalized so the tightest bucket keeps everything:
    * r_b = (n_tgt_b/n_src_b) / max_b(n_tgt_b/n_src_b) — pure ratios
    * of exact integer counts, bitwise deterministic cross-engine with
    * no libm. Rates become 8-hex md5 thresholds (same grid as
    * temperature sampling) on a broadcast bucket-rate table; source
    * buckets absent from the target keep nothing. Output audits per
    * bucket: counts, rate, kept. */
  def qDistMatch(spark: SparkSession, dir: String,
      srcLang: String = "en", tgtLang: String = "fr", width: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bucket", col("n_tok") - (col("n_tok") % width))
    val srcC = docs.filter(col("lang") === srcLang)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_src"))
    val tgtC = docs.filter(col("lang") === tgtLang)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_tgt"))
    val ratio = srcC.join(tgtC, Seq("bucket"), "left")
      .select(col("bucket"), col("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"),
        (coalesce(col("n_tgt"), lit(0L)).cast("double") / col("n_src").cast("double")).as("raw"))
    val rates = ratio.crossJoin(broadcast(ratio.agg(max(col("raw")).as("max_raw"))))
      .select(col("bucket"), col("n_src"), col("n_tgt"),
        (col("raw") / col("max_raw")).as("rate"))
    val thr = lpad(lower(hex(
      least(floor(col("rate") * lit(4294967296.0)).cast("long"), lit(4294967295L)))), 8, "0")
    docs.filter(col("lang") === srcLang)
      .join(broadcast(rates), Seq("bucket"))
      .withColumn("kept", (sampleHash(col("doc_id"), "dmatch") < thr).cast("long"))
      .groupBy(col("bucket"))
      .agg(max(col("n_src")).as("n_src"), max(col("n_tgt")).as("n_tgt"),
        max(col("rate")).as("rate"), sum(col("kept")).as("n_kept"))
      .orderBy(col("bucket"))
  }

  /** DISTINCTIVE TERMS (TF-IDF shape): term frequency per document
    * joined against corpus-wide document frequency, top-3 terms per
    * document ranked by (tf desc, df asc, term asc). The ranking is
    * the TF-IDF order for any monotone idf — kept in integers so the
    * oracle is immune to cross-engine libm (ln) drift. Scale shape:
    * explode → two-phase count [shuffle on (doc,term)], df aggregate
    * [shuffle on term], tf⋈df on term (vocab-sized side — AQE
    * broadcasts when it fits, bucket-join at 100 TB), one window per
    * doc. */
  def qTfidf(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val tf = tfidfTf(spark, dir)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // bounded-heap top-k per doc (TopKNativeStr): partial buffers
    // truncate to k terms BEFORE the doc_id shuffle, so the exchange
    // carries 3 terms per doc instead of every distinct (doc, term)
    // pair — the q_topk_agg pattern applied to the text layer. Heap
    // order (tf desc, df asc, term asc in UTF8 binary) is exactly the
    // window ORDER BY; TrainPrepSpec pins heap == window on the
    // corpus. tf rides the double sortKey (counts ≪ 2^53, exact).
    tf.join(df, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.TopKNative.topKStr(k)(
        col("tf").cast("double"), col("df"), col("term")).as("tops"))
      .select(col("doc_id"), posexplode(col("tops")).as(Seq("pos", "e")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("e.str").as("term"), col("e.sortKey").cast("long").as("tf"),
        col("e.tie").as("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private def tfidfTf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Window-form twin of [[qTfidf]] — kept for the heap==window pin
    * in TrainPrepSpec (the TopKAggSpec discipline: every bounded-heap
    * rewrite keeps its full-shuffle twin asserted byte-identical). */
  private[graft] def qTfidfWindow(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val tf = tfidfTf(spark, dir)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df"), col("term"))
    tf.join(df, Seq("term"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Subword budgets for the BPE-based prep ops. Subword counts exceed
    * whitespace counts (~1.5× on this corpus), so the budgets scale
    * accordingly vs qChunk/qPack's 64/512. */
  val bpeChunkBudget = 96
  val bpePackBudget = 768

  /** BPE ENCODE audit: per-document whitespace-token vs subword counts
    * under the trained merge table — the number every downstream budget
    * (chunk/pack/histogram) is denominated in. The merge table rides
    * inside the expression (broadcast-sized model artifact): the scan
    * is one narrow codegen'd pass, no join, no shuffle. Oracle: DuckDB
    * joins the reference-encoded vocab fixture (word → n_sub) and
    * sums — an inner join, so any corpus word missing from the vocab
    * fails the gate loudly instead of silently dropping. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val m = Bpe.merges(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        graft.functions.BpeEncode.bpeTokenCount(col("text"), m).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** Rounds the DECLARED training query learns: enough to exercise
    * multi-character merge chaining (rounds 6+ consume earlier merge
    * outputs on this corpus), small enough that the oracle's
    * staged-CTE replay — 2 CTEs per round — stays cheap in DuckDB. */
  val bpeTrainRounds = 10

  /** BPE TRAIN (declared): learn the first [[bpeTrainRounds]] merges
    * of the tokenizer FROM the corpus, distributively — see
    * [[Bpe.trainDistributed]] for the scale shape (one corpus-scale
    * aggregate, then vocab-sized rounds). Output is the model artifact
    * itself: (rank, lhs, rhs, freq). The oracle replays training in
    * pure SQL: per round, a pair-count CTE over the current
    * tokenization and a leftmost-non-overlapping merge via string
    * replace on a doubled-separator symbol encoding — fully
    * independent re-derivation from the raw corpus, no fixture. */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Bpe.trainDistributed(spark, dir, bpeTrainRounds)
      .zipWithIndex
      .map { case ((a, b, c), i) => ((i + 1).toLong, a, b, c) }
      .toDF("rank", "lhs", "rhs", "freq")
  }

  /** SUBWORD-BUDGET CHUNKING: contiguous first-fit bins over the word
    * stream by cumulative SUBWORD count (chunk boundaries may straddle
    * a word's budget edge, same contract as [[qPack]]'s bins). The
    * per-word subword counts come from one narrow expression pass;
    * the cumulative sum is a per-document window — shuffle on doc_id
    * only, which at 100 TB is the natural partitioning of a document
    * corpus (no global sort, no driver state). */
  def qChunkBpe(spark: SparkSession, dir: String, budget: Int = bpeChunkBudget): DataFrame = {
    val m = Bpe.merges(spark)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.BpeEncode.bpeWordCounts(col("text"), m))
          .as(Seq("pos", "n_sub")))
      .withColumn("cum", sum(col("n_sub")).over(w))
      .withColumn("chunk_idx", floor((col("cum") - col("n_sub")) / lit(budget.toDouble)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("sum_subwords"),
        min(col("pos")).cast("long").as("first_word"),
        max(col("pos")).cast("long").as("last_word"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** SUBWORD-BUDGET PACKING: [[qPack]] re-based on subword counts —
    * fill fixed-budget bins per source in doc_id order, where the
    * budget is what the training run actually consumes (subwords),
    * not whitespace tokens. Same scale shape as qPack: one window per
    * source partition. */
  def qPackBpe(spark: SparkSession, dir: String, budget: Int = bpePackBudget): DataFrame = {
    val m = Bpe.merges(spark)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        graft.functions.BpeEncode.bpeTokenCount(col("text"), m).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(budget.toDouble)))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_subwords"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** Deterministic GLOBAL SHUFFLE into training shards: every document
    * gets a reproducible pseudo-random position — `shard` is a 60-bit
    * md5 key mod `nShards`, `pos` the key's rank within its shard,
    * `cum_tokens` the running token total at that position (the batch
    * boundary bookkeeping a loader needs). This is the write path of a
    * training run: the corpus lands as `nShards` independently sorted
    * streams whose order is a fixed permutation — reproducible across
    * engines, retries and cluster sizes because nothing calls rand().
    * Scale shape: one narrow hash projection, one exchange on `shard`,
    * one per-shard sort — exactly the
    * repartition(shard).sortWithinPartitions(key) pattern a 100 TB
    * shard-writer runs; at that scale `nShards` is thousands, so the
    * per-shard sort is the parallelism, not a bottleneck. */
  def qShard(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    shardRows(spark, dir, nShards)
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tok"), col("cum_tokens"))
      .orderBy(col("shard"), col("pos"))

  /** The full shard permutation WITH the document payload — the relation
    * [[graft.ops.Sink.writeShards]] materializes to disk. Split out so
    * the declared permutation query and the shard writer share one
    * definition. */
  def shardRows(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val order = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 15), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(order).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("text"), col("shard"), col("pos"),
        col("n_tok"), col("cum_tokens"))
  }

  /** HASHING-TRICK FEATURIZATION (Weinberger et al.'s feature hashing,
    * the fixed-width sparse featurizer linear models and quick-and-dirty
    * classifiers run on text): each token hashes to one of `bins`
    * feature slots, with a SIGN drawn from an independent hash bit so
    * collisions cancel in expectation instead of biasing counts
    * upward. Output: the sparse (doc_id, bin, val) triples, zero
    * entries absent.
    *
    * Scale shape: tokenize → explode → hash → groupBy(doc_id, bin) is
    * one narrow scan plus one partial+final hash aggregate keyed by
    * (doc_id, bin) — map-side combine collapses each document's
    * repeats before the shuffle, and the output is ≤ bins rows per doc
    * regardless of document length. The hash is the same md5 idiom the
    * shard permutation uses (deterministic, engine-mirrored); no
    * vocabulary table, no fit step — the whole point of the hashing
    * trick at corpus scale. */
  def qFeatureHash(spark: SparkSession, dir: String, bins: Int = 64): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("h", md5(concat(lit("fh:"), col("w"))))
    tok
      .select(col("doc_id"),
        pmod(conv(substring(col("h"), 1, 15), 16, 10).cast("long"), lit(bins.toLong)).as("bin"),
        // sign bit: an md5 nibble DISJOINT from the bin digits
        when(conv(substring(col("h"), 16, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("bin"))
      .agg(sum(col("sgn")).as("val"))
      .filter(col("val") =!= 0)
      .orderBy(col("doc_id"), col("bin"))
  }

  /** Q-top-p: nucleus (coverage) vocabulary truncation — per language,
    * keep the most frequent tokens until they cover 90% of that
    * language's token mass; everything past the crossing row is cut.
    * The standard "top-p vocabulary / tail-token pruning" pass before
    * tokenizer training or OOV analysis.
    *
    * Scale shape: one word-count shuffle (map-side combined), then a
    * per-language window over the VOCABULARY (token-type cardinality,
    * not corpus size). The keep rule `cum − c < 0.9·total` (strictly:
    * 10·(cum−c) < 9·total, all longs) admits exactly the rows whose
    * preceding cumulative mass was below the threshold — integer
    * arithmetic end-to-end, so both engines agree exactly. */
  def qTopP(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("lang"))
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wAll))
      .filter((col("cum") - col("c")) * 10 < col("total") * 9)
      .select(col("lang"), col("w"), col("c"), col("cum"),
        (col("cum").cast("double") / col("total")).as("coverage"))
      .orderBy(col("lang"), col("cum"))
  }

  /** Q-curriculum: curriculum staging — per language, rank documents by
    * a difficulty proxy (length, doc_id tiebreak) and deal them into 4
    * equal-depth stages with `ntile`. Downstream training consumes
    * stages in order (easy→hard). ntile over (length, doc_id) is a
    * total order, so stage assignment is deterministic and the SQL
    * standard's larger-groups-first rule makes both engines agree.
    *
    * Scale shape: one window shuffle partitioned by language; state per
    * row is O(1). At 100 TB the same staging runs as a histogram
    * quantile cut (see [[graft.ops.MlStats.qQuantileSketch]]) instead
    * of a true ntile — the 4-boundary broadcast replaces the sort. */
  def qCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("stage", ntile(4).over(w).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Q-dataset-card: the release manifest a corpus drop ships with —
    * one row per (source, lang) cell carrying doc/token totals, the
    * exact-dedup rate (distinct md5 fingerprints vs rows), and the
    * token-length profile. Every number a dataset card quotes, from
    * one pass plus the distinct-count expansion.
    *
    * Scale shape: ONE grouped aggregate over the corpus; the single
    * distinct aggregate (fingerprints) is Spark's standard two-phase
    * partial-distinct expand, keyed by the same (source, lang) cell —
    * the exact form q_agg_distinct already pins. Ratios surface as
    * single double divisions of exact longs. */
  def qDatasetCard(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("text")).as("fp"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("fp")).as("n_unique"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_unique"),
        ((col("n_docs") - col("n_unique")).cast("double")
          / col("n_docs").cast("double")).as("dup_share"),
        col("min_tok"), col("max_tok"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tok"))
      .orderBy(col("source"), col("lang"))
}
