package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection for LLM-data pipelines over `documents`.
  *
  * MinHash + LSH banding, built entirely from codegen'd built-in
  * expressions so the DuckDB oracle can reproduce it bit-for-bit:
  * the hash family is md5 over a seeded string (identical in both
  * engines), and a minhash is the lexicographic `array_min` of the
  * shingle hashes — fixed-width hex, so string-min == numeric-min.
  *
  * Scale shape (the whole point of LSH): signatures are computed in a
  * single narrow scan (no shuffle); candidate generation is a shuffle
  * join on (band_idx, band_hash) — expected O(n·dups), never the O(n²)
  * cross join; the exact-jaccard verify runs only on candidates.
  *
  * Ref lineage: the reference dedups requests via deterministic content
  * hashing (`pipeline/utils/cache.py:57-74`) — same idea promoted to
  * document near-dup detection.
  */
object Dedup {
  val ShingleK = 3
  val NumHashes = 16
  val Bands = 4 // 4 bands × 4 rows ⇒ LSH threshold (1/4)^(1/4) ≈ 0.71

  /** Word 3-shingles of the token array (deduplicated set). */
  def shingles(toks: Column): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - (ShingleK - 1)),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  /** One minhash: min over shingles of md5(seed || ':' || shingle). */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(seed.toString), lit(":"), s))))

  /** doc_id → (band_idx, band_hash) rows: the 16-hash signature grouped
    * into 4 bands of 4, each band hashed to a single md5 key. */
  def bandedSignatures(docs: DataFrame): DataFrame = {
    val sh = shingles(split(col("text"), " "))
    val withSig = docs
      .filter(size(split(col("text"), " ")) >= ShingleK)
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"),
        array((0 until NumHashes).map(k => minhash(col("sh"), k)): _*).as("sig"))
    val rowsPerBand = NumHashes / Bands
    withSig.select(col("doc_id"), posexplode(
        array((0 until Bands).map(b =>
          md5(concat_ws("|", (0 until rowsPerBand).map(r =>
            col("sig").getItem(b * rowsPerBand + r)): _*))): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
  }

  /** Exact shingle-set jaccard between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      (size(a) + size(b) - size(array_intersect(a, b)))

  /** MinHash-LSH near-dup pairs, verified: band-collision candidates →
    * exact jaccard ≥ threshold. Deterministic (md5 family) and therefore
    * oracle-checkable. */
  def qMinhashPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sigs = bandedSignatures(docs)
    val a = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = sigs.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val shDf = docs.filter(size(split(col("text"), " ")) >= ShingleK)
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("sh"))
    candidates
      .join(shDf.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shDf.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Brute-force n-gram (3-shingle) jaccard pairs above a high
    * threshold — the exact (non-LSH) reference answer; O(n²), kept for
    * small-corpus verification and as the oracle-checkable twin of the
    * LSH path. At 100 TB only the LSH variant runs. */
  def qNgramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.7): DataFrame = {
    // 1%-of-corpus sample: the brute-force path is O(n²) by design and
    // only exists as the exact twin of the LSH path — bound its input so
    // it stays runnable at every scale factor.
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 100 === 0 && size(split(col("text"), " ")) >= ShingleK)
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
