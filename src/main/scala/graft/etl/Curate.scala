package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.ops.Exact.dsum
import graft.text.TextOps

/** The end-to-end training-corpus curation pipeline — the composition
  * the individual text/dedup operators exist FOR, declared as one
  * oracle-checked query:
  *
  *   quality gate → language verification → near-dup removal (keep the
  *   cluster-canonical doc) → deterministic 50 % sample → per-(lang,
  *   source) corpus accounting.
  *
  * Scale shape: the scoring pass is one narrow scan (all per-row
  * expressions, codegen'd); dedup reuses the memoized LSH pair
  * pipeline (no second signature scan); the loser set is tiny
  * (≈ |near-dups|) so the anti-join broadcasts; sampling is a
  * stateless hash predicate. One shuffle total — the final group-by.
  *
  * Ref lineage: the reference's collect→normalize→store flow
  * (`pipeline/etl.py`) with the curation steps a 100 TB text corpus
  * needs bolted on in the same declarative plan.
  */
object Curate {

  def qCurate(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val quality = size(array_distinct(t)).cast("double") / size(t) *
      least(col("n_chars").cast("double") / 200.0, lit(1.0))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"), col("n_chars"))
      .withColumn("quality", quality)
      .withColumn("guess", TextOps.langGuess(col("text")))
    val kept = scored.filter(col("quality") >= 0.35 && col("guess") === col("lang"))
    // docs dominated by their cluster canonical (min doc_id) — reuses
    // the memoized pair pipeline shared with q_minhash_pairs/q_dup_clusters
    val losers = Dedup.corpusClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val deduped = kept.join(broadcast(losers), Seq("doc_id"), "left_anti")
    val sampled = TextOps.deterministicSample(deduped, col("doc_id"), 0.5, "curate")
    sampled
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(t)).as("sum_tokens"),
        dsum(col("quality"), 9).as("sum_quality"))
      .orderBy(col("lang"), col("source"))
  }
}
