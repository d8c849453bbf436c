package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot versioning: classify the delta between two immutable
  * corpus snapshots — the nightly-refresh shape where some documents
  * changed, some disappeared, and some are new. Ref analogue: the
  * reference pipeline re-collects everything per run and full-replaces
  * its store (`pipeline/collectors/nft.py:25-45`); a snapshot diff is
  * what turns that refresh incremental, and it feeds the incremental
  * dedup path (only `added`/`changed` docs re-enter
  * [[graft.dedup.Dedup]]'s delta-vs-index join).
  */
object Snapshot {

  /** Offset for synthetic new-doc ids in [[v2]]: far above any scaled
    * corpus id (ScaleGen ids stay < ~1e6 at sf10). */
  val addedIdOffset = 1000000000L

  /** Deterministic synthetic "next snapshot", derivable identically by
    * both engines from the corpus itself:
    *  - `doc_id % 17 == 3` → dropped (becomes `removed`)
    *  - `doc_id % 13 == 1` → revision suffix appended (becomes `changed`)
    *  - `doc_id % 29 == 0` → also yields a NEW doc at `doc_id + 1e9`
    *    (becomes `added`)
    */
  def v2(spark: SparkSession, dir: String): DataFrame =
    v2of(Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")))

  /** [[v2]] from an explicit (doc_id, source, text) relation — shared
    * with the ledger's changeset derivation (etl/Ledger.scala). */
  def v2of(d: DataFrame): DataFrame = {
    val kept = d.filter(col("doc_id") % 17 =!= 3)
      .withColumn("text", when(col("doc_id") % 13 === 1,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    val added = d.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + addedIdOffset).as("doc_id"), col("source"),
        concat(lit("new "), col("text")).as("text"))
    kept.unionByName(added)
  }

  /** SNAPSHOT DIFF — the operator: full-outer equi-join of the two
    * versions' (key, fingerprint) projections, status from null-ness /
    * fingerprint mismatch. Scale shape: fingerprints are computed in
    * the narrow pre-pass so only (doc_id, 32-char fp, source) ever
    * shuffles — document bodies stay in their scan; one shuffle on the
    * key, and zero Exchange when both snapshots are bucketed standing
    * tables (the same posture as the persisted LSH index artifacts).
    * `unchanged` keys — the overwhelming bulk of a real refresh — are
    * counted map-side by the final aggregate, never widened. */
  def diff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), col("source").as("src1"), md5(col("text")).as("fp1"))
    val b = v2.select(col("doc_id"), col("source").as("src2"), md5(col("text")).as("fp2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src1"), col("src2")).as("source"), col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Declared audit: per (source, status) — row counts and the id range
    * touched. The per-doc statuses feeding it are what an incremental
    * pipeline would route (added/changed → re-dedup, removed → index
    * tombstones). */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame =
    diff(Tables.documents(spark, dir), v2(spark, dir))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("status"))
}
