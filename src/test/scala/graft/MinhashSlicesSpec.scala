package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.MinhashSlices.minhashSlices

/** Pins the custom MinhashSlices expression to the pure-expression form
  * the DuckDB oracle uses — any drift breaks oracle parity silently, so
  * this equivalence is load-bearing for q_minhash_pairs. */
class MinhashSlicesSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  private def referenceForm(sh: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    array((0 until 8).map(i =>
      array_min(transform(sh, s => substring(sha2(concat(lit(s"$seed:"), s), 256), i * 8 + 1, 8)))): _*)

  test("custom expression == array_min/transform/sha2 slices on real shingles") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), split(col("text"), " ").as("toks"),
        graft.dedup.Dedup.shinglesRaw(split(col("text"), " ")).as("sh"))
    val cmp = docs.select(
      minhashSlices(col("toks"), 0).as("fast0"), referenceForm(col("sh"), 0).as("ref0"),
      minhashSlices(col("toks"), 1).as("fast1"), referenceForm(col("sh"), 1).as("ref1"))
    val bad = cmp.filter(col("fast0") =!= col("ref0") || col("fast1") =!= col("ref1")).count()
    assert(bad == 0)
  }

  test("fewer-than-k tokens yields null; outputs are 8 hex-8 strings") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a", "b"), Seq("a", "b", "c", "d")).toDF("toks")
    val out = df.select(minhashSlices(col("toks"), 0).as("m")).collect()
    assert(out(0).isNullAt(0)) // no shingles -> null
    assert(out(1).isNullAt(0)) // 2 tokens < k=3 -> null
    assert(out(2).getSeq[String](0).length == 8)
    assert(out(2).getSeq[String](0).forall(_.matches("[0-9a-f]{8}")))
  }
}
