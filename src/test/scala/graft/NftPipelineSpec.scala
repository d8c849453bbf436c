package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.etl.NftPipeline

/** Reference-behavior parity tests (FIXTURES.md §B, SURVEY §1.3):
  * flatten intent vs literal, ANSI cast failure, empty-write skip,
  * None→empty normalization, corrupt-row quarantine. */
class NftPipelineSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private val goodRows = Seq(
    """{"identifier":"1","collection":"c","contract":"0xab","token_standard":"erc721","name":"A","metadata_url":"http://m/1","traits":[{"trait_type":"bg","value":"red"},{"trait_type":"eyes","value":"blue"}]}""",
    """{"identifier":"2","collection":"c","contract":"0xab","token_standard":"erc721","name":"B","metadata_url":null,"traits":null}""",
    """{"identifier":"3","collection":"c","contract":"0xab","token_standard":"erc721","name":"C","metadata_url":"http://m/3","traits":[]}""")
  private val corruptRow = """{"identifier": oops not json"""

  test("ingest: PERMISSIVE quarantines corrupt rows instead of failing") {
    val parsed = NftPipeline.ingestJson(spark, (goodRows :+ corruptRow).toDS())
    val (good, bad) = NftPipeline.quarantine(parsed)
    assert(good.count() == 3 && bad.count() == 1)
  }

  test("normalize: identifier cast to int, 6-column projection") {
    val (good, _) = NftPipeline.quarantine(NftPipeline.ingestJson(spark, goodRows.toDS()))
    val n = NftPipeline.normalizeNfts(good)
    assert(n.columns.toSeq == Seq("identifier", "collection", "contract", "token_standard", "name", "metadata_url"))
    assert(n.schema("identifier").dataType.typeName == "integer")
    assert(n.select(sum("identifier")).head.getLong(0) == 6L)
  }

  test("ANSI cast throws on non-numeric identifier (ref normalize.py:11 parity)") {
    val badId = Seq("""{"identifier":"notanumber","collection":"c","contract":"x","token_standard":"t","name":"n","metadata_url":"u","traits":null}""").toDS()
    val (good, _) = NftPipeline.quarantine(NftPipeline.ingestJson(spark, badId))
    val e = intercept[Exception] {
      NftPipeline.normalizeNfts(good).collect()
    }
    assert(e.getMessage.contains("CAST_INVALID_INPUT") || e.getMessage.contains("cast"))
  }

  test("traits intent: explode_outer keeps null/empty-array rows as null fields") {
    val (good, _) = NftPipeline.quarantine(NftPipeline.ingestJson(spark, goodRows.toDS()))
    val t = NftPipeline.traitsExploded(good).orderBy("identifier", "trait_type").collect()
    // id=1 -> 2 trait rows; id=2 (null array) -> 1 null row; id=3 (empty array) -> 1 null row
    assert(t.length == 4)
    assert(t.count(_.isNullAt(1)) == 2)
    assert(t.filter(_.getInt(0) == 1).map(_.getString(2)).toSet == Set("red", "blue"))
  }

  test("traits literal: nested list<struct> survives (PyArrow flatten no-op parity)") {
    val (good, _) = NftPipeline.quarantine(NftPipeline.ingestJson(spark, goodRows.toDS()))
    val t = NftPipeline.traitsLiteral(good)
    assert(t.schema("traits").dataType.typeName == "array")
    assert(t.count() == 3)
  }

  test("empty table write is skipped (ref store.py:9-11 truthiness parity)") {
    val out = java.nio.file.Files.createTempDirectory("nftout").toString
    val written = NftPipeline.toParquet(NftPipeline.emptyNfts(spark), "empty", out)
    assert(!written)
    assert(!new java.io.File(s"$out/empty.parquet").exists())
  }

  test("enrichment join attaches traits by metadata_url (ref nft.py:15-23 as join)") {
    val (good, _) = NftPipeline.quarantine(NftPipeline.ingestJson(spark, goodRows.toDS()))
    val traitsSrc = Seq(("http://m/1", "ipfs"), ("http://m/3", "http")).toDF("metadata_url", "storage")
    val enriched = NftPipeline.enrich(NftPipeline.normalizeNfts(good)
      .withColumn("traits", lit(null).cast("string")), traitsSrc)
    val m = enriched.select("identifier", "storage").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(m == Map(1 -> Some("ipfs"), 2 -> None, 3 -> Some("http")))
  }

  test("full run writes nfts + traits, round-trips") {
    val out = java.nio.file.Files.createTempDirectory("nftrun").toString
    val res = NftPipeline.run(spark, goodRows.toDS(), out)
    assert(res == Map("nfts" -> true, "traits" -> true))
    assert(spark.read.parquet(s"$out/nfts.parquet").count() == 3)
    assert(spark.read.parquet(s"$out/traits.parquet").count() == 4)
  }
}
