package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ETL pipeline recomposed Spark-first (SURVEY §3.1):
  * dynamic JSON rows at extract → fixed schema at transform → parquet at
  * load, with the reference's behavioral fine points (SURVEY §1.3)
  * implemented deliberately:
  *
  *  1. `flatten()` intent vs literal (ref `pipeline/transform/
  *     normalize.py:26-29`): PyArrow's flatten is a no-op on
  *     `list<struct>`, so the reference *ships nested traits* while its
  *     README claims flattened ones. [[traitsExploded]] is the blessed
  *     intent path (`explode_outer` + field expansion);
  *     [[traitsLiteral]] preserves reference behavior (plain nested
  *     projection).
  *  2. ANSI-strict cast (ref `normalize.py:11`): string→int cast throws
  *     on non-numeric input, matching Arrow's `cast` (and DuckDB).
  *  3. Empty write skip (ref `pipeline/load/store.py:9-11`): 0-row
  *     tables are not written.
  *  4. Missing-contracts `None` (ref `pipeline/collectors/nft.py:53-55`)
  *     normalizes to an empty Dataset instead of crashing downstream.
  *
  * At scale: ingest is `spark.read.json`/`from_json` over distributed
  * raw rows (the reference's 15-worker queue becomes executor-task
  * parallelism); the per-row enrichment fetch (ref `nft.py:15-23`)
  * becomes a left join against a keyed traits source — see
  * [[enrich]] — planned as broadcast when the source is bounded.
  */
object NftPipeline {

  /** Fixed transform schema, mirroring ref `main.py:54-65`. */
  val nftSchema: StructType = StructType(Seq(
    StructField("identifier", StringType),
    StructField("collection", StringType),
    StructField("contract", StringType),
    StructField("token_standard", StringType),
    StructField("name", StringType),
    StructField("metadata_url", StringType),
    StructField("traits", ArrayType(StructType(Seq(
      StructField("trait_type", StringType),
      StructField("value", StringType)))))))

  /** Dynamic-at-extract → fixed-at-transform: parse raw JSON rows under
    * PERMISSIVE mode with a corrupt-record column (the reference skips
    * bad rows but logs them, `nft.py:76-77` — at 100 TB never drop
    * silently; keep the quarantine count observable). */
  def ingestJson(spark: SparkSession, raw: Dataset[String]): DataFrame = {
    val withCorrupt = nftSchema.add("_corrupt_record", StringType)
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(raw)
  }

  /** Split parsed rows into good/quarantined (ref error-skip R5). */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = parsed.filter(col("_corrupt_record").isNotNull)
    val good = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    (good, bad)
  }

  /** Ref `normalize.py:11-25`: strict cast of identifier → int, 6-column
    * projection. ANSI mode makes the cast throw on non-numeric ids —
    * same as Arrow cast (§1.3.2). */
  def normalizeNfts(df: DataFrame): DataFrame =
    df.select(
      col("identifier").cast(IntegerType).as("identifier"),
      col("collection"), col("contract"), col("token_standard"),
      col("name"), col("metadata_url"))

  /** Intent semantics of ref `normalize.py:26-29` (§1.3.1): one row per
    * trait, null-array rows preserved with null fields. */
  def traitsExploded(df: DataFrame): DataFrame =
    df.select(col("identifier").cast(IntegerType).as("identifier"),
        explode_outer(col("traits")).as("trait"))
      .select(col("identifier"), col("trait.trait_type").as("trait_type"),
        col("trait.value").as("value"))

  /** Literal reference behavior (§1.3.1): the nested list survives. */
  def traitsLiteral(df: DataFrame): DataFrame =
    df.select(col("identifier").cast(IntegerType).as("identifier"), col("traits"))

  /** Ref `nft.py:15-23` (R3): per-row trait enrichment as a left
    * equi-join on metadata_url — broadcast the traits source when
    * bounded, else a shuffled equi-join. */
  def enrich(nfts: DataFrame, traitsSource: DataFrame, broadcastHint: Boolean = true): DataFrame = {
    val src = if (broadcastHint) broadcast(traitsSource) else traitsSource
    nfts.drop("traits").join(src, Seq("metadata_url"), "left")
  }

  /** Ref `store.py:8-20` (R11 + §1.3.3): mkdir, skip empty, write.
    * Returns true iff written. At scale callers should prefer
    * `partitionBy` columns; the reference writes one file per table. */
  def toParquet(df: DataFrame, name: String, outDir: String): Boolean = {
    if (df.isEmpty) false
    else {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      true
    }
  }

  /** Ref `nft.py:53-55` (§1.3.4): a missing upstream (None) becomes an
    * empty, correctly-typed Dataset rather than a crash. */
  def emptyNfts(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], nftSchema)

  /** Full pipeline (ref `main.py:14-73`): raw rows → schema → cast →
    * {nfts, traits} tables → parquet. */
  def run(spark: SparkSession, raw: Dataset[String], outDir: String): Map[String, Boolean] = {
    val (good, _) = quarantine(ingestJson(spark, raw))
    Map(
      "nfts" -> toParquet(normalizeNfts(good), "nfts", outDir),
      "traits" -> toParquet(traitsExploded(good), "traits", outDir))
  }
}
