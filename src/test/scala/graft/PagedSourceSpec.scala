package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DSv2 paged source (SURVEY R4/R13): partition planning per page
  * range, full-row recovery through transient failures, pushdown-
  * compatible schema. */
class PagedSourceSpec extends AnyFunSuite {
  import SparkFixture.spark

  private def read(rows: Long, opts: Map[String, String] = Map.empty) = {
    val base = spark.read.format("graft.sources.PagedSource")
      .option("rows", rows).option("pageSize", 100).option("pagesPerPartition", 4)
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("reads exactly `rows` rows with the declared schema") {
    val df = read(2537)
    assert(df.count() == 2537)
    assert(df.schema.fieldNames.toSeq ==
      Seq("identifier", "collection", "token_standard", "name", "metadata_url"))
    assert(df.agg(min("identifier"), max("identifier")).head() ==
      org.apache.spark.sql.Row(0L, 2536L))
  }

  test("partition planning: ceil(pages / pagesPerPartition) tasks") {
    val df = read(2537) // 26 pages of 100 -> 7 partitions of <=4 pages
    assert(df.rdd.getNumPartitions == 7)
  }

  test("COUNT(*) is answered from page arithmetic without fetching") {
    // failEvery=1 + maxRetries=0 makes ANY fetch throw — the count can
    // only succeed if the aggregate pushdown bypassed the Fetcher
    val df = spark.read.format("graft.sources.PagedSource")
      .option("rows", 2537).option("pageSize", 100)
      .option("failEvery", 1).option("maxRetries", 0).load()
    assert(df.agg(count(lit(1))).head().getLong(0) == 2537L)
    // a filtered count must stay on the exact fetch path (and fail here)
    intercept[Exception] {
      df.filter(col("identifier") < 100).agg(count(lit(1))).head()
    }
  }

  test("identifier-range filters prune pages before any fetch") {
    // 26 pages of 100; identifier < 350 touches pages 0-3 -> 1 partition of 4 pages
    val pruned = read(2537).filter(col("identifier") < 350)
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected one 4-page partition, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() == 350) // residual re-applied: exact rows survive
    val mid = read(2537).filter(col("identifier") >= 1000 && col("identifier") < 1200)
    assert(mid.count() == 200)
    assert(mid.rdd.getNumPartitions == 1)
    val none = read(2537).filter(col("identifier") === lit(5000))
    assert(none.count() == 0, "range beyond the corpus plans zero partitions")
  }

  test("column pruning: the pruned read schema reaches the reader factory") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = read(1000).select("identifier", "name")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a DSv2 BatchScan")
    val readSchema = scans.head.scan.readSchema()
    assert(readSchema.fieldNames.toSeq == Seq("identifier", "name"),
      s"projection not pruned at the scan: $readSchema")
    val factory = scans.head.scan.asInstanceOf[graft.sources.PagedScan]
      .createReaderFactory().asInstanceOf[graft.sources.PagedReaderFactory]
    assert(factory.required.fieldNames.toSeq == Seq("identifier", "name"),
      "pruned schema must reach the reader factory")
    // pruned rows are still correct (and identifier-only ordering holds)
    val got = df.orderBy("identifier").limit(3).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(got.head.getString(1) == "Token #0")
  }

  test("pruning composes with filter pushdown (narrow scan over pruned pages)") {
    val df = read(2537).filter(col("identifier") >= 1000 && col("identifier") < 1200)
      .select("collection")
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 200)
    assert(df.distinct().count() == 7)
  }

  test("transient page failures are retried, not lost") {
    val df = read(1000, Map("failEvery" -> "3")) // every 3rd page fails once
    assert(df.count() == 1000)
    assert(df.select(countDistinct("identifier")).head.getLong(0) == 1000)
  }

  test("exhausted retries surface the failure") {
    val df = read(1000, Map("failEvery" -> "3", "maxRetries" -> "0"))
    // collect(), not count(): a bare count is now answered by the
    // aggregate pushdown without fetching and would (correctly) succeed
    val e = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("synthetic transient"))))
  }

  test("composes with the relational engine (joins, aggregates)") {
    val api = read(1000)
    val out = api.groupBy("collection").agg(count(lit(1)).as("n"))
      .orderBy("collection").collect()
    assert(out.map(_.getLong(1)).sum == 1000)
    assert(out.length == 7)
  }
}
