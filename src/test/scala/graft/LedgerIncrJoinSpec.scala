package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger

/** The incremental JOIN view (two-tier IVM over two change feeds) must
  * equal a from-scratch join of the two tables' heads — recomputed
  * here INDEPENDENTLY (head read + logical dim replay), the same
  * cross-check the DuckDB oracle runs, but inside Spark so the law is
  * pinned at test time on the tiny corpus too. */
class LedgerIncrJoinSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("maintained join view equals the from-scratch head join") {
    val view = Ledger.qLedgerIncrJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent recompute: docs head = shared lineage v3 read back;
    // dims head = the lineage's rules replayed logically
    val docsHead = Ledger.readVersion(spark, Ledger.tableRoot(sf), 3)
    val dims = Tables.documents(spark, sf).select(col("source")).distinct()
      .select(col("source"),
        (length(col("source")) * 7 + 3 +
          when(ascii(substring(col("source"), 1, 1)) % 2 === 0, 11L)
            .otherwise(0L)).cast("long").as("weight"))
    val mn = dims.agg(min(col("source"))).head.getString(0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val expected = docsHead.join(dims.filter(col("source") =!= mn), Seq("source"))
      .groupBy(pmod(col("doc_id"), lit(5)).as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        pmod(sum((conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
          .cast(dec38) * col("weight"))), lit(1000000000000000000L))
          .cast("long").as("wfp_sum"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(view.keySet == expected.keySet)
    assert(view == expected, "maintained view diverged from the head join")
    // the deleted dim source's docs are RETRACTED: strictly fewer
    // pairs than head docs (every doc has exactly one source)
    val headDocs = docsHead.count()
    assert(view.values.map(_._1).sum < headDocs,
      "dim-side delete must remove its joined rows from the view")
  }
}
