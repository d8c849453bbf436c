package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger

/** Laws of the one-call incremental-view API (defineView/refreshView):
  * a maintained COUNT/SUM view must equal the from-scratch aggregate
  * of the table's head at every refresh — including heads produced by
  * CONCURRENT OCC writers (the feed is derived from committed
  * manifests, so however commits interleave, refresh sees exactly the
  * serialized history) — and a group whose members were all retracted
  * must drop out, the way a from-scratch GROUP BY has no row for it. */
class LedgerViewSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def mkTable(name: String): String = {
    val t = Ledger.tableRoot(name)
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 4)
    t
  }

  private def spec(t: String) = Ledger.ViewSpec(t, t, "doc_id",
    groups = Seq("source" -> col("source")), countAs = "n",
    sums = Seq("len" -> length(col("text")).cast("long")))

  private def fromScratch(t: String, v: Int) =
    Ledger.readVersion(spark, t, v)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(length(col("text")).cast("long")).as("len"))
      .orderBy(col("source")).collect().toSeq

  test("maintained view equals from-scratch under concurrent OCC writers") {
    val t = mkTable("ledger_view_occ")
    Ledger.defineView(spark, "view_occ", spec(t))
    // refresh at v0 IS the bootstrap
    assert(Ledger.refreshView(spark, "view_occ", upTo = 0)
      .orderBy(col("source")).collect().toSeq == fromScratch(t, 0))
    // two OCC writers race from the same base on file-disjoint keys
    // (one rebases metadata-only); the view is oblivious to the race
    val p1 = Ledger.prepareMerge(spark, t, 0,
      Seq((1L, "upsert", "src1", "edited one"), (2L, "upsert", "src2", "edited two"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    val p2 = Ledger.prepareMerge(spark, t, 0,
      Seq((280L, "delete", "src1", "x"), (281L, "upsert", "src0", "edited far"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(p1, p2).map { p =>
      new Thread(() =>
        try Ledger.commitPrepared(spark, t, p)
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"disjoint OCC writers must both commit: ${errs.peek()}")
    assert(Ledger.latestVersion(spark, t) == 2)
    assert(Ledger.refreshView(spark, "view_occ")
      .orderBy(col("source")).collect().toSeq == fromScratch(t, 2),
      "the maintained view must equal the from-scratch head aggregate")
  }

  test("a group whose members were all retracted drops out of the view") {
    val t = mkTable("ledger_view_zero")
    // src2 = doc_ids ≡ 2 (mod 3): delete every one of them
    val dels = (0L until 300L).filter(_ % 3 == 2)
      .map(i => (i, "delete", "src2", "")).toDF("doc_id", "op", "source", "text")
    Ledger.merge(spark, t, 0, dels, "doc_id")
    Ledger.defineView(spark, "view_zero", spec(t))
    val got = Ledger.refreshView(spark, "view_zero")
      .orderBy(col("source")).collect().toSeq
    assert(got == fromScratch(t, 1))
    assert(!got.exists(_.getString(0) == "src2"),
      "a fully-retracted group must not surface as a zero row")
  }
}
