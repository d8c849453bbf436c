package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger
import graft.etl.Ledger.Check

/** Laws of commit-path CHECK constraints: a violating changeset is
  * refused ATOMICALLY (no version, not even its valid rows), NULL
  * check results count as violations, the OCC prepare path enforces
  * too, ADD CONSTRAINT validates existing content, an interleaved
  * setConstraints conflicts a prepared commit instead of rebasing
  * silently past it, and the nearest-sidecar lookup gives correct
  * time-travel semantics with no per-commit carry step. */
class LedgerConstraintsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private val checks = Seq(
    Check("v_nonneg", "v >= 0"),
    Check("tag_present", "tag IS NOT NULL AND tag <> ''"))

  private def mkTable(name: String): String = {
    val t = Ledger.tableRoot(name)
    val rows = (0L until 200L).map(i => (i, i * 2, s"t${i % 5}"))
      .toDF("k", "v", "tag")
    Ledger.create(spark, t, rows, "k", nFiles = 4, checks = checks)
    t
  }

  private def ups(rows: Seq[(Long, Long, String)]) =
    rows.toDF("k", "v", "tag").select(col("k"), lit("upsert").as("op"),
      col("v"), col("tag"))

  test("violating merge is refused atomically; valid merge lands") {
    val t = mkTable("ck_atomic")
    val bad = ups(Seq((1L, -5L, "t1"), (2L, 9L, "t2"))) // one bad, one fine
    val e = intercept[IllegalArgumentException] {
      Ledger.merge(spark, t, 0, bad, "k")
    }
    assert(e.getMessage.contains("v_nonneg"))
    assert(Ledger.latestVersion(spark, t) == 0)
    // the valid row of the refused changeset must NOT have landed
    assert(Ledger.readVersion(spark, t, 0).filter(col("k") === 2 && col("v") === 9)
      .isEmpty)
    Ledger.merge(spark, t, 0, ups(Seq((1L, 7L, "t1"), (2L, 9L, "t2"))), "k")
    assert(Ledger.latestVersion(spark, t) == 1)
    assert(Ledger.readVersion(spark, t, 1).filter(col("k") === 1).head().getLong(1) == 7L)
  }

  test("NULL check result is a violation, and deletes are never checked") {
    val t = mkTable("ck_null")
    val nullV = Seq((3L, "t3")).toDF("k", "tag")
      .select(col("k"), lit("upsert").as("op"),
        lit(null).cast("long").as("v"), col("tag"))
    val e = intercept[IllegalArgumentException] {
      Ledger.merge(spark, t, 0, nullV, "k")
    }
    assert(e.getMessage.contains("v_nonneg"))
    // a delete row carrying a null payload sails through: deletes add
    // no data, so checks don't apply to them
    val del = Seq(4L).toDF("k").select(col("k"), lit("delete").as("op"),
      lit(null).cast("long").as("v"), lit(null).cast("string").as("tag"))
    Ledger.merge(spark, t, 0, del, "k")
    assert(Ledger.readVersion(spark, t, 1).filter(col("k") === 4).isEmpty)
  }

  test("every violated check is listed, with counts") {
    val t = mkTable("ck_multi")
    val bad = ups(Seq((1L, -1L, ""), (2L, -2L, "ok")))
    val e = intercept[IllegalArgumentException] {
      Ledger.merge(spark, t, 0, bad, "k")
    }
    assert(e.getMessage.contains("v_nonneg (2 rows"))
    assert(e.getMessage.contains("tag_present (1 rows"))
  }

  test("OCC prepare path enforces the same checks") {
    val t = mkTable("ck_occ")
    intercept[IllegalArgumentException] {
      Ledger.prepareMerge(spark, t, 0, ups(Seq((5L, -9L, "t0"))), "k")
    }
    assert(Ledger.latestVersion(spark, t) == 0)
    val v = Ledger.mergeOcc(spark, t, ups(Seq((5L, 50L, "t0"))), "k")
    assert(v == 1)
  }

  test("ADD CONSTRAINT validates existing content and commits metadata-only") {
    val t = mkTable("ck_add")
    // table has v = 2k (even, up to 398): a check it already breaks refuses
    intercept[IllegalArgumentException] {
      Ledger.setConstraints(spark, t, 0, checks :+ Check("v_small", "v < 100"))
    }
    assert(Ledger.latestVersion(spark, t) == 0)
    val filesBefore = Ledger.manifest(spark, t, 0)
      .select("path").collect().map(_.getString(0)).toSet
    Ledger.setConstraints(spark, t, 0, checks :+ Check("v_cap", "v <= 1000"))
    assert(Ledger.latestVersion(spark, t) == 1)
    val filesAfter = Ledger.manifest(spark, t, 1)
      .select("path").collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore) // by reference, zero data I/O
    // the widened set binds the next commit
    val e = intercept[IllegalArgumentException] {
      Ledger.merge(spark, t, 1, ups(Seq((6L, 5000L, "t1"))), "k")
    }
    assert(e.getMessage.contains("v_cap"))
  }

  test("interleaved setConstraints conflicts a prepared commit") {
    val t = mkTable("ck_interleave")
    // prepared under the ORIGINAL checks: v=500 is fine there
    val p = Ledger.prepareMerge(spark, t, 0, ups(Seq((7L, 500L, "t2"))), "k")
    // constraints tighten concurrently (v1 is the metadata commit);
    // existing content tops out at 398, so the cap admits the table
    // but not the prepared row
    Ledger.setConstraints(spark, t, 0, checks :+ Check("v_cap", "v <= 400"))
    val e = intercept[java.util.ConcurrentModificationException] {
      Ledger.commitPrepared(spark, t, p)
    }
    assert(e.getMessage.contains("CHECK-constraint change"))
    // re-preparing against the new head enforces the new set
    intercept[IllegalArgumentException] {
      Ledger.prepareMerge(spark, t, 1, ups(Seq((7L, 500L, "t2"))), "k")
    }
  }

  test("WAP branch inherits the parent's CHECK set; rebase conflicts on a set change") {
    val t = mkTable("ck_branch")
    val b = Ledger.branch(spark, t, 0, "audit")
    // the branch is NOT the one door a violating row can enter through
    intercept[IllegalArgumentException] {
      Ledger.merge(spark, b, 0, ups(Seq((1L, -2L, "t1"))), "k")
    }
    Ledger.merge(spark, b, 0, ups(Seq((1L, 11L, "t1"))), "k")
    // parent tightens its checks after the branch was audited: the
    // branch's rows were validated under the OLD set, so rebase refuses
    Ledger.setConstraints(spark, t, 0, checks :+ Check("v_cap", "v <= 400"))
    val e = intercept[java.util.ConcurrentModificationException] {
      Ledger.rebaseBranch(spark, t, "audit", "k")
    }
    assert(e.getMessage.contains("CHECK-constraint"))
  }

  test("streaming commitBatch enforces the table's checks") {
    val t = mkTable("ck_stream")
    intercept[IllegalArgumentException] {
      Ledger.commitBatch(spark, t, 0L,
        Seq((1L, -3L, "t0")).toDF("k", "v", "tag"), "k")
    }
    assert(Ledger.latestVersion(spark, t) == 0)
    // the refusal happened before the txn marker: the same batchId
    // retries cleanly once the payload is fixed
    assert(Ledger.commitBatch(spark, t, 0L,
      Seq((1L, 3L, "t0")).toDF("k", "v", "tag"), "k"))
    assert(Ledger.latestVersion(spark, t) == 1)
  }

  test("nearest-sidecar lookup: constraints bind from their version on") {
    val t = Ledger.tableRoot("ck_lookup")
    val rows = (0L until 50L).map(i => (i, i, s"t$i")).toDF("k", "v", "tag")
    Ledger.create(spark, t, rows, "k", nFiles = 2) // NO checks at v0
    assert(Ledger.constraintsOf(spark, t, 0).isEmpty)
    Ledger.merge(spark, t, 0, ups(Seq((1L, -1L, "x"))), "k") // unconstrained
    // ADD CONSTRAINT refuses while the violating row is live...
    intercept[IllegalArgumentException] {
      Ledger.setConstraints(spark, t, 1, Seq(Check("v_nonneg", "v >= 0")))
    }
    // ...and succeeds once it's repaired
    Ledger.merge(spark, t, 1, ups(Seq((1L, 1L, "x"))), "k") // v2
    Ledger.setConstraints(spark, t, 2, Seq(Check("v_nonneg", "v >= 0"))) // v3
    assert(Ledger.constraintsOf(spark, t, 2).isEmpty) // time travel: none before
    assert(Ledger.constraintsOf(spark, t, 3).map(_.name) == Seq("v_nonneg"))
    // no carry step to forget: compact (v4) still sees the set
    Ledger.compact(spark, t, 3, "k")
    assert(Ledger.constraintsOf(spark, t, 4).map(_.name) == Seq("v_nonneg"))
    intercept[IllegalArgumentException] {
      Ledger.merge(spark, t, 4, ups(Seq((9L, -9L, "y"))), "k")
    }
  }

  test("unresolvable or non-boolean check expr refused at declaration, not at the next merge") {
    val t = mkTable("ck_validate")
    val e = intercept[IllegalArgumentException] {
      Ledger.setConstraints(spark, t, 0, Seq(Check("typo", "v_misspelled >= 0")))
    }
    assert(e.getMessage.contains("typo") && e.getMessage.contains("does not resolve"))
    assert(Ledger.latestVersion(spark, t) == 0) // refusal is metadata-atomic too
    val e2 = intercept[IllegalArgumentException] {
      Ledger.setConstraints(spark, t, 0, Seq(Check("notbool", "v + 1")))
    }
    assert(e2.getMessage.contains("boolean"))
    assert(Ledger.latestVersion(spark, t) == 0)
  }

  test("a refused CREATE leaves the pre-existing table intact") {
    val t = mkTable("ck_create_safe")
    val before = Ledger.readVersion(spark, t, 0).orderBy("k").collect()
    val bad = Seq((0L, -1L, "t0")).toDF("k", "v", "tag")
    // content violation: refused BEFORE the old table is deleted
    intercept[IllegalArgumentException] {
      Ledger.create(spark, t, bad, "k", checks = checks)
    }
    assert(Ledger.readVersion(spark, t, 0).orderBy("k").collect().toSeq
      == before.toSeq)
    // resolution failure: likewise refused with the prior table intact
    intercept[IllegalArgumentException] {
      Ledger.create(spark, t, bad, "k", checks = Seq(Check("typo", "nope > 0")))
    }
    assert(Ledger.readVersion(spark, t, 0).orderBy("k").collect().toSeq
      == before.toSeq)
  }
}
