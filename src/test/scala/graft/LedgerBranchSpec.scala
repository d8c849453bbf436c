package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ledger

/** Laws of WRITE-AUDIT-PUBLISH branches: a branch is a full ledger
  * table cut from a parent version by manifest reference (metadata-
  * only), commits to it are invisible to the parent, publish
  * fast-forwards the parent to the audited branch head exactly once,
  * and every conflict path aborts loudly instead of publishing
  * something nobody audited. */
class LedgerBranchSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def freshTable(name: String, n: Long = 300L): String = {
    val table = Ledger.tableRoot(name)
    val docs = (0L until n).map(i => (i, s"src${i % 3}", s"body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, table, docs, "doc_id", nFiles = 4)
    table
  }

  private def upserts(ids: Seq[Long], tag: String) =
    ids.map(i => (i, "upsert", "srcB", s"$tag $i")).toDF("doc_id", "op", "source", "text")

  test("branch creation is metadata-only and commits stay branch-local") {
    val table = freshTable("branch_spec_iso")
    val b = Ledger.branch(spark, table, 0, "stage")
    // v0 of the branch references the parent's files byte-for-byte
    val pm = Ledger.manifest(spark, table, 0).select("path").collect().map(_.getString(0)).toSet
    val bm = Ledger.manifest(spark, b, 0).select("path").collect().map(_.getString(0)).toSet
    assert(bm == pm, "branch v0 must reference the base version's files")
    Ledger.merge(spark, b, 0, upserts(Seq(1L, 2L), "staged"), "doc_id")
    // parent: no new version, content untouched
    assert(Ledger.latestVersion(spark, table) == 0)
    assert(Ledger.readVersion(spark, table, 0)
      .filter(col("text").startsWith("staged")).count() == 0)
    // branch: the commit is there
    assert(Ledger.readVersion(spark, b, 1)
      .filter(col("text").startsWith("staged")).count() == 2)
  }

  test("publish fast-forwards the parent to the branch head, once") {
    val table = freshTable("branch_spec_pub")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(5L, 6L, 7L), "published"), "doc_id")
    val v = Ledger.publish(spark, table, "stage")
    assert(v == 1)
    assert(Ledger.latestVersion(spark, table) == 1)
    val head = Ledger.readVersion(spark, table, 1)
    assert(head.filter(col("text").startsWith("published")).count() == 3)
    assert(head.count() == 300)
    // the audited snapshot went live EXACTLY as committed: manifests match
    val bm = Ledger.manifest(spark, b, 1).select("path").collect().map(_.getString(0)).toSet
    val pm = Ledger.manifest(spark, table, 1).select("path").collect().map(_.getString(0)).toSet
    assert(pm == bm)
    // a second publish must abort: the parent is no longer at the base
    val e = intercept[java.util.ConcurrentModificationException](
      Ledger.publish(spark, table, "stage"))
    assert(e.getMessage.contains("aborted"))
  }

  test("publish aborts when the parent advanced past the audited base") {
    val table = freshTable("branch_spec_conf")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(9L), "staged"), "doc_id")
    // a direct writer lands v1 on the parent while the audit runs
    Ledger.merge(spark, table, 0, upserts(Seq(40L), "direct"), "doc_id")
    intercept[java.util.ConcurrentModificationException](
      Ledger.publish(spark, table, "stage"))
    assert(Ledger.readVersion(spark, table, 1)
      .filter(col("text").startsWith("staged")).count() == 0,
      "the un-audited snapshot must not leak")
    // re-branch from the new head, re-stage, publish succeeds
    val b2 = Ledger.branch(spark, table, 1, "stage2")
    Ledger.merge(spark, b2, 0, upserts(Seq(9L), "staged"), "doc_id")
    assert(Ledger.publish(spark, table, "stage2") == 2)
    val head = Ledger.readVersion(spark, table, 2)
    assert(head.filter(col("text").startsWith("staged")).count() == 1)
    assert(head.filter(col("text").startsWith("direct")).count() == 1,
      "the re-branched snapshot was cut from v1, so it carries the direct write")
  }

  test("dropBranch removes an unpublished branch; published branches refuse") {
    val table = freshTable("branch_spec_drop")
    val b = Ledger.branch(spark, table, 0, "bad")
    Ledger.merge(spark, b, 0, upserts(Seq(3L), "poison"), "doc_id")
    Ledger.dropBranch(spark, table, "bad")
    intercept[IllegalArgumentException](Ledger.branchBase(spark, table, "bad"))
    // parent unaffected
    assert(Ledger.readVersion(spark, table, 0).count() == 300)
    // published branch: its data files are live in the parent — refuse
    val g = Ledger.branch(spark, table, 0, "good")
    Ledger.merge(spark, g, 0, upserts(Seq(4L), "kept"), "doc_id")
    Ledger.publish(spark, table, "good")
    intercept[IllegalArgumentException](Ledger.dropBranch(spark, table, "good"))
    assert(Ledger.readVersion(spark, table, 1)
      .filter(col("text").startsWith("kept")).count() == 1)
  }

  test("re-branching a published name refuses; an unpublished name replaces freely") {
    val table = freshTable("branch_spec_rebranch")
    // unpublished replace: the audit-failed redo path
    Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, Ledger.branch(spark, table, 0, "stage"), 0,
      upserts(Seq(8L), "redo"), "doc_id")
    // published replace: the branch dir holds files live in the parent —
    // a blind delete-and-recreate would corrupt every parent version
    // referencing them
    Ledger.publish(spark, table, "stage")
    val e = intercept[IllegalArgumentException](
      Ledger.branch(spark, table, 1, "stage"))
    assert(e.getMessage.contains("published"))
    // the published head still reads in full (nothing was deleted)
    val head = Ledger.readVersion(spark, table, 1)
    assert(head.count() == 300)
    assert(head.filter(col("text").startsWith("redo")).count() == 1)
    // a fresh name branches fine
    Ledger.branch(spark, table, 1, "stage-2")
  }

  test("dropBranch's published check is O(1): zero Spark jobs at any parent length") {
    val table = freshTable("branch_spec_dropo1")
    val b = Ledger.branch(spark, table, 0, "audited")
    Ledger.merge(spark, b, 0, upserts(Seq(17L), "kept"), "doc_id")
    Ledger.publish(spark, table, "audited")
    // grow the parent: the check must not scan these manifests
    (1 to 4).foreach(v =>
      Ledger.merge(spark, table, v, upserts(Seq(100L + v), s"grow$v"), "doc_id"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // quiesce first: run a flush job and wait for its event so any
      // stray late-arriving events from the merges above are drained,
      // then SNAPSHOT — the assertion is on the delta past this point,
      // so background listener noise can't flake an exact-count check
      spark.sparkContext.parallelize(Seq(1)).count()
      val quiesce = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < quiesce)
        Thread.sleep(20)
      Thread.sleep(100)
      val before = jobs.get()
      intercept[IllegalArgumentException](Ledger.dropBranch(spark, table, "audited"))
      // flush: one known job; listener events are async, so poll for it
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < before + 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(jobs.get() - before <= 1,
        s"the published check must be one marker probe, not Spark jobs " +
          s"(saw ${jobs.get() - before - 1} beyond the flush job)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("rebase onto an advanced parent: disjoint deltas splice and publish serially") {
    val table = freshTable("branch_spec_rebase")
    val b = Ledger.branch(spark, table, 0, "stage")
    // branch edits keys 1,2 (first key-range file); the audit runs...
    Ledger.merge(spark, b, 0, upserts(Seq(1L, 2L), "staged"), "doc_id")
    // ...while two direct parent commits land on the LAST key-range file
    Ledger.merge(spark, table, 0, upserts(Seq(280L), "direct"), "doc_id")
    Ledger.merge(spark, table, 1, upserts(Seq(281L), "direct"), "doc_id")
    // publish would abort (parent at v2, base 0) — rebase instead
    val bv = Ledger.rebaseBranch(spark, table, "stage", "doc_id")
    assert(bv == 2)
    assert(Ledger.branchBase(spark, table, "stage") == 2, "base advanced to the parent head")
    // the rebased branch head shows BOTH sides (serial parent-then-branch)
    val bh = Ledger.readVersion(spark, b, bv)
    assert(bh.count() == 300)
    assert(bh.filter(col("text").startsWith("staged")).count() == 2)
    assert(bh.filter(col("text").startsWith("direct")).count() == 2)
    // and publish now proceeds against the new base
    assert(Ledger.publish(spark, table, "stage") == 3)
    val head = Ledger.readVersion(spark, table, 3)
    assert(head.count() == 300)
    assert(head.filter(col("text").startsWith("staged")).count() == 2)
    assert(head.filter(col("text").startsWith("direct")).count() == 2)
  }

  test("rebase aborts when the parent rewrote a file the branch rewrote") {
    val table = freshTable("branch_spec_rebase_hit")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(1L, 2L), "staged"), "doc_id")
    // same key-range file as the branch's edit
    Ledger.merge(spark, table, 0, upserts(Seq(3L), "direct"), "doc_id")
    val e = intercept[java.util.ConcurrentModificationException](
      Ledger.rebaseBranch(spark, table, "stage", "doc_id"))
    assert(e.getMessage.contains("rewrote files"))
  }

  test("rebase aborts on insert-insert key overlap even with no shared file") {
    val table = freshTable("branch_spec_rebase_ins")
    val b = Ledger.branch(spark, table, 0, "stage")
    // both sides INSERT the same brand-new key: neither rewrites a base
    // file, so only the key-range check can see the collision
    Ledger.merge(spark, b, 0, upserts(Seq(9999L), "staged"), "doc_id")
    Ledger.merge(spark, table, 0, upserts(Seq(9999L), "direct"), "doc_id")
    val e = intercept[java.util.ConcurrentModificationException](
      Ledger.rebaseBranch(spark, table, "stage", "doc_id"))
    assert(e.getMessage.contains("overlapping keys"))
  }

  test("rebase aborts when the parent added deletion-vector keys") {
    val table = freshTable("branch_spec_rebase_dv")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(1L), "staged"), "doc_id")
    Ledger.deleteWhere(spark, table, 0, "doc_id", col("doc_id") === 250L)
    val e = intercept[java.util.ConcurrentModificationException](
      Ledger.rebaseBranch(spark, table, "stage", "doc_id"))
    assert(e.getMessage.contains("deletion-vector"))
  }

  test("a dead publish (marker without manifest, claim released) unwedges") {
    val table = freshTable("branch_spec_deadpub")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(19L), "doomed"), "doc_id")
    // simulate a publisher dying between the _published marker and the
    // parent manifest: the marker records target v1, the claim for v1
    // is held, and no v1 manifest exists — exactly publish()'s
    // documented conservative residue
    def write(p: String, body: String): Unit = {
      val f = new java.io.File(new org.apache.hadoop.fs.Path(p).toUri.getPath)
      f.getParentFile.mkdirs()
      val w = new java.io.FileWriter(f); w.write(body); w.close()
    }
    write(s"$table/_branches/stage/_published", "1")
    write(s"$table/_claims/v1", "")
    // claim held: the publish could still be in flight — refuse, loudly
    val e = intercept[IllegalStateException](Ledger.dropBranch(spark, table, "stage"))
    assert(e.getMessage.contains("claim"))
    // and a replace refuses the same way
    intercept[IllegalStateException](Ledger.branch(spark, table, 0, "stage"))
    // the operator follows the documented recovery: release the claim.
    // Marker-without-manifest with the claim released = a DEAD publish:
    // nothing references the branch's files, so the name recovers
    assert(new java.io.File(
      new org.apache.hadoop.fs.Path(s"$table/_claims/v1").toUri.getPath).delete())
    Ledger.dropBranch(spark, table, "stage")
    intercept[IllegalArgumentException](Ledger.branchBase(spark, table, "stage"))
    assert(Ledger.latestVersion(spark, table) == 0, "nothing ever published")
    // the name is reusable: branch afresh, publish for real
    val b2 = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b2, 0, upserts(Seq(19L), "landed"), "doc_id")
    assert(Ledger.publish(spark, table, "stage") == 1)
    assert(Ledger.readVersion(spark, table, 1)
      .filter(col("text").startsWith("landed")).count() == 1)
  }

  test("publishWithRebase lands a branch through interleaved direct commits") {
    val table = freshTable("branch_spec_pubreb")
    val b = Ledger.branch(spark, table, 0, "stage")
    // branch inserts brand-new keys (disjoint from everything below)
    Ledger.merge(spark, b, 0, upserts(Seq(5001L, 5002L), "staged"), "doc_id")
    // a busy table: direct commits land AFTER the audit, so a plain
    // publish aborts — twice over (keys 280/281 live in the last base
    // file; the branch never touched it, so every rebase is disjoint)
    Ledger.merge(spark, table, 0, upserts(Seq(280L), "direct"), "doc_id")
    Ledger.merge(spark, table, 1, upserts(Seq(281L), "direct"), "doc_id")
    intercept[java.util.ConcurrentModificationException](
      Ledger.publish(spark, table, "stage"))
    // ONE call replaces the caller's hand-rolled rebase→publish loop
    val v = Ledger.publishWithRebase(spark, table, "stage", "doc_id")
    assert(v == 3, s"published as the serial next version, got v$v")
    val head = Ledger.readVersion(spark, table, 3)
    assert(head.count() == 302)
    assert(head.filter(col("text").startsWith("staged")).count() == 2)
    assert(head.filter(col("text").startsWith("direct")).count() == 2)
    // a GENUINE overlap still aborts through the wrapper: retry can't
    // fix overlapping writes, the conflict must reach the caller
    val c = Ledger.branch(spark, table, 3, "stage2")
    Ledger.merge(spark, c, 0, upserts(Seq(7777L), "mine"), "doc_id")
    Ledger.merge(spark, table, 3, upserts(Seq(7777L), "theirs"), "doc_id")
    intercept[java.util.ConcurrentModificationException](
      Ledger.publishWithRebase(spark, table, "stage2", "doc_id"))
  }

  test("published branch files survive a parent vacuum") {
    val table = freshTable("branch_spec_vac")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(11L, 12L), "kept"), "doc_id")
    Ledger.publish(spark, table, "stage")
    Ledger.vacuum(spark, table, keepFrom = 1)
    val head = Ledger.readVersion(spark, table, 1)
    assert(head.count() == 300)
    assert(head.filter(col("text").startsWith("kept")).count() == 2)
  }

  test("the change feed works on a branch: staged commits are CDF-visible branch-locally") {
    val table = freshTable("branch_spec_cdf")
    val b = Ledger.branch(spark, table, 0, "stage")
    Ledger.merge(spark, b, 0, upserts(Seq(21L, 22L), "staged"), "doc_id")
    val feed = Ledger.readChanges(spark, b, 0, 1, "doc_id")
      .select("op", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("update", 21L), ("update", 22L)),
      s"branch CDF must carry exactly the staged changes, got $feed")
    // after publish, the SAME diff is the parent's v0->v1 feed
    Ledger.publish(spark, table, "stage")
    val pfeed = Ledger.readChanges(spark, table, 0, 1, "doc_id")
      .select("op", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pfeed == feed, "the published version's change feed equals the branch's")
  }

  test("a branch cut from a version with a pending deletion vector carries it") {
    val table = freshTable("branch_spec_dv")
    Ledger.deleteWhere(spark, table, 0, "doc_id", col("doc_id") % 50 === 0)
    val b = Ledger.branch(spark, table, 1, "stage")
    assert(Ledger.readVersion(spark, b, 0).count() == 300 - 6,
      "the branch must read through the base's deletion vector")
    Ledger.merge(spark, b, 0, upserts(Seq(13L), "kept"), "doc_id")
    Ledger.publish(spark, table, "stage")
    val head = Ledger.readVersion(spark, table, 2)
    assert(head.filter(col("doc_id") % 50 === 0).count() == 0,
      "publish must carry the branch head's deletion vector")
    assert(head.filter(col("text").startsWith("kept")).count() == 1)
  }
}
