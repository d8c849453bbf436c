package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Ledger

/** MULTI-PROCESS CONDITIONAL-PUT stress (round-12 evidence): the
  * [[graft.etl.Ledger.LogStore]] trait has two claim styles —
  * create-exclusive (ProbeOccMulti certifies it across real JVMs) and
  * the conditional put a plain-S3 deployment needs. The conditional-put
  * impl was stressed in-process only (r11 VERDICT #6); this probe runs
  * the SAME N-child-JVM harness through
  * [[graft.etl.Ledger.FileCasLogStore]] — the conditional-put contract
  * backed by one shared coordination file under a cross-process
  * FileLock — so the TRAIT's serializability guarantee is process-grade
  * for both claim styles, not one storage's create semantics.
  *
  * Parent: creates the table (400 keys, 8 range files), forks N child
  * JVMs of [[ProbeCasWriter]], then asserts the same serializability
  * law as ProbeOccMulti: every writer committed a distinct consecutive
  * version, no lost update, every intermediate version internally
  * consistent. Prints one JSON line for SCALING_r12. */
object ProbeCasMulti {
  def main(args: Array[String]): Unit = {
    val nWriters = if (args.nonEmpty) args(0).toInt else 6
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = Ledger.tableRoot("cas_multiproc")
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(t), spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(t), true)
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}", s"document body $i"))
      .toDF("doc_id", "source", "text")
    Ledger.create(spark, t, docs, "doc_id", nFiles = 8)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val jopts = Seq(
      "--add-exports", "java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens", "java.base/java.nio=ALL-UNNAMED",
      "--add-opens", "java.base/java.util=ALL-UNNAMED",
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "--add-opens", "java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens", "java.base/sun.util.calendar=ALL-UNNAMED",
      "--add-opens", "java.base/java.util.concurrent=ALL-UNNAMED",
      "--add-opens", "java.base/sun.security.action=ALL-UNNAMED")
    val t0 = System.nanoTime()
    val procs = (0 until nWriters).map { i =>
      val pb = new ProcessBuilder(
        (Seq(javaBin, "-Xmx3g") ++ jopts ++
          Seq("-cp", cp, "graft.ProbeCasWriter", t, i.toString)): _*)
      pb.redirectErrorStream(true)
      (i, pb.start())
    }
    val results = procs.map { case (i, p) =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      val v = out.linesIterator
        .collectFirst { case l if l.startsWith("CAS_COMMIT v=") =>
          l.stripPrefix("CAS_COMMIT v=").split(" ")(0).toInt }
      require(rc == 0 && v.isDefined,
        s"writer $i failed (rc=$rc):\n${out.takeRight(4000)}")
      v.get
    }
    val wallSec = (System.nanoTime() - t0) / 1e9

    // serializability: distinct consecutive versions, no lost update,
    // every intermediate version carries exactly v edits
    require(results.toSet == (1 to nWriters).toSet,
      s"every writer must commit a distinct consecutive version: $results")
    require(Ledger.latestVersion(spark, t) == nWriters)
    val last = Ledger.readVersion(spark, t, nWriters).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    require(last.size == 400, "upsert-only race must preserve row count")
    (0 until nWriters).foreach { i =>
      require(last(i * 50L + 5L) == s"writer $i wrote ${i * 50L + 5L}",
        s"writer $i's update must survive every rebase")
    }
    (1 to nWriters).foreach { v =>
      val dfv = Ledger.readVersion(spark, t, v)
      require(dfv.count() == 400, s"v$v must have 400 rows")
      require(dfv.filter(col("source").startsWith("w")).count() == v,
        s"v$v must carry exactly $v committed edits")
    }
    // and the coordination table holds exactly the claimed versions
    val claims = scala.io.Source.fromFile(s"${t.stripPrefix("file:")}/_cas_claims")
      .getLines().toSeq
    require(claims.size == nWriters && claims.distinct.size == nWriters,
      s"the CAS store must hold exactly one claim per version: $claims")
    println(s"""{"metric":"cas_multiproc","writers":$nWriters,""" +
      s""""versions":[${results.mkString(",")}],"serializable":true,""" +
      f""""wall_sec":$wallSec%.1f}""")
    spark.stop()
  }
}

/** One conditional-put writer as its own JVM: prepares a single-key
  * merge against version 0 (deliberately stale — commitPrepared's
  * validate+rebase loop must carry it to whatever version the race
  * assigns) and commits through the SHARED file-backed CAS store.
  * Prints `CAS_COMMIT v=<N>` on success. */
object ProbeCasWriter {
  def main(args: Array[String]): Unit = {
    val Array(table, idStr) = args.take(2)
    val i = idStr.toInt
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        s"${System.getProperty("java.io.tmpdir")}/cas_writer_$i")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = new Ledger.FileCasLogStore(
      s"${table.stripPrefix("file:")}/_cas_claims")
    val key = i * 50L + 5L
    val p = Ledger.prepareMerge(spark, table, 0,
      Seq((key, "upsert", s"w$i", s"writer $i wrote $key"))
        .toDF("doc_id", "op", "source", "text"), "doc_id")
    val v = Ledger.commitPrepared(spark, table, p,
      maxAttempts = 64, waitMs = 120000, logStore = store)
    println(s"CAS_COMMIT v=$v writer=$i")
    spark.stop()
  }
}
