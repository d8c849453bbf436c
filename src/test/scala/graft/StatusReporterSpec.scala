package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.obs.{RollingLog, StatusReporter}

/** Console-UX observability (reference `pipeline/utils/api.py:81-107`
  * status loop, `pipeline/utils/logs.py:14-53` rotating logs — SURVEY
  * R17/R31/R32). */
class StatusReporterSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("rolling log rotates at maxBytes, keeps backupCount backups, drops the oldest") {
    val dir = Files.createTempDirectory("rolllog")
    val base = dir.resolve("project.log")
    val log = RollingLog.freshStart(base, maxBytes = 50, backupCount = 2)
    // each line is 20 bytes + newline; 2 fit per file before rollover
    (0 until 9).foreach(i => log.append(f"line-$i%02d-xxxxxxxxxxxx"))
    val b1 = dir.resolve("project.log.1")
    val b2 = dir.resolve("project.log.2")
    assert(Files.exists(base) && Files.exists(b1) && Files.exists(b2))
    assert(!Files.exists(dir.resolve("project.log.3")), "beyond backupCount must be dropped")
    // newest lines in base, next-newest in .1, older in .2; oldest GONE
    val read = (p: java.nio.file.Path) => new String(Files.readAllBytes(p), UTF_8)
    assert(read(base).contains("line-08"))
    assert(read(b1).contains("line-06") && read(b1).contains("line-07"))
    assert(read(b2).contains("line-04") && read(b2).contains("line-05"))
    assert(!(read(base) + read(b1) + read(b2)).contains("line-00"))
  }

  test("fresh start truncates an existing base file (reference fresh-per-run)") {
    val dir = Files.createTempDirectory("rolllog2")
    val base = dir.resolve("project.log")
    Files.write(base, "stale\n".getBytes(UTF_8))
    RollingLog.freshStart(base).append("new-run")
    val content = new String(Files.readAllBytes(base), UTF_8)
    assert(content.contains("new-run") && !content.contains("stale"))
  }

  test("status reporter counts a real job's tasks/rows and ticks the file log") {
    val dir = Files.createTempDirectory("statuslog")
    val buf = new ByteArrayOutputStream()
    val rep = StatusReporter.start(spark, new PrintStream(buf, true, "UTF-8"),
      isTty = false, intervalBatchMs = 200L, logDir = Some(dir))
    try {
      graft.ops.Relational.q1Pricing(spark, sf).count()
      Thread.sleep(600) // ≥1 tick at the batch cadence
    } finally rep.stop()
    val line = rep.renderLine()
    // a full lineitem scan + aggregate ran: tasks, rows, stages all nonzero
    assert(line.matches(".*Tasks: [1-9]\\d*.*"), line)
    assert(line.matches(".*Rows: [1-9]\\d*.*"), line)
    assert(line.matches(".*Stages: [1-9]\\d*.*"), line)
    assert(line.contains("Failed: 0"), line)
    val console = buf.toString("UTF-8")
    assert(console.linesIterator.exists(_.startsWith("Tasks: ")), "non-tty mode prints full lines")
    assert(!console.contains("\r"), "non-tty mode must not carriage-return")
    val fileLines = new String(Files.readAllBytes(dir.resolve("project.log")), UTF_8)
    assert(fileLines.linesIterator.nonEmpty && fileLines.startsWith("Tasks: "))
  }

  test("tty mode refreshes in place and log() moves below the status line") {
    val buf = new ByteArrayOutputStream()
    val rep = StatusReporter.start(spark, new PrintStream(buf, true, "UTF-8"),
      isTty = true, intervalTtyMs = 100L)
    try {
      Thread.sleep(350)
      rep.log("a log record")
    } finally rep.stop()
    val console = buf.toString("UTF-8")
    assert(console.contains("\rTasks: "), "tty ticks refresh with carriage return")
    assert(console.contains("\na log record"), "records are pushed below the status line")
  }
}
