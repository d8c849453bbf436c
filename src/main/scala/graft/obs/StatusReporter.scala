package graft.obs

import java.io.PrintStream
import java.nio.file.Path
import java.util.concurrent.atomic.{AtomicBoolean, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** The reference's live console status loop (`pipeline/utils/api.py:81-107`,
  * SURVEY R17/R32) re-expressed over Spark task metrics: a daemon thread
  * renders one cumulative counter line at the reference's cadence —
  * every `intervalTty` on an interactive console (carriage-return
  * refresh, `api.py:99-101`), every `intervalBatch` otherwise (plain
  * line per tick, `api.py:84` "Log every 30s in Docker"). The counters
  * are the engine's analogue of the reference Counter stats: tasks
  * completed/failed (requests/errors), rows and bytes read (responses),
  * shuffle read/write and spill (network traffic), stages (pages), and
  * elapsed minutes.
  *
  * Every tick also lands in an optional [[RollingLog]] — the reference's
  * rotating `logs/project.log` (`pipeline/utils/logs.py:45-50`). Log
  * lines written through [[log]] are prefixed with a newline on a tty
  * first, the `StatusAwareStreamHandler` discipline (`logs.py:8-12`):
  * the cursor sits at the end of the status line, so a bare record
  * would append to it.
  *
  * Scale posture: the listener is O(1) per task-end (LongAdder bumps),
  * the render thread wakes at most once per second, and nothing is
  * collected per-row — safe to leave attached for a 1000-executor run.
  */
final class StatusReporter private (
    spark: SparkSession,
    out: PrintStream,
    isTty: Boolean,
    intervalMs: Long,
    fileLog: Option[RollingLog]) {

  private val tasks, failed, rows, bytes, shufR, shufW, spill, stages = new LongAdder
  private val startNs = System.nanoTime()
  private val running = new AtomicBoolean(true)

  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.increment()
      if (t.reason != org.apache.spark.Success) failed.increment()
      val m = t.taskMetrics
      if (m != null) {
        rows.add(m.inputMetrics.recordsRead)
        bytes.add(m.inputMetrics.bytesRead)
        shufR.add(m.shuffleReadMetrics.totalBytesRead)
        shufW.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.diskBytesSpilled)
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.increment()
  }

  /** One cumulative status line — the reference's field layout
    * (`api.py:86-94`) with engine counters. */
  def renderLine(): String = {
    def mib(v: Long): String = f"${v / 1024.0 / 1024.0}%.1f MiB"
    val mins = (System.nanoTime() - startNs) / 1e9 / 60.0
    f"Tasks: ${tasks.sum} | Failed: ${failed.sum} | Rows: ${rows.sum} | " +
      f"Read: ${mib(bytes.sum)} | ShufR: ${mib(shufR.sum)} | " +
      f"ShufW: ${mib(shufW.sum)} | Spill: ${mib(spill.sum)} | " +
      f"Stages: ${stages.sum} | Elapsed: $mins%.2f minutes"
  }

  private def tick(): Unit = {
    val line = renderLine()
    if (isTty) { out.print("\r" + line); out.flush() }
    else out.println(line)
    fileLog.foreach(_.append(line))
  }

  private val renderThread = new Thread(() => {
    while (running.get()) {
      try Thread.sleep(intervalMs) catch { case _: InterruptedException => () }
      if (running.get()) tick()
    }
  }, "graft-status-reporter")
  renderThread.setDaemon(true)

  /** Write a log record without corrupting the live status line
    * (`logs.py:8-12`): on a tty the cursor sits mid-line, so move below
    * it first. */
  def log(record: String): Unit = {
    if (isTty) out.print("\n")
    out.println(record)
    fileLog.foreach(_.append(record))
  }

  /** Detach the listener, stop the render thread, emit one final line
    * (so short jobs always show their totals). */
  def stop(): Unit = if (running.compareAndSet(true, false)) {
    renderThread.interrupt()
    renderThread.join(2000)
    tick()
    if (isTty) out.println()
    spark.sparkContext.removeSparkListener(listener)
  }
}

object StatusReporter {
  /** Attach and start. `isTty` defaults to a real console check
    * (`stdout.isatty()` in the reference, `api.py:83`); the cadence
    * follows `api.py:84` — `intervalTtyMs` interactive, `intervalBatchMs`
    * otherwise. Pass `logDir` for the reference's rotating file log
    * (fresh each run, 5 MB × 2 backups — `logs.py:42-50`). */
  def start(
      spark: SparkSession,
      out: PrintStream = System.out,
      isTty: Boolean = System.console() != null,
      intervalTtyMs: Long = 1000L,
      intervalBatchMs: Long = 30000L,
      logDir: Option[Path] = None): StatusReporter = {
    val fileLog = logDir.map(d => RollingLog.freshStart(d.resolve("project.log")))
    val r = new StatusReporter(spark, out, isTty,
      if (isTty) intervalTtyMs else intervalBatchMs, fileLog)
    spark.sparkContext.addSparkListener(r.listener)
    r.renderThread.start()
    r
  }
}
