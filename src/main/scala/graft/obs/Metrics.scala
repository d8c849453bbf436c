package graft.obs

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution observability — the reference's Counter stats
  * (`pipeline/utils/api.py:22`, incremented at `api.py:113-114,169-170,
  * 184-185,209-212`; SURVEY R17/R18) promoted to SparkListener task
  * metrics: rows/bytes read, shuffle traffic, spill, task counts and
  * failures, aggregated per measured block.
  */
object Metrics {

  case class Report(
      tasks: Long, failedTasks: Long,
      recordsRead: Long, bytesRead: Long,
      shuffleBytesWritten: Long, shuffleBytesRead: Long,
      memorySpilled: Long, diskSpilled: Long,
      executorRunTimeMs: Long)

  private class Collector extends SparkListener {
    val tasks, failed, records, bytes, shufW, shufR, memSpill, diskSpill, runMs = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.increment()
      if (t.reason != org.apache.spark.Success) failed.increment()
      val m = t.taskMetrics
      if (m != null) {
        records.add(m.inputMetrics.recordsRead)
        bytes.add(m.inputMetrics.bytesRead)
        shufW.add(m.shuffleWriteMetrics.bytesWritten)
        shufR.add(m.shuffleReadMetrics.totalBytesRead)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
        runMs.add(m.executorRunTime)
      }
    }
  }

  /** Run `body` with a task-metrics collector attached; returns (result,
    * aggregated report). Waits for the listener bus to drain so late
    * task-end events are counted. */
  def measure[A](spark: SparkSession)(body: => A): (A, Report) = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    try {
      val r = body
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext, 10000)
      (r, Report(c.tasks.sum, c.failed.sum, c.records.sum, c.bytes.sum,
        c.shufW.sum, c.shufR.sum, c.memSpill.sum, c.diskSpill.sum, c.runMs.sum))
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
