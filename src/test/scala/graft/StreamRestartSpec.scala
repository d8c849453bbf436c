package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamRestartSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("checkpoint restart delivers each staged file exactly once") {
    val got = graft.streaming.Restart.qStreamRestart(spark, sf)
      .collect().toSeq
    val want = Tables.events(spark, sf)
      .filter(col("user_id") % 20 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"),
        graft.ops.Exact.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // no duplicate delivery anywhere: per-type n == distinct ids
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"type ${r.getString(0)}: ${r.getLong(1)} rows but ${r.getLong(2)} distinct ids — replay or drop")
    }
    // the second lifetime resumed instead of reprocessing: the sink
    // holds both halves exactly once even though lifetime 2 saw the
    // full stage dir (half 1's files were already in the checkpoint's
    // seen-files log)
    val tag = sf.replaceAll(".*/", "")
    val sink = spark.read.parquet(graft.GraftPaths.sink("graft_restart_sink", tag))
    val staged = Tables.events(spark, sf).filter(col("user_id") % 20 === 0).count()
    assert(sink.count() == staged)
    assert(sink.select(col("event_id")).distinct().count() == staged)
  }
}
