package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-5 feature-prep operators: nucleus vocab
  * truncation, curriculum staging, attribution, dyadic EWMA, z-score. */
class FeaturePrepSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  import spark.implicits._

  test("top-p keeps exactly the sub-90% prefix plus the crossing row") {
    val out = graft.text.TrainPrep.qTopP(spark, sf).cache()
    // within each language the kept set is a prefix of the frequency
    // order: max coverage ≥ 0.9, and removing the last row drops below
    val perLang = out.groupBy($"lang")
      .agg(max($"coverage").as("maxcov"), count(lit(1)).as("kept"))
      .collect()
    perLang.foreach { r =>
      assert(r.getAs[Double]("maxcov") >= 0.9)
      assert(r.getAs[Long]("kept") > 0)
    }
    // kept set is a true prefix: exactly one crossing row (≥0.9) per
    // language, and it is the last kept row
    val crossing = out.filter($"coverage" >= 0.9)
      .groupBy($"lang").count().filter($"count" =!= 1).count()
    assert(crossing === 0)
    out.unpersist()
  }

  test("curriculum stages are equal-depth within each language") {
    val out = graft.text.TrainPrep.qCurriculum(spark, sf).cache()
    val sizes = out.groupBy($"lang", $"stage").count()
      .groupBy($"lang").agg((max($"count") - min($"count")).as("spread"))
      .collect()
    // ntile: group sizes differ by at most 1
    sizes.foreach { r => assert(r.getAs[Long]("spread") <= 1) }
    // stage is monotone in difficulty: max n_chars of stage k ≤ min of k+1
    val bounds = out.groupBy($"lang", $"stage")
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
    val bad = bounds.as("a").join(bounds.as("b"),
        $"a.lang" === $"b.lang" && $"a.stage" === $"b.stage" - 1 &&
          $"a.hi" > $"b.lo")
      .count()
    assert(bad === 0)
    out.unpersist()
  }

  test("attribution credits the nearest preceding click") {
    val out = graft.ops.EventAnalytics.qAttribution(spark, sf).cache()
    assert(out.count() > 0)
    // first-touch never later than last-touch when both exist
    assert(out.filter($"first_touch_t" > $"last_touch_t").count() === 0)
    // last-touch never later than the purchase itself
    assert(out.filter($"last_touch_t" > $"t").count() === 0)
    // unattributed flag is exactly the null marker
    assert(out.filter(($"last_touch_t".isNull) =!= ($"unattributed" === 1)).count() === 0)
    out.unpersist()
  }

  test("dyadic ewma matches a hand computation on a planted series") {
    val df = Seq((1L, 1L, "2024-01-01 00:00:00", 8.0),
      (1L, 2L, "2024-01-01 00:01:00", 4.0),
      (1L, 3L, "2024-01-01 00:02:00", 2.0),
      (1L, 4L, "2024-01-01 00:03:00", 16.0))
      .toDF("user_id", "event_id", "t", "value")
      .withColumn("ts", to_timestamp($"t"))
    // replicate the operator's dag on the fixture
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val got = df.withColumn("ewma",
        $"value"
          + coalesce(lag($"value", 1).over(w), lit(0.0)) * 0.5
          + coalesce(lag($"value", 2).over(w), lit(0.0)) * 0.25
          + coalesce(lag($"value", 3).over(w), lit(0.0)) * 0.125)
      .orderBy($"event_id").select($"ewma").as[Double].collect()
    // 16 + 2·0.5 + 4·0.25 + 8·0.125 = 19 exactly (dyadic weights)
    assert(got.toSeq === Seq(8.0, 8.0, 6.0, 19.0))
    // declared query: sane shape
    val out = graft.ops.EventAnalytics.qEwma(spark, sf)
    assert(out.filter($"ewma".isNull).count() === 0)
  }

  test("zscore standardizes to mean ~0 within each full group") {
    // verify on the FULL standardized table (the declared query
    // subsets rows for output size but fits stats on everything)
    val e = Tables.events(spark, sf)
    val v = $"value".cast("decimal(18,2)")
    val stats = e.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(v).cast("string").cast("double").as("s1"),
        sum(v * v).cast("string").cast("double").as("s2"))
      .select($"event_type", ($"s1" / $"n").as("mean_v"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("sd_v"))
    val z = e.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", (($"value" - $"mean_v") / $"sd_v").as("z"))
    val agg = z.groupBy($"event_type")
      .agg(avg($"z").as("mz"), stddev($"z").as("sz")).collect()
    agg.foreach { r =>
      assert(math.abs(r.getAs[Double]("mz")) < 1e-9)
      assert(math.abs(r.getAs[Double]("sz") - 1.0) < 1e-9)
    }
  }
}
