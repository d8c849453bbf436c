package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

/** Z-order clustered writes: Morton-key layout gives narrow per-file
  * min/max stats on BOTH dimensions — the property min/max pruning
  * exploits — where a single-column sort is narrow on one dimension
  * and full-width on the other. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("morton interleave: bit i of a lands at 2i, b at 2i+1") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (0xABCDL, 0x1234L)).toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b"), 16).as("z"))
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)).sum
    val got = df.collect().map(_.getLong(0))
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (0xABCDL, 0x1234L)).map { case (a, b) => ref(a, b) }
    assert(got.toSeq == want)
    // interleave of full-width inputs fills all 32 bits
    assert(ref(65535L, 65535L) == 0xFFFFFFFFL)
  }

  test("quantize matches integer floor division over the full domain") {
    import spark.implicits._
    val mn = 7L; val mx = 9876L
    val xs = (mn to mx by 13L) :+ mx
    val got = xs.toDF("x").select(ZOrder.quantize(col("x"), mn, mx, 16).as("q"))
      .collect().map(_.getLong(0))
    val want = xs.map(x => (x - mn) * 65535L / (mx - mn))
    assert(got.toSeq == want.toSeq)
    assert(got.head == 0L && got.last == 65535L)
  }

  test("z-ordered files carry narrow min/max stats on BOTH dims; pk-sort is full-width on day") {
    val out = "/root/repo/target/test_zorder"
    val df = ZOrder.lineitemZ(spark, sf)
    ZOrder.writeZOrdered(df, out)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())

    // per-FILE dim ranges — exactly the stats a pruning reader consults
    def widths(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val w = d.withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("l_partkey") - min("l_partkey")).cast("double").as("wp"),
          (max("day") - min("day")).cast("double").as("wd"))
        .agg(avg("wp"), avg("wd")).head()
      (w.getDouble(0), w.getDouble(1))
    }
    val Array(gp, gd) = df.agg(
      (max("l_partkey") - min("l_partkey")).cast("double"),
      (max("day") - min("day")).cast("double")).head().toSeq
      .map(_.asInstanceOf[Double]).toArray

    val (zwp, zwd) = widths(back)
    // 16 buckets = a 2-bit prefix per dim → per-file width ≈ 1/4 of the
    // global range on EACH dimension
    assert(zwp <= 0.35 * gp, f"z-layout partkey width $zwp%.0f vs global $gp%.0f")
    assert(zwd <= 0.35 * gd, f"z-layout day width $zwd%.0f vs global $gd%.0f")

    // contrast: the same data sorted by partkey alone — narrow partkey,
    // full-width day (no pruning on the second dimension)
    val sortedOut = "/root/repo/target/test_pksort"
    df.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sortedOut)
    val (swp, swd) = widths(spark.read.parquet(sortedOut))
    assert(swp <= 0.35 * gp, f"pk-sort partkey width $swp%.0f vs global $gp%.0f")
    assert(swd >= 0.70 * gd, f"pk-sort day width $swd%.0f should be ~full range $gd%.0f")
  }

  test("q_zorder_write manifest: bucket assignment is the declared z prefix") {
    val m = ZOrder.qZorderWrite(spark, sf).collect()
    assert(m.nonEmpty && m.length <= (1 << ZOrder.BucketBits))
    val n = m.map(_.getAs[Long]("n")).sum
    assert(n == Tables.lineitem(spark, sf).count())
    // buckets are ordered along the curve: monotone zfile, disjoint
    // [min,max] z ranges are implied by the prefix rule; spot-check the
    // stats columns are populated and consistent
    m.foreach { r =>
      assert(r.getAs[Long]("min_pk") <= r.getAs[Long]("max_pk"))
      assert(r.getAs[Long]("min_day") <= r.getAs[Long]("max_day"))
    }
  }
}
