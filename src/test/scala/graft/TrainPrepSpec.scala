package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TrainPrep

/** Structural laws of the training-data prep operators (the oracle
  * pins exact values; these pin the invariants a training pipeline
  * relies on). */
class TrainPrepSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  test("chunking covers every document exactly to its end, nothing dropped") {
    val chunks = TrainPrep.qChunk(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val cover = chunks.groupBy(col("doc_id"))
      .agg(min(col("start")).as("first_start"),
        max(col("start") + col("chunk_len")).as("cover_end"),
        min(col("chunk_len")).as("min_len"))
      .join(docs, Seq("doc_id"))
    assert(cover.filter(col("first_start") =!= 0).count() == 0)
    assert(cover.filter(col("cover_end") =!= col("n")).count() == 0,
      "last chunk must reach the end of the token stream")
    assert(cover.filter(col("min_len") <= 0).count() == 0)
    // short docs produce exactly one chunk
    assert(chunks.join(docs.filter(col("n") <= 64), Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).count().filter(col("count") =!= 1).count() == 0)
  }

  test("packing partitions each source's docs into contiguous bins, all docs placed") {
    val packed = TrainPrep.qPack(spark, sf)
    val perSource = packed.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_placed"), max(col("bin")).as("max_bin"),
        count(lit(1)).as("n_bins"))
    val docs = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    assert(perSource.join(docs, Seq("source"))
      .filter(col("n_placed") =!= col("n_docs")).count() == 0, "every doc lands in a bin")
    assert(perSource.filter(col("n_bins") =!= col("max_bin") + 1).count() == 0,
      "bins are contiguous from 0")
    // doc order within a source maps monotonically to bins
    assert(packed.withColumn("prev_last",
        lag(col("last_doc"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("bin"))))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
      .count() == 0)
  }

  test("mixture sampling achieves each language's configured rate") {
    val got = TrainPrep.qMixture(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    val want = TrainPrep.mixtureWeights.toMap
    got.foreach { case (lang, rate) =>
      val target = want.getOrElse(lang, TrainPrep.mixtureDefault)
      assert(math.abs(rate - target) < 0.15,
        f"$lang: achieved $rate%.2f vs configured $target%.2f")
    }
  }

  test("stratified sample: exactly n per source, ranks dense from 1") {
    val got = TrainPrep.qStratified(spark, sf, n = 5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"), min(col("rk")).as("lo"), max(col("rk")).as("hi"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 1L && r.getLong(3) == 5L,
        s"source ${r.getString(0)}: expected ranks 1..5, got $r")
    }
  }

  test("temperature resampling: rarest language keeps ~all, dominant is downsampled") {
    val rows = TrainPrep.qTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val byDocs = rows.sortBy(_._3)
    val (rarest, dominant) = (byDocs.head, byDocs.last)
    assert(rarest._2 == 1.0, s"rarest language must keep rate 1.0: $rarest")
    assert(dominant._2 < 1.0 && dominant._2 > 0.0)
    // achieved rates track the target within sampling noise on these sizes
    rows.foreach { case (l, rate, n, kept) =>
      val achieved = kept.toDouble / n
      assert(math.abs(achieved - rate) < 0.25, s"$l: target $rate achieved $achieved")
    }
  }

  test("quality gate keeps the top half per source (percent_rank cut is exact)") {
    val docsPerSource = Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TrainPrep.qQualityGate(spark, sf).collect().foreach { r =>
      val (src, kept) = (r.getString(0), r.getLong(1))
      val n = docsPerSource(src)
      // percent_rank <= 0.5 admits ceil((n-1)/2)+1 rows for distinct ranks
      assert(kept >= n / 2 && kept <= n / 2 + 2, s"$src: kept $kept of $n")
    }
  }

  test("distribution matching: tightest bucket keeps all, kept shape tracks the target") {
    val rows = TrainPrep.qDistMatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._4 == 1.0), "the normalizing bucket must keep rate 1.0")
    rows.foreach { case (bucket, nSrc, nTgt, rate, kept) =>
      assert(kept <= nSrc)
      if (nTgt == 0) assert(rate == 0.0 && kept == 0L, s"bucket $bucket absent from target must drop")
      // achieved rate tracks the per-bucket target within hash noise
      if (nSrc >= 20) assert(math.abs(kept.toDouble / nSrc - rate) < 0.3,
        s"bucket $bucket: target $rate achieved ${kept.toDouble / nSrc}")
    }
  }

  test("tf-idf ranks are dense per doc and ordered by (tf desc, df asc)") {
    val t = TrainPrep.qTfidf(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rnk"))
    val bad = t
      .withColumn("prev_tf", lag(col("tf"), 1).over(w))
      .withColumn("prev_df", lag(col("df"), 1).over(w))
      .filter(col("prev_tf").isNotNull &&
        (col("tf") > col("prev_tf") ||
         (col("tf") === col("prev_tf") && col("df") < col("prev_df"))))
    assert(bad.count() == 0, "rank order must follow (tf desc, df asc)")
    assert(t.groupBy(col("doc_id")).agg(max(col("rnk")).as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c")).count() == 0, "ranks are dense 1..k")
  }
}
