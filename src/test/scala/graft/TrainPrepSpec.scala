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

  test("tf-idf heap form reproduces the window form byte-for-byte") {
    val heap = TrainPrep.qTfidf(spark, sf).collect().map(_.toString)
    val win = TrainPrep.qTfidfWindow(spark, sf).collect().map(_.toString)
    assert(heap.toSeq == win.toSeq,
      "TopKNativeStr per-doc top-k diverged from the window ORDER BY")
  }

  test("BPE trainer merges most frequent pair first, deterministically") {
    import graft.text.Bpe
    // "abab"×3, "ab"×2 → pair (a,b) count 8 beats (b,a) count 3 → merge 1 = (a,b);
    // then ("ab","ab") count 3 beats nothing else → merge 2 = (ab,ab).
    val merges = Bpe.train(Seq("abab" -> 3L, "ab" -> 2L), 2)
    assert(merges == Vector(("a", "b"), ("ab", "ab")))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode("abab", ranks) == Vector("abab"))
    assert(Bpe.encode("ababab", ranks) == Vector("abab", "ab"),
      "lowest-rank merge applies left-to-right, non-overlapping")
    assert(Bpe.encode("ba", ranks) == Vector("b", "a"), "unknown pairs stay split")
    assert(Bpe.encode("", ranks).isEmpty)
    // determinism: identical input → identical merges
    assert(Bpe.train(Seq("abab" -> 3L, "ab" -> 2L), 2) == merges)
  }

  test("BPE decode round-trip: subwords reassemble every corpus word exactly") {
    import graft.text.Bpe
    val ranks = Bpe.merges(spark).zipWithIndex.toMap
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .collect().map(_.getString(0))
    words.foreach { w =>
      assert(Bpe.encode(w, ranks).mkString("") == w,
        s"lossy tokenization of '$w'")
    }
  }

  test("distributed BPE training is bit-identical to the sequential trainer") {
    import graft.text.Bpe
    val k = TrainPrep.bpeTrainRounds
    val dist = Bpe.trainDistributed(spark, sf, k)
    val wc = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seq = Bpe.train(wc, k)
    assert(dist.map(m => (m._1, m._2)) == seq,
      "per-round argmax over distributed pair counts must replay the driver-side trainer")
    assert(dist.sliding(2).forall { s => s.length < 2 || s(0)._3 >= s(1)._3 },
      "BPE merge frequencies are non-increasing (each round's argmax bounds the next)")
    // declared query shape: dense 1-based ranks, K rows on this corpus
    val q = TrainPrep.qBpeTrain(spark, sf).collect()
    assert(q.length == k && q.map(_.getLong(0)).toSeq == (1L to k.toLong))
  }

  test("BpeTokenCount expression equals the reference encoder on every corpus word") {
    import graft.text.Bpe
    val m = Bpe.merges(spark)
    val ranks = m.zipWithIndex.toMap
    // per-word expected counts, computed driver-side by the reference encoder
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .collect().map(_.getString(0))
    assert(words.exists(w => Bpe.encode(w, ranks).length >= 2),
      "the trained table must leave some multi-subword words (non-trivial encode)")
    // expression total per doc == sum of reference-encoded word counts
    val got = TrainPrep.qBpeEncode(spark, sf)
      .select(col("doc_id"), col("n_subwords")).as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toMap
    val expected = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map { r =>
        r.getLong(0) -> r.getString(1).split(" ", -1).map(w => Bpe.encode(w, ranks).length.toLong).sum
      }.toMap
    assert(got == expected)
  }

  test("BPE pack: every doc except a bin's straddling tail starts within the budget") {
    import graft.text.Bpe
    val m = Bpe.merges(spark)
    val packed = TrainPrep.qPackBpe(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val detail = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        graft.functions.BpeEncode.bpeTokenCount(col("text"), m).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(TrainPrep.bpePackBudget.toDouble)))
    // law: a doc STARTS inside its bin's budget window by construction;
    // assert the derived bin matches the declared aggregation exactly
    val re = detail.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_subwords"))
    assert(re.join(packed.select(col("source"), col("bin"), col("n_docs").as("nd"),
        col("sum_subwords").as("ss")), Seq("source", "bin"))
      .filter(col("n_docs") =!= col("nd") || col("sum_subwords") =!= col("ss"))
      .count() == 0)
    // and every doc's start offset is < budget past its bin base
    val off = detail.filter(
      (col("cum") - col("n_tok")) - col("bin") * TrainPrep.bpePackBudget >= TrainPrep.bpePackBudget)
    assert(off.count() == 0, "no doc starts beyond its bin's subword budget")
  }

  test("BPE chunks respect the subword budget up to one straddling word") {
    import graft.text.Bpe
    val m = Bpe.merges(spark)
    val ranks = m.zipWithIndex.toMap
    val maxWordSub = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .collect().map(r => Bpe.encode(r.getString(0), ranks).length).max
    val chunks = TrainPrep.qChunkBpe(spark, sf)
    val over = chunks.filter(col("sum_subwords") > TrainPrep.bpeChunkBudget + (maxWordSub - 1))
    assert(over.count() == 0,
      s"every chunk fits budget+straddle (max word = $maxWordSub subwords)")
    // coverage: per-doc word count re-adds to the doc's word count
    val cover = chunks.groupBy(col("doc_id")).agg(sum(col("n_words")).as("nw"))
      .join(Tables.documents(spark, sf)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n")), Seq("doc_id"))
    assert(cover.filter(col("nw") =!= col("n")).count() == 0)
  }

  test("sharding is a permutation: every doc once, dense positions, exact running totals") {
    val sharded = TrainPrep.qShard(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    // permutation: every doc exactly once
    assert(sharded.count() == nDocs)
    assert(sharded.select(col("doc_id")).distinct().count() == nDocs)
    // positions are dense 1..count(shard)
    val perShard = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"), max(col("pos")).as("hi"),
        count_distinct(col("pos")).as("np"),
        max(col("cum_tokens")).as("cum_hi"), sum(col("n_tok")).as("tok_sum"))
    assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("np") =!= col("n")).count() == 0, "pos must be dense 1..n per shard")
    // running total ends at the shard's token sum
    assert(perShard.filter(col("cum_hi") =!= col("tok_sum")).count() == 0)
    // deterministic and partition-invariant: a re-run over a
    // repartitioned input yields the identical assignment
    val again = TrainPrep.qShard(spark, sf)
    assert(sharded.exceptAll(again).count() == 0 && again.exceptAll(sharded).count() == 0)
    // hash balance: no shard hoards the corpus (loose 3x-mean cap at
    // fixture scale; tightens as n grows)
    val sizes = perShard.select(col("n")).collect().map(_.getLong(0))
    assert(sizes.max <= 3 * (nDocs.toDouble / sizes.length).ceil.toLong,
      s"shard sizes too skewed: ${sizes.mkString(",")}")
  }
}
