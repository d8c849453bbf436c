package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.TextOps
import graft.dedup.Dedup
import graft.vector.VectorOps

class TextDedupVectorSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}
  import spark.implicits._

  test("langGuess: CJK wins, stopword argmax otherwise, und fallback") {
    val got = Seq(
      "the cat and the dog in a house",
      "el perro y la casa de que los",
      "der hund und das haus ist ein",
      "完全是中文文本",
      "zzz qqq xxx")
      .toDF("text").select(TextOps.langGuess(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "zh", "und"))
  }

  test("one-pass LangGuess expression == Column-composed decision on the full corpus") {
    val diff = Tables.documents(spark, sf)
      .select(TextOps.langGuess(col("text")).as("fast"),
        TextOps.langGuessComposed(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "single-pass decision must replay the when-chain exactly")
    // edge rows the corpus may not cover: ties, zh embedded mid-text, empty
    val edge = Seq("", " ", "el der", "la et", "text 中 text", "the la und le")
      .toDF("text")
      .select(TextOps.langGuess(col("text")).as("fast"),
        TextOps.langGuessComposed(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(edge == 0)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("Hello  World", "hello world", " hello world ", "hello worlds")
      .toDF("t").select(TextOps.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(1) == fps(2) && fps(2) != fps(3))
  }

  test("bpeish token count: short words 1, long words ceil(len/6)") {
    val n = Seq("a bb cccccc ddddddd twelveletters")
      .toDF("t").select(TextOps.bpeishTokenCount(col("t"))).head.getLong(0)
    // 1 + 1 + 1 + 2 + ceil(13/6)=3 -> 8
    assert(n == 8)
  }

  test("ngram brute-force twin input is absolutely bounded (constant at every scale)") {
    // The declared cartesian twin must stay O(K²) regardless of corpus
    // size: its input is a hash-rank top-K sample, never a fraction.
    val docs = Tables.documents(spark, sf)
      .orderBy(md5(concat(lit("ngram:"), col("doc_id").cast("string"))), col("doc_id"))
      .limit(Dedup.NgramSampleK)
    assert(docs.count() <= Dedup.NgramSampleK)
    // the pairs query itself runs and respects the bound end-to-end
    val pairs = Dedup.qNgramJaccardPairs(spark, sf, threshold = 0.7)
    assert(pairs.count() >= 1, "sf0.001 hash-rank sample should contain a planted near-dup pair")
  }

  test("substring dedup recovers exactly the planted verbatim spans, no cartesian") {
    val runs = graft.text.SubstringDedup.qSubstringDup(spark, sf)
    val got = runs.select(col("doc_a"), col("doc_b"), col("max_run"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // planted: (src, src+40) with span 22 + src % 12, for src 0..19
    val planted = (0 until 20).map(s => ((s.toLong, (s + 40).toLong), (22 + s % 12).toLong)).toMap
    assert(got.keySet == planted.keySet,
      s"pair set must be exactly the >=MinRun plants; got ${got.keySet}")
    planted.foreach { case (k, span) =>
      assert(got(k) >= span, s"pair $k: max_run ${got(k)} < planted span $span")
    }
    // the 12-token plants (docs 60-69 from 20-29) are below MinRun → invisible
    assert(!got.keySet.exists { case (a, b) => b >= 60 && b < 70 })
    // anchor equi-join only — no all-pairs fallback anywhere in the plan
    val plan = runs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "verbatim-run detection must be an anchor equi-join")
  }

  test("minhash LSH candidates contain every very-high-jaccard pair") {
    // ground truth: brute-force 3-shingle jaccard >= 0.8 over the full corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingles(split(col("text"), " ")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.qMinhashPairs(spark, sf, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "corpus should contain near-dups")
    val missed = truth -- lsh
    assert(missed.isEmpty, s"LSH (b=4,r=4, t≈0.71) missed ${missed.size} of ${truth.size} pairs ≥0.8")
  }

  test("dup clusters: transitive chains collapse to min-id components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("knn clusters: labels are mutual-kNN components, edges symmetric by construction") {
    val labels = graft.vector.VectorOps.qKnnClusters(spark, sf)
      .as[(Long, Long)].collect()
    assert(labels.nonEmpty, "mutual-kNN graph of the corpus must have edges")
    val byId = labels.toMap
    // cluster representative is the component's min member → every
    // cluster_id labels itself, and no label exceeds its member
    labels.foreach { case (vid, cid) =>
      assert(cid <= vid, s"label $cid must be the component min, got member $vid")
      assert(byId(cid) == cid, s"representative $cid must carry its own label")
    }
    // mutual edges only: every labeled vector appears in the kNN list
    // of at least one same-cluster vector (spot-check via group sizes)
    val sizes = labels.groupBy(_._2).map(_._2.length)
    assert(sizes.forall(_ >= 2), "a mutual edge implies components of size >= 2")
  }

  test("jaccard bounds and symmetry") {
    // partial case shares exactly one 3-shingle ("a b c") of 5 distinct
    val df = Seq(("a b c d", "a b c d"), ("a b c", "x y z"), ("a b c d e", "a b c x y"))
      .toDF("x", "y")
      .select(Dedup.jaccard(Dedup.shingles(split(col("x"), " ")),
        Dedup.shingles(split(col("y"), " "))).as("j"))
    val js = df.as[Double].collect()
    assert(js(0) == 1.0 && js(1) == 0.0 && js(2) > 0.0 && js(2) < 1.0)
  }

  test("cosine: self-similarity 1, bounded, topk excludes self") {
    val self = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
    val topk = VectorOps.qSimTopk(spark, sf, nQueries = 3, k = 4).collect()
    assert(topk.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("vec_id")))
    assert(topk.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-12))
    assert(topk.groupBy(_.getAs[Long]("q_id")).values.forall(_.length == 4))
  }

  test("deterministic sample: reproducible, partition-invariant, ~fraction sized") {
    val docs = Tables.documents(spark, sf)
    val s1 = graft.text.TextOps.deterministicSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s2 = graft.text.TextOps.deterministicSample(docs.repartition(7), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must be partitioning-invariant")
    assert(s1.size > 50 && s1.size < 150, s"20% of 500 docs, got ${s1.size}") // binomial bounds
    val s3 = graft.text.TextOps.deterministicSample(docs, col("doc_id"), 0.2, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s3, "different salt must give a different sample")
  }

  test("ShingleJaccard expression matches the interpreted shingle/jaccard form") {
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).limit(80)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val a = docs.select(col("doc_id").as("ia"), col("toks").as("ta"))
    val b = docs.select(col("doc_id").as("ib"), col("toks").as("tb"))
    val diff = a.crossJoin(b).filter(col("ia") < col("ib")).limit(500)
      .select(
        graft.functions.TextHashes.shingleJaccard(col("ta"), col("tb")).as("fast"),
        Dedup.jaccard(Dedup.shingles(col("ta")), Dedup.shingles(col("tb"))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "JVM-loop jaccard must equal the interpreted HOF form")
  }

  test("Simhash16 expression matches the interpreted md5-parity form") {
    val diff = Tables.documents(spark, sf).limit(200)
      .select(
        graft.functions.TextHashes.simhash16(split(col("text"), " ")).as("fast"),
        Dedup.simhash16(split(col("text"), " ")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "JVM-loop simhash must equal the interpreted HOF form")
  }

  test("Simhash64 expression matches the interpreted md5-nibble form") {
    val diff = Tables.documents(spark, sf).limit(200)
      .select(
        graft.functions.TextHashes.simhash64(split(col("text"), " ")).as("fast"),
        Dedup.simhash64(split(col("text"), " ")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "JVM-loop simhash64 must equal the interpreted HOF form")
  }

  test("StopwordHits expression matches the interpreted per-group filter form") {
    val groups = Seq(
      Seq("the", "a", "of", "to", "and", "in", "is"),
      Seq("el", "la", "de", "que", "y", "los"),
      Seq("der", "die", "und", "das", "ist", "ein"),
      Seq("le", "la", "et", "les", "des", "un"))
    val t = split(col("text"), " ")
    val fast = graft.functions.TextHashes.stopwordHits(t, groups)
    val diff = Tables.documents(spark, sf).limit(300)
      .select((0 until 4).map(g =>
        (fast.getItem(g) =!= graft.text.TextOps.stopwordHits(t, groups(g))).as(s"d$g")): _*)
      .filter((0 until 4).map(g => col(s"d$g")).reduce(_ || _)).count()
    assert(diff == 0, "one-pass counts must equal the four filter() walks")
  }

  test("banded simhash pairs match the cross-join exact twin") {
    val s = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextHashes.simhash64(split(col("text"), " ")).as("sh"))
    val a = s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    val got = Dedup.qSimhashPairs(spark, sf).as[(Long, Long, Long)].collect().toSet
    assert(got == truth, "pigeonhole banding must lose no pair within hamming 3")
  }

  test("WordGrams expression matches the interpreted HOF form") {
    val t = split(col("text"), " ")
    val diff = Tables.documents(spark, sf).limit(300)
      .filter(size(t) >= 5)
      .select(graft.functions.TextHashes.wordGrams(t, 5).as("fast"),
        graft.text.TextOps.wordGrams(t, 5).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "one-pass grams must equal array_distinct(transform(...))")
  }

  test("PositionedGramHash60 == 15-hex-char prefix of the md5 string anchors") {
    val t = split(col("text"), " ")
    val rows = Tables.documents(spark, sf).limit(100)
      .select(graft.functions.TextHashes.positionedGramHash60(t, 20).as("h60"),
        transform(graft.functions.TextHashes.positionedGramMd5(t, 20),
          h => conv(substring(h, 1, 15), 16, 10).cast("long")).as("href"))
    assert(rows.filter(col("h60") =!= col("href")).count() == 0,
      "long anchors must be the exact 60-bit md5 prefix the oracle parses")
    assert(rows.filter(size(col("h60")) > 0).count() > 0)
  }

  test("PhraseCounts: token-boundary aligned, overlapping, never mid-token") {
    val phrases = Seq("a b c", "a a")
    val got = Seq(
      "a b c x",        // match at start
      "x a b c",        // match at end
      "xa b c",         // mid-token prefix: NO match
      "a b cx",         // mid-token suffix: NO match
      "a b c a b c",    // two occurrences
      "a a a")          // overlapping token windows of "a a": 2
      .toDF("text")
      .select(graft.functions.TextHashes.phraseCounts(col("text"), phrases).as("c"))
      .collect().map(r => r.getSeq[Long](0).toList).toList
    assert(got == List(List(1L, 0L), List(1L, 0L), List(0L, 0L),
      List(0L, 0L), List(2L, 0L), List(0L, 2L)))
  }

  test("WordGramsAll expression matches the interpreted HOF form, duplicates kept") {
    val t = split(col("text"), " ")
    val hofAll = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
    val rows = Tables.documents(spark, sf).limit(300)
      .filter(size(t) >= 3)
      .select(graft.functions.TextHashes.wordGramsAll(t, 3).as("fast"), hofAll.as("slow"))
    assert(rows.filter(col("fast") =!= col("slow")).count() == 0,
      "one-pass multiset grams must equal transform(sequence(...)) element-for-element")
    // multiset semantics: repeated grams survive (unlike WordGrams)
    assert(rows.filter(size(col("fast")) =!= size(array_distinct(col("fast")))).count() > 0,
      "corpus must exercise the duplicate-gram path this expression exists for")
  }

  test("multi-probe LSH recall dominates single-probe against exact top-k") {
    import graft.vector.VectorOps
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.qSimTopk(spark, sf))
    val single = pairs(VectorOps.qSimTopkLsh(spark, sf))
    val multi = pairs(VectorOps.qSimTopkLshMultiprobe(spark, sf))
    assert((multi intersect exact).size >= (single intersect exact).size,
      s"extra probe must not lose recall: multi=${(multi intersect exact).size} single=${(single intersect exact).size}")
  }

  test("exact text stats: tokens * docs sane on corpus") {
    val st = TextOps.qTextStats(spark, sf).agg(sum("n_docs"), sum("sum_tokens")).head()
    assert(st.getLong(0) == 500)
    assert(st.getLong(1) > 500 * 9) // every doc has >= 10 tokens
  }

  test("snapshot diff reconciles: every doc in exactly one status, counts close") {
    import graft.etl.Snapshot
    val v1 = Tables.documents(spark, sf)
    val v2df = Snapshot.v2(spark, sf)
    val byStatus = Snapshot.diff(v1, v2df)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n1 = v1.count(); val n2 = v2df.count()
    // v1 = removed + changed + unchanged; v2 = added + changed + unchanged
    assert(byStatus("removed") + byStatus("changed") + byStatus("unchanged") == n1)
    assert(byStatus("added") + byStatus("changed") + byStatus("unchanged") == n2)
    // the planted modulos decide each class exactly
    assert(byStatus("removed") == v1.filter(col("doc_id") % 17 === 3).count())
    assert(byStatus("changed") ==
      v1.filter(col("doc_id") % 17 =!= 3 && col("doc_id") % 13 === 1).count())
    assert(byStatus("added") == v1.filter(col("doc_id") % 29 === 0).count())
  }
}
