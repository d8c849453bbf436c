package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Physical-plan audits (the 100 TB contract, SURVEY §2.3 design
  * notes): these assert the *shape* of the plan, not its output —
  * pushdown reaches the parquet scan, small dims broadcast, global
  * top-k never becomes a full sort, aggregates are two-phase.
  * A regression here is a scale bug even when results stay correct. */
class PlanSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("scan+project: ReadSchema prunes to the 3 selected columns") {
    val plan = planOf(Relational.qScanProject(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_linenumber")
      && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"projection not pruned: $readSchema")
  }

  test("hll audit: codegen'd register math, hash aggregates, pruned scans") {
    val plan = planOf(Relational.qHllAudit(spark, sf))
    assert(!plan.contains("lambdafunction"),
      s"register math must stay in codegen'd builtins:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan must prune to key + flag columns: $readSchema")
  }

  test("filter: range + null predicates pushed to the parquet scan") {
    val plan = planOf(Relational.qFilter(spark, sf))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(p_size,10)")
      || pushed.contains("p_size"), s"no pushdown: $pushed")
  }

  test("q1: shipdate filter pushed down; aggregate is two-phase hash") {
    val plan = planOf(Relational.q1Pricing(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
      || plan.contains("LessThanOrEqual(l_shipdate"), "shipdate not pushed to scan")
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
    // partial + final pair
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "expected partial+final agg")
  }

  test("lookup join: dims ride a BroadcastHashJoin, fact side unshuffled") {
    val plan = planOf(Relational.qJoinLookup(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "fact table must not sort-merge against a dim")
  }

  test("global top-10 plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.qSortLimit(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("simhash pairs: banded equi-join, never a cartesian product") {
    val plan = planOf(graft.dedup.Dedup.qSimhashPairs(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"simhash pair generation must be an equi-join:\n$plan")
  }

  test("minhash pipeline: no interpreted-lambda stage anywhere") {
    val (pairs, handles) = graft.dedup.Dedup.minhashPairsPipeline(spark, sf, 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    handles.foreach(_.unpersist(blocking = false))
    assert(!plan.toLowerCase.contains("lambdafunction"),
      s"higher-order functions are interpreted — keep them off the dedup path:\n$plan")
    assert(plan.contains("shingle_jaccard") && plan.contains("minhash_slices"),
      "both custom JVM-loop expressions must carry the hot path")
  }

  test("similarity paths: no interpreted-lambda stage, distances are codegen'd loops") {
    val sims = Map(
      "q_sim_topk" -> graft.vector.VectorOps.qSimTopk(spark, sf),
      "q_sim_lsh" -> graft.vector.VectorOps.qSimTopkLsh(spark, sf),
      "q_sim_lsh_mp" -> graft.vector.VectorOps.qSimTopkLshMultiprobe(spark, sf),
      "q_sim_ivf" -> graft.vector.VectorOps.qSimIvf(spark, sf),
      "q_sim_pq" -> graft.vector.VectorOps.qSimPq(spark, sf),
      "q_knn_join" -> graft.vector.VectorOps.qKnnJoin(spark, sf))
    sims.foreach { case (name, df) =>
      val plan = planOf(df).toLowerCase
      assert(!plan.contains("lambdafunction"),
        s"$name: interpreted HOF on a similarity hot path:\n$plan")
      // q_sim_pq's distance folds live inside the materialized dists
      // checkpoint, so they are absent from the final plan by design
      if (name != "q_sim_pq")
        assert(plan.contains("cosine_sim") || plan.contains("dot_product")
          || plan.contains("l2sq_range"),
          s"$name: expected a codegen'd distance expression in the plan")
    }
  }

  test("bpe/substring paths: custom expressions carry the scan, no interpreted lambdas") {
    val bpe = planOf(graft.text.TrainPrep.qBpeEncode(spark, sf)).toLowerCase
    assert(!bpe.contains("lambdafunction"), s"BPE counting must be one JVM pass:\n$bpe")
    assert(bpe.contains("bpe_token_count"), "codegen'd BPE expression must be in the plan")
    // the anchor pass is materialized (localCheckpoint) inside
    // verbatimRuns, so assert its shape on the pre-checkpoint fragment
    // and the join shape on the full query separately
    val gram = planOf(Tables.documents(spark, sf).select(
      org.apache.spark.sql.functions.posexplode(
        graft.functions.TextHashes.positionedGramHash60(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "), 20)))).toLowerCase
    assert(gram.contains("positioned_gram_hash60"),
      s"codegen'd 60-bit anchor expression must carry the scan:\n$gram")
    assert(!gram.contains("lambdafunction"),
      s"positioned-gram hashing must be one JVM pass:\n$gram")
    val sub = planOf(graft.text.SubstringDedup.qSubstrCorpus(spark, sf)).toLowerCase
    assert(!sub.contains("lambdafunction"))
    assert(!sub.contains("cartesianproduct") && !sub.contains("broadcastnestedloopjoin"),
      "substring candidates must come from the anchor equi-join")
  }

  test("knn join: corpus-wide self-join rides the bucket key, never a cross join") {
    val plan = planOf(graft.vector.VectorOps.qKnnJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"kNN candidates must come from a bucket equi-join:\n$plan")
    // top-k must ride the bounded-heap aggregate (partial buffers truncate
    // to k rows pre-exchange), NOT a window sort over all candidates
    assert(!plan.contains("Window"),
      s"kNN top-k must be the TopKAgg aggregate, not a window sort:\n$plan")
  }

  test("tpch2: factorized min-per-group — broadcasts only, the fact table never sorts") {
    val plan = planOf(graft.ops.Relational.qTpch2(spark, sf))
    assert(!plan.contains("ScalarSubquery"),
      s"per-part min must be an aggregate, not a per-row subquery:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered dim and the min table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact table must never sort (the r8 sf100 spill killer):\n$plan")
  }

  test("tpch4: inverted EXISTS — fact streams through a broadcast, no fact sort") {
    val plan = planOf(graft.ops.Relational.qTpch4(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the quarter's orders must broadcast into the lineitem scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"EXISTS semantics must come from the broadcast join + distinct, not a fact-sorting semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop fallback:\n$plan")
  }

  test("tpch20: IN-subquery chain plans as semi joins, aggregate before the semi") {
    val plan = planOf(graft.ops.Relational.qTpch20(spark, sf))
    assert(plan.contains("LeftSemi"), s"expected left-semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop fallback:\n$plan")
  }

  test("tpch7: 6-table snowflake rides broadcast joins, no nested loop") {
    val plan = planOf(graft.ops.Relational.qTpch7(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the OR nation-pair predicate must not degrade the join:\n$plan")
  }

  test("tpch18: one fact aggregate, hot set joins out, the fact never sorts") {
    val plan = planOf(graft.ops.Relational.qTpch18(spark, sf))
    // the r10 factorized contract: lineitem is scanned EXACTLY ONCE
    // (the old IN-subquery + re-join form scanned and sort-merged it
    // twice — ~60 GB of transient sorted runs at sf100), aggregated
    // with a map-side partial before its only exchange, and the rare
    // hot set joins to orders/customer without any sort-merge pass
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"the fact must be scanned exactly once:\n$plan")
    assert(plan.contains("partial_sum"), s"map-side combine before the shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no fact sort anywhere in the factorized plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("keyless range join: binned equi-join, never a nested loop") {
    val plan = planOf(graft.ops.RangeJoin.qRangeJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band must ride the manufactured bucket key:\n$plan")
  }

  test("curate: dup-loser anti-join broadcasts, never a sort-merge") {
    val plan = planOf(graft.etl.Curate.qCurate(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"the tiny loser set must broadcast into the anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge anywhere in the curation path:\n$plan")
  }

  test("tpch6: all three predicates reach the parquet scan, no join, no shuffle of rows") {
    val plan = planOf(graft.ops.Relational.qTpch6(spark, sf))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount")
      && pushed.contains("l_quantity"), s"range predicates not pushed: $pushed")
    assert(!plan.contains("Join"), s"Q6 is a pure scan+agg:\n$plan")
  }

  test("tpch17: factorized per-part avg — restricted scan, no fact sort") {
    val plan = planOf(graft.ops.Relational.qTpch17(spark, sf))
    assert(!plan.contains("ScalarSubquery"),
      s"per-part avg must be an aggregate, not a per-row subquery:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the brand/size part keys and the avg table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact table must never sort:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested loop:\n$plan")
  }

  test("tpch19: disjunctive brand/size/quantity arms keep ONE equi-join") {
    val plan = planOf(graft.ops.Relational.qTpch19(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"OR-of-ANDs must not degrade to a nested loop:\n$plan")
  }

  test("tpch22: NOT EXISTS with date conjunct plans as an anti join") {
    val plan = planOf(graft.ops.Relational.qTpch22(spark, sf))
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must become an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cooccur: one-pass pair emission — no join at all, single pair aggregate") {
    // r4 rewrite: the TokenPairs expression emits the windowed pair
    // multiset per row, so the positioned token relation (and its
    // (doc_id, pos) equi-join + Exchange) no longer exists. Any join
    // reappearing here is a regression to the shuffle-heavy form.
    val plan = planOf(graft.text.TextOps.qCooccur(spark, sf))
    assert(!plan.contains("Join"), s"co-occurrence must not join anything:\n$plan")
    assert(plan.contains("token_pairs"), s"expected the TokenPairs expression:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$plan")
  }

  test("perplexity: LM lookups are equi-joins; only the vocab scalar nested-loops") {
    val plan = planOf(graft.text.TextOps.qPerplexity(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"LM scoring must never be a cartesian:\n$plan")
    // every LM lookup carries an equi-key ((doc_id,pos) bigram
    // assembly, (w1,w2) pair probe, (w1) head probe) — the ONLY
    // permitted nested-loop is the broadcast of the one-row vocabulary
    // count. Which equi-joins broadcast vs shuffle is size-based and
    // may flip with scale; quadratic shapes cannot.
    val nNlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nNlj <= 1, s"only the vocab scalar may nested-loop ($nNlj):\n$plan")
  }

  test("cms: constant-size sketch broadcasts; probe side never shuffles the stream") {
    val plan = planOf(graft.text.TextOps.qCms(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the d*w sketch table must ride a broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in the sketch probe:\n$plan")
  }

  test("pagerank: contribution rounds are equi-joins on the edge key, no cartesian") {
    val plan = planOf(graft.vector.VectorOps.qPagerank(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PageRank rounds must ride the edge equi-join:\n$plan")
  }

  test("snapshot diff: one equi-join on the key, bodies never shuffle") {
    val plan = planOf(graft.etl.Snapshot.qSnapshotDiff(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"snapshot diff must be an equi-join on doc_id:\n$plan")
    // the join's exchanged columns are (doc_id, source, fp) — the md5
    // projection happens below the Exchange, so `text` never shuffles
    val exch = plan.linesIterator.filter(_.contains("Exchange hashpartitioning(doc_id"))
    assert(exch.nonEmpty, s"expected a doc_id-keyed exchange:\n$plan")
    assert(!exch.exists(_.contains("text#")),
      "document bodies must be fingerprinted below the shuffle")
  }

  test("profile: each per-column aggregate scan prunes to exactly its column") {
    val plan = planOf(graft.ops.Advanced.qProfile(spark, sf))
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.size >= 6, s"expected one pruned scan per profiled column:\n$plan")
    // no scan reads more than one column (struct<...> with a single field)
    schemas.foreach { s =>
      val struct = s.substring(s.indexOf("ReadSchema: "))
      assert(!struct.contains(","), s"profile scan must read a single column: $struct")
    }
  }

  test("sufficient-statistics family: one exchange pair, no join of the fact") {
    // ols / ab_test reduce the fact to group-cardinality sufficient
    // sums in a single two-phase aggregate — any extra exchange or a
    // fact-side join is a scale regression
    Seq(graft.ops.MlStats.qOls(spark, sf),
      graft.ops.MlStats.qAbTest(spark, sf)).foreach { df =>
      val plan = planOf(df)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 2, s"expected agg partials + sort only:\n$plan")
      assert(plan.contains("HashAggregate"))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
    }
  }

  test("zscore: moments broadcast back, the fact never joins by shuffle") {
    val plan = planOf(graft.ops.MlStats.qZscore(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"scaler must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact shuffled for the scaler:\n$plan")
  }

  test("hard negatives / mmr scoring: anchors broadcast, no shuffled cross join") {
    val plan = planOf(graft.vector.VectorOps.qHardNegatives(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"anchor batch must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"shuffled cartesian in mining:\n$plan")
    assert(!plan.contains("lambdafunction"), s"cosine fell out of codegen:\n$plan")
  }

  test("expectations: per-table checks share one scan each, RI is one probe join") {
    val plan = planOf(graft.ops.Contracts.qExpectations(spark, sf))
    // 4 audited tables + the RI pass (lineitem keys + orders keys) = 6
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 6, s"contract checks must share table scans:\n$plan")
    assert(plan.contains("LeftOuter"), s"RI must be one outer probe:\n$plan")
  }

  test("rank-filter family: WindowGroupLimit truncates BEFORE the shuffle") {
    // row_number ≤ k over a corpus-wide window must not shuffle the
    // whole fact into per-group sorts: Spark 4's InferWindowGroupLimit
    // inserts a Partial WindowGroupLimit below the hash exchange (≤ k
    // rows per group per MAP partition cross the wire) and a Final one
    // above it. Pin both modes for every declared rank-filter query —
    // losing the Partial turns q_topk_group into a full-fact shuffle
    // at 100 TB. (q_quality_gate is NOT here by design: its filter is
    // percent_rank ≤ 0.5, a RELATIVE cut that needs the exact group
    // cardinality — no constant-k pre-shuffle truncation exists for
    // it in any engine; its shuffle carries only the slim 3-column
    // projection instead.)
    for ((name, df) <- Seq(
        "q_topk_group" -> Relational.qTopkGroup(spark, sf),
        "q_stratified" -> graft.text.TrainPrep.qStratified(spark, sf))) {
      val plan = planOf(df)
      assert(plan.contains("WindowGroupLimit"), s"$name lost WindowGroupLimit:\n$plan")
      val partialIdx = plan.indexOf("Partial")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
      assert(plan.contains(", Partial") && plan.contains(", Final"),
        s"$name must carry BOTH partial and final group limits:\n$plan")
      // plan strings print top-down: the map-side (pre-exchange)
      // operator appears BELOW the exchange line
      assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
        s"$name partial limit must sit below (before) the hash exchange:\n$plan")
    }
  }

  test("quality gate: relative-rank shuffle carries only the slim projection") {
    val plan = planOf(graft.text.TrainPrep.qQualityGate(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && readSchema.contains("source")
      && readSchema.contains("doc_id") && readSchema.contains("n_chars"),
      s"expected the 4 input columns: $readSchema")
    // the window's input must be the scored 3-column projection, never
    // the raw text: text is consumed by the quality expression below
    // the exchange and must not cross the wire
    val afterExchange = plan.substring(0, math.max(plan.indexOf("Exchange hashpartitioning"), 0))
    assert(!afterExchange.contains("text#"),
      s"document text must not survive past the quality projection:\n$plan")
  }

  test("whole-stage codegen covers the q1 hot path") {
    // AQE prints codegen stages only once the plan is final — execute
    // first; codegen'd operators are marked "*(n)" in the simple string
    val df = Relational.q1Pricing(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"q1 fell out of codegen:\n$plan")
  }
}
