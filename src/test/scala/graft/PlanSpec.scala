package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the scale properties (pushdown, pruning,
  * broadcast) must be visible in the physical plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q3 broadcasts the customer dimension") {
    assert(plan("q3_shipping_priority").contains("BroadcastHashJoin"))
  }

  test("q6 prunes lineitem to the four needed columns") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("l_shipdate") && p.contains("l_discount") &&
      p.contains("l_quantity") && p.contains("l_extendedprice"))
    assert(!p.contains("l_orderkey"), "q6 scan should not read l_orderkey")
  }

  test("text_tokens scans only doc_id and text") {
    val p = plan("text_tokens")
    assert(p.contains("ReadSchema") && !p.contains("n_chars"),
      "text_tokens should prune documents to doc_id,text")
  }

  test("ann_bruteforce broadcasts the query side") {
    assert(plan("ann_bruteforce").contains("Broadcast"))
  }

  test("q_decile never funnels the orders scan through one partition") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val plan = SparkEntry.queries("q_decile")(spark, d)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.sparkPlan
    // single-partition funnels are only legal over the tiny per-
    // partition-count aggregate (P rows), never over the raw scan
    val narrowFunnels = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(narrowFunnels.nonEmpty, "expected the P-row offsets funnel to exist")
    narrowFunnels.foreach { n =>
      assert(n.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"single-partition node sits directly on unaggregated data:\n$n")
    }
    assert(!plan.toString.contains("ntile"),
      "q_decile must not use the single-partition NTILE window")
  }

  test("text_ppl_bucket never sorts a whole language in one partition") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning, SinglePartition}
    val plan = SparkEntry.queries("text_ppl_bucket")(spark, d)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.sparkPlan
    // every window must sit on the P·|lang|-row offsets aggregate,
    // never on the raw scored-document rows (the r4 shape was a
    // row_number window partitioned by lang over every document)
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the offsets windows to exist")
    windows.foreach { w =>
      assert(w.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"window sits directly on unaggregated document rows:\n$w")
    }
    plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }.foreach { e =>
      assert(e.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"single-partition exchange over unaggregated data:\n$e")
    }
    // the rank must ride a range exchange on (lang, avg_logp, doc_id).
    // Since r13 the ranked layout is persisted (the materialize-once
    // invariant — see the cache-fed test below), so the exchange lives
    // inside the cached plan, not the outer tree.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val cachedPlans = plan.collect {
      case s: InMemoryTableScanExec => s.relation.cachedPlan
    }
    assert(cachedPlans.nonEmpty, "expected the persisted ranked layout")
    // the cached root may be AQE-wrapped (a leaf to collect) — match
    // the plan text, which prints through the wrapper
    assert(cachedPlans.exists(_.toString.contains("rangepartitioning")),
      s"expected the repartitionByRange exchange inside the cached " +
        s"layout:\n${cachedPlans.map(_.toString).mkString("\n---\n")}")
  }

  test("token-budget/pack cumsums never run over a whole source or language") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // source/lang cardinality is a handful: a window partitioned by
    // that key alone is one task per key at any corpus size. The
    // two-phase shape requires every document-row window to carry the
    // hash shard in its partition spec; the key-only prefix window may
    // exist but only over the keys×256 offsets AGGREGATE.
    for (q <- Seq("sample_token_budget", "pack_sequences")) {
      val plan = SparkEntry.queries(q)(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.sparkPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$q: expected the cumsum windows to exist")
      windows.foreach { w =>
        val overAgg = w.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
        val sharded = w.partitionSpec.size >= 2
        assert(sharded || overAgg,
          s"$q: whole-key window over unaggregated document rows:\n$w")
      }
    }
  }

  test("two-phase ranking materializes its ranked layout ONCE (cache-fed, never recomputed)") {
    // q_decile, text_ppl_bucket and classify_calibration reference the
    // nondeterministic repartitionByRange + monotonically_increasing_id
    // subtree from TWO plan branches (the offsets aggregate and the
    // final join). The branches only see identical partition
    // assignments if that layout is materialized exactly once —
    // RangePartitioner samples its bounds over arrival order, so two
    // independent executions can draw different boundaries and
    // silently mis-rank. Exchange REUSE (this test's pre-r13
    // invariant) turned out to be best-effort: classify_calibration's
    // shuffle-fed ranking lost it under AQE at the 100x tier and
    // emitted an eleventh decile. The invariant is now a persist of
    // the ranked layout (GraftOps.ntileByRange and text_ppl_bucket's
    // grouped variant): BOTH branches must read one shared
    // InMemoryRelation, and no range exchange may survive outside it.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    // AdaptiveSparkPlanExec and QueryStageExec are leaf nodes — a bare
    // collect stops at them; recurse through their inner plans
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val here = p.collect { case x => x }
      here ++ here.flatMap {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case s: QueryStageExec => allNodes(s.plan)
        case r: ReusedExchangeExec => allNodes(r.child)
        case _ => Nil
      }
    }
    for (q <- Seq("q_decile", "text_ppl_bucket", "classify_calibration")) {
      val df = SparkEntry.queries(q)(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      val cacheScans = nodes.collect { case s: InMemoryTableScanExec => s }
      assert(cacheScans.size >= 2,
        s"$q: expected both ranking branches to read the cached layout, " +
          s"found ${cacheScans.size} InMemoryTableScan(s):\n" +
          df.queryExecution.executedPlan)
      assert(cacheScans.map(s => System.identityHashCode(s.relation.cacheBuilder))
        .distinct.size == 1,
        s"$q: the ranking branches read DIFFERENT cached relations — " +
          s"partition assignments can diverge:\n${df.queryExecution.executedPlan}")
      val uncachedRange = nodes.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      assert(uncachedRange.isEmpty,
        s"$q: a range exchange survives OUTSIDE the cached layout — that " +
          s"branch recomputes with fresh bounds:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("sample_stratified plans via TopKPerKey with a single exchange") {
    // executedPlan (post-EnsureRequirements): sparkPlan has no
    // exchanges yet, so the count would be vacuous there
    val df = SparkEntry.queries("sample_stratified")(spark, d)
    df.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // count only the finalized section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerKey"),
      s"InferTopKPerKey rewrite no longer fires on sample_stratified:\n$p")
    // partial TopK shrinks the map side; final TopK's partitioning is
    // reused by the rank window — one exchange total, on the stratum
    val exchanges = "(?m)^\\s*(?:[+:]-\\s*)?Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one exchange:\n$p")
  }

  test("argmin/argmax folds plan as bounded heaps, never SortAggregate (r12)") {
    // Min/Max over a struct is not HashAggregate-able, so a
    // min(struct(dist, cell))-style fold plans as SortAggregate — a
    // full sort of the scored stream that HierTierProbe measured
    // fatal at the paying tier (300 GB of sort spill when the struct
    // carried the vector payload). The r12 sweep moved every such
    // fold to TopKPerKey; this guard keeps them there. ann_ivf and
    // emb_kmeans have the n·K argmin IN their final plan (no
    // checkpoint hides it), so the plan text is the evidence.
    // The negative is scoped to the REGRESSION SHAPE — a SortAggregate
    // whose functions fold min/max over a struct — rather than banning
    // SortAggregate anywhere in the plan (r12 advisor: an unrelated
    // aggregate that a future Spark version legitimately plans as
    // SortAggregate, e.g. an ObjectHashAggregate fallback for
    // collect_list, must not fail the guard while the argmin fold is
    // still on TopKPerKey).
    val structFold = "(?s)SortAggregate[^\\n]*(?:min|max)\\(struct".r
    for (q <- Seq("ann_ivf", "emb_kmeans", "decontaminate_embedding")) {
      val p = plan(q)
      assert(p.contains("TopKPerKey"),
        s"$q no longer folds its argmin/argmax through TopKPerKey:\n$p")
      assert(structFold.findFirstIn(p).isEmpty,
        s"$q reintroduced a min/max-over-struct SortAggregate fold:\n$p")
    }
  }

  test("CC edge union reuses the jaccard subtree's exchanges (computed once)") {
    // clusterKeepFrom materializes edges = pairs ∪ swap(pairs); the
    // whole keep family's cost story assumes the expensive jaccard
    // subtree executes ONCE inside that union, which holds only while
    // Spark's ReuseExchange can sameResult-match the two branches. A
    // nondeterministic expression slipping into the pair pipeline
    // would break the match and silently double the pair-graph cost
    // of every keep-family query — pin the reuse.
    import org.apache.spark.sql.functions.col
    val pairs = operators.Dedup.ngramJaccard.fn(spark, d).select("i", "j")
    val edges = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j")))
    edges.collect()
    val p = edges.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val reused = "ReusedExchange".r.findAllIn(p).size
    assert(reused >= 1,
      s"the swapped union branch no longer reuses the jaccard exchanges:\n$p")
  }

  test("emb_centroid broadcasts the centroids and never plans a nested-loop join") {
    val p = plan("emb_centroid")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"emb_centroid must stay all-pairs-free:\n$p")
  }

  test("vocab_oov broadcasts the vocabulary into the token stream") {
    val p = plan("vocab_oov")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrdered"),
      s"vocab top-K should plan as TakeOrdered per-partition heaps:\n$p")
  }

  test("dedup_segments joins on the segment key, never all-pairs") {
    val p = plan("dedup_segments")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"dedup_segments must candidate-generate by equi-join:\n$p")
  }

  test("q_pivot plans Spark's two-phase pivot with no value-discovery job") {
    val df = SparkEntry.queries("q_pivot")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // native pivot = pre-aggregate on (key, pivot column) + pivotfirst
    // on the key: two exchanges, both fed by partial aggregates (the
    // CASE-based one-exchange variant is demonstrated by A7). What
    // must NOT appear is a third job collecting distinct pivot values.
    val exchanges = "(?m)^\\s*(?:[+:]-\\s*)?Exchange ".r.findAllIn(p).size
    assert(exchanges == 2, s"expected the two pivot exchanges:\n$p")
    assert(p.contains("partial_pivotfirst"), s"pivot agg should be partial+final:\n$p")
  }

  test("q_window_funcs serves all five window functions from one exchange+sort") {
    val df = SparkEntry.queries("q_window_funcs")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "(?m)^\\s*(?:[+:]-\\s*)?Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one exchange in q_window_funcs:\n$p")
    val sorts = "(?m)^\\s*(?:[+:]-\\s*)?Sort ".r.findAllIn(p).size
    assert(sorts <= 1, s"expected at most one sort in q_window_funcs:\n$p")
  }

  test("q_range_join plans as bin-explode + aggregate, no join operator at all") {
    val p = plan("q_range_join")
    assert(!p.contains("Join"),
      s"the binned rewrite must not plan any join (range or otherwise):\n$p")
    assert(p.contains("Generate explode"), s"expected the bin explode:\n$p")
  }

  test("q_funnel joins every stage on the key, never all-pairs") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct"),
      s"stage joins must stay equi-joins (the only cross join is the 1x1 count stitch):\n$p")
  }

  test("q_bloom_prune probes the bloom filter below the semi-join exchange") {
    val df = SparkEntry.queries("q_bloom_prune")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"expected the bloom probe in the plan:\n$p")
    // the probe must sit in the fact table's scan-side filter, i.e.
    // BEFORE any exchange — find the Filter containing might_contain
    // and check no Exchange appears beneath it
    val sparkPlan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.sparkPlan
    val probeFilters = sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(probeFilters.nonEmpty, s"no Filter carries the bloom probe:\n$sparkPlan")
    probeFilters.foreach { f =>
      val hasExchangeBelow = f.child.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.nonEmpty
      assert(!hasExchangeBelow,
        s"bloom probe sits above an exchange — it no longer prunes the shuffle:\n$f")
    }
  }

  test("text_chunk scans only doc_id and text") {
    val p = plan("text_chunk")
    assert(p.contains("ReadSchema") && !p.contains("n_chars") && !p.contains("lang"),
      s"text_chunk should prune documents to doc_id,text:\n$p")
  }

  test("q_agg_pushdown serves count/min/max from parquet footer stats") {
    val p = plan("q_agg_pushdown")
    assert(p.contains("PushedAggregation: [COUNT(*)")
      || p.contains("PushedAggregation: [MIN("),
      s"expected the aggregate pushed into the parquet scan:\n$p")
  }

  test("q1 aggregates inside whole-stage codegen") {
    // AQE finalizes codegen at execution: run the query, then read the
    // final adaptive plan.
    val df = SparkEntry.queries("q1_pricing_summary")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"expected WholeStageCodegen stages in q1:\n$p")
  }

  test("q19's disjunctive predicate keeps the hash equi-join") {
    // Catalyst must extract the common l_partkey = p_partkey key from
    // under the OR; a NestedLoop here would be the 100-TB disaster
    val p = plan("q19_disjunctive")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q19 must stay a hash join:\n$p")
  }

  test("q21's EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS should plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_incremental is band equi-joins only, never all-pairs") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup must stay on band-key equi-joins:\n$p")
  }

  test("q_overlap_sketch's k-minima run through the bounded-heap operator") {
    val p = plan("q_overlap_sketch")
    assert(p.contains("TopKPerKey"),
      s"KMV minima must use the partial+final TopKPerKey operator:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_lm_score joins on bigram keys, never all-pairs") {
    val p = plan("text_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LM scoring must stay on (w1,w2) equi-joins:\n$p")
  }

  test("classify_nb scores through token equi-joins; BNLs carry only scalar aggregates") {
    val df = SparkEntry.queries("classify_nb")(spark, d)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), s"classify_nb planned a cartesian:\n$p")
    // the only nested loops are the broadcast single-row class-total
    // and prior frames — every build side must be an aggregate
    df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.foreach { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        case _ => j.left
      }
      assert(build.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, s"BNL build side must be a one-row aggregate:\n$j")
    }
  }

  test("sample_dsir draws via TakeOrdered heaps, not a global sort") {
    val p = plan("sample_dsir")
    assert(p.contains("TakeOrderedAndProject"),
      s"the Gumbel top-k must plan as per-partition heaps:\n$p")
    assert(!p.contains("CartesianProduct"), s"sample_dsir planned a cartesian:\n$p")
  }

  test("dedup_semantic_prune stays on label equi-joins with broadcast centroids") {
    val p = plan("dedup_semantic_prune")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the cluster-blocked pair sweep must be a label equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 10-row centroid frame should broadcast:\n$p")
  }

  test("dedup_embedding_blocked: broadcast centroid join, banded equi-joins, O(1) plan text") {
    // The registered query eagerly checkpoints the assignment frame
    // (r17), which truncates the visible plan at the checkpoint — so
    // the ASSIGNMENT-stage state-placement assertions run on the
    // un-checkpointed assignment seam (the same discipline
    // HierDedupSpec uses for the two-level twin via hierAssignFrom).
    def assignPlan(sf: String): String =
      operators.Similarity.blockedAssign(spark, sf,
        operators.Similarity.augmentedHi(spark, sf))
        .queryExecution.executedPlan.toString
    val a = assignPlan(d)
    // stage-1 seam: the k-row centroid frame joins BROADCAST (never
    // shuffles the corpus on cell)
    assert(a.contains("BroadcastHashJoin"),
      s"the centroid frame must broadcast:\n$a")
    // cell assignment rides the reference-object expressions — no
    // k-scaled literal may reach the plan text (the r10 fix)
    assert(a.contains("graft_idx_lookup") && a.contains("graft_pq_codes"),
      s"cell assignment must go through the reference-object expressions:\n$a")
    // the plan text is large in ABSOLUTE terms (the constant NJit x Dim
    // jitter literals replicate with every reuse of the augmented
    // subplan) but must be CORPUS-INDEPENDENT: k = ceil(2n/cap) is 10x
    // bigger at sf0.01 than at d (= sf0.001), so a leaked per-cell
    // literal (the pre-r10 typedlit) would show as ~10x growth here
    val a2 = assignPlan("/root/testdata/sf0.01")
    assert(math.abs(a.length - a2.length) < a.length / 5,
      s"plan text scales with the corpus (${a.length} B at $d vs " +
        s"${a2.length} B at sf0.01) — a per-cell literal leaked in")
    // the REGISTERED query's visible (post-checkpoint) plan holds the
    // pair-generating stages: every join must stay an equi-join on
    // (cell, band) keys — the O(n) candidate-work guarantee
    val p = plan("dedup_embedding_blocked")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked dedup must never plan an all-pairs join:\n$p")
  }

  test("dedup_winnow blocks on fingerprint keys, never all-pairs") {
    val p = plan("dedup_winnow")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the winnowed pair join must block on fp:\n$p")
  }

  test("q22's scalar threshold broadcasts a one-row build side") {
    // the only nested-loop allowed is the broadcast of the 1-row
    // (sum_pos, n_pos) aggregate — assert its build side aggregates
    val df = SparkEntry.queries("q22_idle_customers")(spark, d)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val bnl = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    // without this the foreach below is vacuous: a regression to
    // CartesianProduct (zero BNL nodes) would pass silently
    assert(bnl.nonEmpty, s"q22's scalar threshold should plan as a BNL join:\n" +
      df.queryExecution.sparkPlan.toString)
    assert(!df.queryExecution.sparkPlan.toString.contains("CartesianProduct"))
    bnl.foreach { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        case _ => j.left
      }
      assert(build.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, s"BNL build side must be the one-row aggregate:\n$j")
    }
  }

  test("q4's EXISTS decorrelates to a semi join with the lag as residual") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"q4 should plan a left-semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q4's residual date lag must ride the equi-join, not a loop join:\n$p")
  }

  test("q10/q18 broadcast dimensions and take top-k via ordered limit") {
    for (q <- Seq("q10_returned_items", "q18_large_orders")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast customer:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"$q's LIMIT must plan as per-partition heaps, not a global sort:\n$p")
    }
  }

  test("q15 broadcasts the one-row max revenue; q17's part filter prunes below both aggregates") {
    val p15 = plan("q15_top_supplier")
    assert(p15.contains("BroadcastNestedLoopJoin") || p15.contains("BroadcastHashJoin"),
      s"q15's scalar max must broadcast:\n$p15")
    assert(!p15.contains("CartesianProduct"), p15)
    val p17 = plan("q17_small_qty_revenue")
    // the brand filter must reach the part scan (pushed), so the fact
    // join and BOTH aggregates only ever see the brand's lines
    assert(p17.contains("p_brand"), s"q17 should push the brand filter to the part scan:\n$p17")
    assert(p17.contains("BroadcastHashJoin"), s"q17 joins the part filter by broadcast:\n$p17")
  }

  test("checkpointed two-phase layouts read the materialized RDD, not a re-planned exchange") {
    // q_skyline and dedup_substring guard the same layout-consistency
    // hazard as the ranking queries (see the cache-fed test) with an
    // EAGER localCheckpoint(true): by plan time the range layout has
    // already run once, so the final plan must consume it as an
    // ExistingRDD scan and carry NO live range exchange — a re-planned
    // exchange would re-sample bounds and desynchronize the branches.
    // the AQE wrapper is a leaf to collect — match the plan TEXT
    // (the finalized section only; AQE's toString repeats the tree
    // under "== Initial Plan ==")
    for (q <- Seq("q_skyline", "dedup_substring")) {
      val text = SparkEntry.queries(q)(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(text.contains("Scan ExistingRDD") || text.contains("Scan[obj"),
        s"$q: expected the checkpointed layout as an RDD scan " +
          s"(`Scan ExistingRDD`/`Scan[obj`):\n$text")
      assert(!text.contains("rangepartitioning"),
        s"$q: a live range exchange bypasses the checkpointed layout:\n$text")
    }
  }

  test("q_profile's remaining SortAggregates are ungrouped — the plan sorts nothing") {
    // r13 (found by PlanBudgetSpec's net): the string min/max buffers
    // demote their aggregate to SortAggregate, which is free ONLY
    // while that aggregate stays ungrouped (no grouping keys -> no
    // required child ordering). Fused with the multi-distinct expand
    // it was grouped, and sorted the 7x-expanded stream post-shuffle
    // (measured 2.26 -> 0.90 s at sf0.1 after the split). Pin the
    // split: min/max may sort-aggregate, but no Sort node — and no
    // SortAggregate with grouping keys — may appear anywhere.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    // AQE off so executedPlan is the prepared tree (Sorts inserted by
    // EnsureRequirements, not hidden inside AdaptiveSparkPlanExec) —
    // the PlanBudget.measure convention.
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val p = SparkEntry.queries("q_profile")(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      val sorts = p.collect { case s: SortExec => s }
      assert(sorts.isEmpty, s"q_profile must not sort anything:\n$p")
      val grouped = p.collect {
        case a: SortAggregateExec if a.groupingExpressions.nonEmpty => a
      }
      assert(grouped.isEmpty,
        s"q_profile's sort-aggregates must stay ungrouped (sort-free):\n$p")
    }
  }
}
