package graft

import graft.queries.RelationalQueries

/** Physical-plan regression net: pins the plan properties the engine is
  * designed around (SCALE.md §6) so they can't silently regress —
  * predicate pushdown to parquet, broadcast star joins, and the bounded
  * exchange count of the two-phase top-k. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): String =
    q(spark, sf).queryExecution.executedPlan.toString

  test("s1: the event_type equality filter is pushed to the parquet scan") {
    val p = planOf(RelationalQueries.s1EventScan)
    assert(p.contains("EqualTo(event_type,purchase)"), p.take(800))
  }

  test("q1: the shipdate bound is pushed to the parquet scan") {
    val p = planOf(RelationalQueries.q1PricingSummary)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p.take(800))
  }

  test("q5: executes as a broadcast star — 5 broadcast joins, fact side never shuffles pre-agg") {
    val p = planOf(RelationalQueries.q5RegionRevenue)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts == 5, s"expected 5 broadcast joins, got $broadcasts")
    assert(!p.contains("SortMergeJoin"), "star join must not sort-merge at this scale")
  }

  test("o2: two-phase top-k keeps exactly its three planned exchanges") {
    val p = planOf(RelationalQueries.o2TopkPerGroup)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length +
      "Exchange rangepartitioning".r.findAllIn(p).length
    assert(exchanges == 3, s"salted window + global window + final sort = 3, got $exchanges\n${p.take(1200)}")
  }

  test("s5: the 5-row seed joins by broadcast, never a shuffle") {
    val p = planOf(RelationalQueries.s5SeedJoin)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("j6: bucketized range join is a single broadcast hash join — no nested loop") {
    val p = planOf(RelationalQueries.j6RangeJoin)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts == 1, s"expected 1 broadcast hash join, got $broadcasts\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must stay an equi-join on the bucketized day key")
  }

  test("t22: the gram-score join runs big-big (no broadcast) with an identical result") {
    // The 100 TB claim on t22 (PipelineQueries.t22BigramScore doc): the
    // bigram count table is corpus-scale, so its lookup join must be
    // shardable as a shuffle join. Pin it: with auto-broadcast disabled
    // the UN-hinted c2 join becomes a shuffle join, the HINTED vocab/total
    // broadcasts stay broadcast (hints ignore the threshold), and the
    // output is row-identical to the default (broadcast-at-this-sf) plan.
    val q = graft.queries.PipelineQueries.t22BigramScore
    val base = q(spark, sf).collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = q(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"c2 gram join must shuffle when broadcast is off\n${p.take(1500)}")
      assert(p.contains("BroadcastHashJoin"),
        s"hinted vocab joins must stay broadcast under threshold=-1\n${p.take(1500)}")
      assert(df.collect().map(_.toSeq).toSeq == base,
        "t22 result changed between broadcast and shuffled gram-join plans")
    } finally spark.conf.set(key, old)
  }

  test("q1_cents: money aggregation stays in the codegen'd long path — no decimal agg buffers") {
    // (q1_pricing_summary itself is pinned to the driver-green decimal
    // formulation; the integer fixed-point plan lives under q1_cents)
    val plan = RelationalQueries.q1Cents(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("decimal(1"),
      s"q1_cents aggregate should carry long cents, not decimal buffers\n${plan.take(1200)}")
  }

  test("a5: exact percentiles run as codegen'd hash aggs + windows — no ObjectHashAggregate") {
    val p = planOf(RelationalQueries.a5Percentiles)
    assert(!p.contains("ObjectHashAggregate"),
      s"percentile must not fall back to the value-map ObjectHashAggregate\n${p.take(1200)}")
    assert(p.contains("Window"), p.take(800))
  }

  test("d2/d4/d5: every near-dup candidate generator stays an equi-join — no nested loop anywhere") {
    import graft.queries.PipelineQueries
    for ((name, q) <- Seq("d2" -> PipelineQueries.d2MinhashLsh,
                          "d4" -> PipelineQueries.d4NgramJaccard,
                          "d5" -> PipelineQueries.d5EmbeddingNeardup,
                          "v3" -> PipelineQueries.v3AnnIvf,
                          "d7" -> PipelineQueries.d7Semdedup,
                          "d8" -> PipelineQueries.d8SubstringDedup,
                          "d11" -> PipelineQueries.d11Containment,
                          "d13" -> PipelineQueries.d13DedupEval,
                          "d14" -> PipelineQueries.d14FuzzyJoin,
                          "d14b" -> PipelineQueries.d14bFuzzyJoinK2,
                          "m5" -> PipelineQueries.m5ImagePhash,
                          "m6" -> PipelineQueries.m6AudioFingerprint,
                          "m7" -> PipelineQueries.m7VideoFingerprint)) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name candidate generation must stay a bucket equi-join\n${p.take(1200)}")
    }
  }

  test("t11: gram counting is explode → partial-agg; only count rows reach the joins") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t11Repetition)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    // both gram families must map-side combine before their shuffle
    assert(p.contains("partial_merge") || p.contains("partial"),
      s"gram counts must partial-aggregate before the exchange\n${p.take(1200)}")
  }

  test("t5/t6/t24: chunk, sample, normalize stay map-only — no exchange before the output sort") {
    import graft.queries.PipelineQueries
    for ((name, q) <- Seq("t5" -> PipelineQueries.t5Chunk,
                          "t6" -> PipelineQueries.t6SampleStratified,
                          "t24" -> PipelineQueries.t24Normalize)) {
      val p = planOf(q)
      // exactly one exchange: the rangepartitioning of the final ORDER BY
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges == 1 && p.contains("rangepartitioning"),
        s"$name must shuffle only for its output ordering\n${p.take(1200)}")
    }
  }

  test("t8: the eval n-gram set broadcasts — the training corpus never shuffles pre-join") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t8Decontaminate)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"contamination join must not shuffle the corpus side\n${p.take(1200)}")
  }

  test("t9: the vocabulary-sized df table broadcasts — term counts never sort-merge") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t9TfidfKeywords)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("t12: rates join back by broadcast — corpus rows never shuffle") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t12MixRebalance)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the mixture keep predicate must stay map-side\n${p.take(1200)}")
  }

  test("t7: block offsets join back by broadcast; the per-doc window stays block-partitioned") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t7PackShards)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("windowspecdefinition(blk"),
      s"per-doc running sum must be partitioned by block\n${p.take(1200)}")
  }

  test("k2: NDVs are two-phase hash aggs — no valueSet buffers, no expand") {
    val p = planOf(RelationalQueries.k2TableStats)
    // (the keyless string-min/max base agg may be a SortAggregate: with no
    // grouping key it sorts nothing — only valueSet/expand would be a cliff)
    assert(!p.contains("valueSet"),
      s"distinct values must never accumulate in per-group buffers\n${p.take(1200)}")
    assert(!p.contains("Expand"), p.take(1200))
    assert("HashAggregate".r.findAllIn(p).length >= 10,
      s"each NDV should be its own partial+final hash agg\n${p.take(1200)}")
  }

  test("k1: distinct agg and sketch aggs stay in separate subtrees — no expand-driven fallback") {
    val p = planOf(RelationalQueries.k1Sketches)
    assert(!p.contains("SortAggregate"),
      s"split aggregations must keep hash-based paths\n${p.take(1200)}")
    assert(!p.contains("Expand"),
      s"single countDistinct needs no expand\n${p.take(1200)}")
  }

  test("v5: centroid update partially aggregates before its exchange; no nested-loop joins") {
    import graft.queries.PipelineQueries
    val p = PipelineQueries.v5Kmeans(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"k-means is aggregation-only — no join may appear\n${p.take(1200)}")
    assert(!p.contains("SortAggregate"), p.take(1200))
  }

  test("t11: both gram families ride ONE fused explode — a second Generate is a regression") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t11Repetition)
    val generates = "Generate explode".r.findAllIn(p).length
    assert(generates == 1,
      s"t11 must explode once, emitting (gram_size, hash) structs for both families; got $generates\n${p.take(1200)}")
  }

  test("v7: probed candidates join by broadcast hash on the cell key — never a shuffle or nested loop") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v7IvfPq)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the cell = probe equi-join must broadcast the 10-row query side\n${p.take(1200)}")
  }

  test("t17: the score-ordered cumsum range-partitions — windows only within partitions") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t17PplBuckets)
    assert(p.contains("rangepartitioning"),
      s"the prefix sum must range-partition on (lm_xent, doc_id)\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"offsets and totals must broadcast back, never shuffle the corpus\n${p.take(1200)}")
  }

  test("t16: the eval-gram membership set broadcasts — the training grams never sort-merge") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t16ContamScore)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the contamination membership join must broadcast the eval side\n${p.take(1200)}")
  }

  test("t14/t18: the global top-K runs as TakeOrderedAndProject heaps, never a one-partition sort") {
    import graft.queries.PipelineQueries
    for ((name, q) <- Seq("t14" -> PipelineQueries.t14Vocab,
                          "t18" -> PipelineQueries.t18BpePairs)) {
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name's top-K must plan per-partition heaps + driver K-merge\n${p.take(1200)}")
    }
  }

  test("d9: Bloom probe in-plan, corpus joins broadcast, one shuffle (the matched-digest distinct)") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.d9IncrementalDedup)
    assert(p.contains("might_contain"),
      s"the Bloom prefilter must run as the codegen'd might_contain expression\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"candidate digests broadcast into the corpus scan — never a sort-merge\n${p.take(1200)}")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"only the matched-digest distinct may shuffle, got $shuffles\n${p.take(1200)}")
  }

  test("t19: the quality model is map-only — no shuffle ahead of the output sort") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t19QualityModel)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 0,
      s"featurize+score must stay in the scan stage, got $shuffles shuffles\n${p.take(1200)}")
  }

  test("v9: query bag broadcasts and the top-k pre-limits before the rank shuffle") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v9MaxsimRerank)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"),
      s"the 3-row query bag must be the broadcast build side\n${p.take(1200)}")
    val limits = "WindowGroupLimit".r.findAllIn(p).length
    assert(limits == 2,
      s"two-phase top-k: partial WindowGroupLimit before the shuffle + final, got $limits\n${p.take(1200)}")
  }

  test("v8: the query-term and df joins broadcast — the posting table never sort-merges") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v8Bm25)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"query-term prune and df lookup must both broadcast\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus-sized posting table must never reach a sort-merge join\n${p.take(1200)}")
    // exactly ONE nested-loop node is by design: the 1-row (N, T) constants
    // broadcast cross join (the watermark-scalar pattern) — anything more
    // means a real join degenerated
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1 && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("pipe2: the composed curation keeps every stage's scale shape — broadcast gates, range-partitioned cumsums, no SMJ") {
    import graft.queries.CorpusPrep
    val p = planOf(CorpusPrep.pipe2Curation)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"pipe2's gate/rescore/pack joins must all stay broadcast\n${p.take(1600)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1600))
    assert(p.contains("rangepartitioning"),
      s"the tercile + packing prefix sums must range-partition, never a global window\n${p.take(1600)}")
  }

  test("v10: one broadcast cross for stage 1; shortlist and queries broadcast-hash into stage 2; both top-ks pre-limit") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v10MatryoshkaRerank)
    // exactly ONE nested-loop node: the stage-1 query-side broadcast cross
    // (v1's pattern). A second would mean the shortlist fetch degenerated.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1 &&
      !p.contains("CartesianProduct"), p.take(1200))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2,
      s"shortlist ids and full query vectors must broadcast into the fetch\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert("WindowGroupLimit".r.findAllIn(p).length == 4,
      s"both rank stages must run the two-phase top-k (partial + final limits)\n${p.take(1200)}")
  }

  test("v11: the label filter pushes to the scan; scoring is a label equi-join — no cross stage") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v11FilteredAnn)
    assert(p.contains("In(label, [3,4,5,6,7])"),
      s"the literal label set must reach the parquet scan as a pushed filter\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pre-filtered search must never cross the corpus with the query side\n${p.take(1200)}")
    assert("WindowGroupLimit".r.findAllIn(p).length == 2,
      s"the rank must pre-limit before its shuffle\n${p.take(1200)}")
  }

  test("k10: the per-source top-(k+1) plans as two-phase WindowGroupLimit — never a full per-source sort") {
    import graft.queries.PipelineQueries
    import org.apache.spark.sql.functions.col
    // pin the RANKED stage itself: k10's serve tail checkpoints it (two
    // consumers), which would hide the window behind a LogicalRDD
    val rows = graft.Sources.testdata(spark, sf)("documents")
      .filter(col("n_chars") >= 1)
      .select(col("source").as("g"), col("doc_id"), col("n_chars").as("wt"))
      .withColumn("h", PipelineQueries.k10Hash)
    val p = PipelineQueries.k10Ranked(rows).queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).length == 2,
      s"k10's rank must pre-limit per partition before the shuffle (partial + final " +
        s"WindowGroupLimit — every task's state k-bounded, the doc-comment's two-phase " +
        s"shape), got:\n${p.take(1200)}")
  }

  test("k12: both sketch ranks (day partials and the rollup merge) plan as " +
      "two-phase WindowGroupLimit") {
    import graft.queries.PipelineQueries
    // pin each stage directly — the gate checkpoints between them, which
    // would hide the windows behind LogicalRDDs (k10's pattern)
    val vals = PipelineQueries.k12DailyValues(
      graft.Sources.testdata(spark, sf)("events"))
    val pd = PipelineQueries.k12DaySketch(vals)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(pd).length == 2,
      s"day-partial rank must pre-limit per partition (k-bounded tasks)\n${pd.take(1200)}")
    val pt = PipelineQueries.k12TotalSketch(
        PipelineQueries.k12DaySketch(vals).localCheckpoint())
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(pt).length == 2,
      s"rollup-merge rank must pre-limit per partition\n${pt.take(1200)}")
  }

  test("t31: the order file's running sum is two-level — the corpus window " +
      "hash-partitions by block, never a single global window") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t31EpochShuffle)
    assert(p.contains("hashpartitioning(blk"),
      s"the in-block running sum must partition on the hash-range block\n${p.take(1400)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the 1024-row block-offset table must broadcast back\n${p.take(1400)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1400))
  }

  test("pipe7: the composed training-order chain keeps its stages' shapes — " +
      "no degenerate join anywhere") {
    import graft.queries.CorpusPrep
    val p = planOf(CorpusPrep.pipe7TrainingOrder)
    assert(p.contains("hashpartitioning(blk"),
      s"the shuffle/pack tail must keep t31's two-level cumsum shape\n${p.take(1400)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no stage of the chain may degenerate to a cross\n${p.take(1400)}")
  }

  test("k11: the per-source min-k sketch plans as two-phase WindowGroupLimit") {
    import graft.queries.PipelineQueries
    // pin the SKETCH stage itself (the gate checkpoints it for the pair
    // algebra, which would hide the window behind a LogicalRDD)
    val p = PipelineQueries
      .k11Sketch(PipelineQueries.k11Values(spark, sf))
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).length == 2,
      s"k11's min-k rank must pre-limit per partition before the shuffle " +
        s"(partial + final WindowGroupLimit — the mergeable-sketch shape k11s " +
        s"stores), got:\n${p.take(1200)}")
  }

  test("v30: trained bounds ride as literals — encode+ADC stay map-only, the " +
      "shortlist pre-limits, no sort-merge join anywhere") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.v30TrainedSq)
    // ONE nested-loop node: the 5-query broadcast cross (v1's pattern)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1 &&
      !p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the rerank fetch must broadcast the 20-row shortlist\n${p.take(1200)}")
    assert("WindowGroupLimit".r.findAllIn(p).length == 4,
      s"ADC shortlist and final rank must both pre-limit (partial + final " +
        s"each)\n${p.take(1200)}")
  }

  test("d10: skew-proof rank — range-partitioned order, (source,pid) window, broadcast caps") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.d10SourceQuota)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the offset/cap joins must never shuffle the corpus side\n${p.take(1200)}")
    // the corpus-sized exchange is the RANGE partitioning of the global
    // preference order — a mega-source spans many ranges; the subsequent
    // window keys on (source, pid), so no single partition ever holds a
    // whole hot domain (the skewed-tier rehearsal shape, SCALE.md §8)
    assert(p.contains("rangepartitioning(source"),
      s"the rank order must range-partition, not hash one partition per source\n${p.take(1200)}")
    assert(p.contains("windowspecdefinition(source") && p.contains("pid"),
      s"the in-range rank must key on (source, pid)\n${p.take(1200)}")
  }

  test("t20: the rule gate is map-only — no shuffle ahead of the output sort") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.t20GopherRules)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 0,
      s"featurize+gate must stay in the scan stage, got $shuffles shuffles\n${p.take(1200)}")
  }

  test("pipe3: the gate stays map-side and the quota caps broadcast — no SMJ, no cross stage") {
    import graft.queries.CorpusPrep
    val p = planOf(CorpusPrep.pipe3GatedQuota)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the survivor join and cap join must both broadcast\n${p.take(1600)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1600))
  }

  test("d12: skew-tolerant shape — map-combined groupBy + join-back, NO window") {
    val p = planOf(graft.queries.PipelineQueries.d12UrlDedup)
    // a window over canonical_url would funnel a hot URL through one task
    // with no AQE escape; the groupBy partial-aggregates and the join can
    // skew-split — pin the shape
    assert(!p.contains("Window"),
      s"cluster stats must not be a window over the url\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the cluster table must broadcast at this tier\n${p.take(1200)}")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"cluster stats must partial-aggregate map-side\n${p.take(1200)}")
  }

  test("d2/d4: the self-join inputs are checkpointed — no explode/window recompute per side") {
    import graft.queries.PipelineQueries
    // A self-join never reuses its own exchange (the two sides canonicalize
    // differently), so the frame feeding both sides must be materialized by
    // a localCheckpoint; if it leaks back in, Generate (explode) and Window
    // nodes reappear in the final plan and the whole signature/prefix
    // lineage runs once per side (~6x the query at the rehearsal tier).
    for ((name, q) <- Seq("d2" -> PipelineQueries.d2MinhashLsh,
                          "d4" -> PipelineQueries.d4NgramJaccard)) {
      val p = planOf(q)
      assert(!p.contains("Generate"),
        s"$name: shingle explode must stay behind the checkpoint\n${p.take(1200)}")
      assert(!p.contains("Window"),
        s"$name: ranking windows must stay behind the checkpoint\n${p.take(1200)}")
    }
    // d14's neighborhood explode feeds both sides of its candidate
    // self-join through the same checkpoint — same leak symptom
    val p14 = planOf(PipelineQueries.d14FuzzyJoin)
    assert(!p14.contains("Generate"),
      s"d14: deletion-neighborhood explode must stay behind the checkpoint\n${p14.take(1200)}")
    val p14b = planOf(PipelineQueries.d14bFuzzyJoinK2)
    assert(!p14b.contains("Generate"),
      s"d14b: the O(L²) 2-deletion explode must stay behind the checkpoint\n${p14b.take(1200)}")
  }

  test("t25: bucket-sized LM tables broadcast, selection is a top-k heap, token explode stays checkpointed") {
    val p = planOf(graft.queries.PipelineQueries.t25DsirResample)
    assert(!p.contains("SortMergeJoin"),
      s"t25: the ${graft.queries.PipelineQueries.DsirBuckets}-row LM joins must broadcast\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"t25: the top-${graft.queries.PipelineQueries.DsirK} must be a heap, not a global sort\n${p.take(1200)}")
    assert(!p.contains("Generate"),
      s"t25: the token explode must stay behind the checkpoint (3 consumers)\n${p.take(1200)}")
  }

  test("v19: Hamming stage crosses only the broadcast 5-query frame; floats fetched by broadcast semi-fetch") {
    val p = planOf(graft.queries.PipelineQueries.v19BinaryAnn)
    // one sanctioned nested loop: the corpus codes × the 5-row query-code
    // frame (2×int words per row — no float array traffic). The shortlist
    // fetch and query-vector joins must be broadcast hash equi-joins, so
    // the full-precision corpus is never shuffled.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj == 1 && !p.contains("CartesianProduct"),
      s"v19: exactly one nested loop (query-code frame), got $bnlj\n${p.take(1200)}")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2 && !p.contains("SortMergeJoin"),
      s"v19: shortlist + query-vector fetches must both broadcast\n${p.take(1200)}")
  }

  test("k7: candidate selection is a top-k heap; the D×W grid probes by broadcast") {
    val p = planOf(graft.queries.PipelineQueries.k7CountMin)
    assert(p.contains("TakeOrderedAndProject"),
      s"k7: the top-${graft.queries.PipelineQueries.CmTopK} must be a heap, not a global sort\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"k7: the ${graft.queries.PipelineQueries.CmDepth}×${graft.queries.PipelineQueries.CmWidth} grid must broadcast to the probe frame\n${p.take(1200)}")
  }

  test("v20/v21: the Lloyd report joins nothing; trained serving crosses only the broadcast query frame") {
    val p20 = planOf(graft.queries.PipelineQueries.v20PqTrain)
    // reassignment runs off the checkpointed a0 against collected-centroid
    // literals: no join anywhere — the only shuffles are the final report agg
    assert(!p20.contains("SortMergeJoin") && !p20.contains("BroadcastNestedLoopJoin") &&
      !p20.contains("CartesianProduct"),
      s"v20: the trained-centroid reassignment must be join-free\n${p20.take(1200)}")
    val p21 = planOf(graft.queries.PipelineQueries.v21TrainedPqServe)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p21).length
    assert(bnlj == 1 && !p21.contains("SortMergeJoin") && !p21.contains("CartesianProduct"),
      s"v21: serving must cross only the 5-row broadcast ADC frame, got $bnlj nested loops\n${p21.take(1200)}")
  }

  test("v22: fully-trained IVF-PQ serves by broadcast cell EQUI-join — the corpus is never crossed or shuffled") {
    val p = planOf(graft.queries.PipelineQueries.v22TrainedIvfServe)
    // the IVF win over v21: candidates come from an equi-join on the cell
    // key against the broadcast (queries × IvfProbe) frame — if this ever
    // degrades to a nested loop/cross, serving is back to scanning every
    // code for every query; if it sort-merges, the corpus index shuffles
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"v22: cell-probe must be a broadcast hash equi-join\n${p.take(1200)}")
    // corpus + query sides both read the one checkpointed encode pass —
    // without it the self-join re-runs the double-training scan twice
    assert(p.contains("Scan ExistingRDD"),
      s"v22: serving must read the checkpointed encode frame\n${p.take(1200)}")
    // v26 shares the serve tail (ivfServeFrom) — same plan contract on
    // the CONVERGED quantizer: broadcast equi-join, checkpointed encode
    val p26 = planOf(graft.queries.PipelineQueries.v26ConvergedIvfServe)
    assert(p26.contains("BroadcastHashJoin") && !p26.contains("SortMergeJoin") &&
      !p26.contains("BroadcastNestedLoopJoin") && !p26.contains("CartesianProduct") &&
      p26.contains("Scan ExistingRDD"),
      s"v26: converged serving must keep v22's broadcast equi-join shape\n${p26.take(1200)}")
    // v27's residual serve keeps the same contract — the per-probed-cell
    // ADC tables ride the (queries × probe) BROADCAST side, never the
    // corpus side, so residual encoding costs no extra corpus pass
    val p27 = planOf(graft.queries.PipelineQueries.v27ResidualPq)
    assert(p27.contains("BroadcastHashJoin") && !p27.contains("SortMergeJoin") &&
      !p27.contains("BroadcastNestedLoopJoin") && !p27.contains("CartesianProduct") &&
      p27.contains("Scan ExistingRDD"),
      s"v27: residual serving must keep v22's broadcast equi-join shape\n${p27.take(1200)}")
  }

  test("k6: one planned nested-loop (the |sources|² pair frame); intersection stays an equi-join") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.k6CorpusOverlap)
    // the ONLY nested loop allowed is the tiny size-frame cross (|sources|²
    // rows); the digest intersection self-join and the signature stitches
    // must never degrade to it — that is the term that grows with corpus size
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj == 1 && !p.contains("CartesianProduct"),
      s"k6: expected exactly the pair-frame nested loop, got $bnlj\n${p.take(1200)}")
    // per-corpus signatures are |sources|-sized — they must broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"k6: signature joins must broadcast\n${p.take(1200)}")
    // the shingle explode feeds four consumers behind one checkpoint
    assert(!p.contains("Generate"),
      s"k6: shingling must stay behind the checkpoint\n${p.take(1200)}")
  }

  test("g1: iteration lineage is checkpoint-truncated; the final stitch is an equi-join") {
    import graft.queries.PipelineQueries
    val p = planOf(PipelineQueries.g1PageRank)
    // every iteration localCheckpoints: the final plan must read the last
    // rank frame as a materialized RDD, not re-derive 5 iterations of
    // joins (which would re-execute ~2^5 lineage paths per consumer)
    assert(p.contains("Scan ExistingRDD"),
      s"g1: final rank frame must be a checkpointed scan\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"g1: the in-degree stitch must stay an equi-join\n${p.take(1200)}")
  }

  test("g1b: the planted graph is a genuine multigraph at the fixture tier " +
      "(the (src, k) store key is load-bearing)") {
    import graft.queries.PipelineQueries
    import org.apache.spark.sql.functions.{col, count, lit}
    // two affine maps collide for some src at n=500 (s ≡ 71 mod 250), so
    // duplicate (src, dst) rows EXIST — a (src, dst)-keyed merge would
    // silently dedup them and shift both rank mass and in-degree. If a
    // data drop ever removes every collision, g1b's multiplicity claim
    // goes vacuous; fail here so the key discipline stays tested.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val dups = PipelineQueries.g1EdgesForSpec(docs, n)
      .groupBy(col("src"), col("dst")).count()
      .filter(col("count") >= 2).count()
    assert(dups > 0, "planted graph has no multi-edge — (src, k) key untested")
  }
}
