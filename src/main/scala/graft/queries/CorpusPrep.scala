package graft.queries

import graft.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** END-TO-END corpus preparation: the individual operators composed the
  * way a training-data pipeline actually runs them, as one oracle-gated
  * query (`pipe_corpus_prep`):
  *
  *   1. near-dup DEDUP — drop every document that is not its cluster's
  *      canonical ([[PipelineQueries.d6DedupClusters]]);
  *   2. DECONTAMINATE — drop training documents sharing an
  *      8-gram with the held-out eval slice ([[PipelineQueries.decontGrams]]);
  *   3. QUALITY-FILTER — keep quality ≥ [[QualityMin]] (t1's blend);
  *   4. stratified SAMPLE — t6's deterministic per-language keep predicate;
  *   5. MIX — t12's source-mixture rebalancing over the surviving corpus
  *      (its budget and keep rates are computed from the survivors' token
  *      totals, and its stage-salted hash is independent of stage 4's, so
  *      both stages' rates stay honest under composition);
  *   6. CHUNK — t5's 64-token/48-stride windows over the survivors;
  *   7. PACK — t7's two-level distributed prefix sum assigns each chunk a
  *      token-budget shard id, in (doc_id, chunk_idx) order.
  *
  * Every stage reuses the exact arithmetic its standalone operator proved
  * against DuckDB, so the composition hash-matches a single chained-CTE
  * oracle end to end. Scale properties are inherited: the only quadratic
  * candidate work is inside the LSH-bucketed dedup, the eval grams
  * broadcast, the quality/sample stages are map-only, the mixture stage's
  * global state is a source-count-sized totals table broadcast back, and
  * the pack prefix sum never serializes the corpus through one task.
  */
object CorpusPrep {
  import PipelineQueries._

  type Q = (SparkSession, String) => DataFrame

  /** Minimum t1-blend quality score a document must reach, in exact ppm
    * (300000 = 0.3 — keeps ~half of the fixture corpus, non-degenerate at
    * every driver scale). Integer so the gate predicate lives in t1's
    * exact fixed-point domain. */
  val QualityMinPpm = 300000L

  private def inListSql(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ",", ")")

  val pipeCorpusPrep: Q = (spark, dir) => {
    val docs = Sources.testdata(spark, dir)("documents")

    // 1. docs that lost their cluster election (canonical survives)
    val nonCanonical = d6Labels(spark, dir)
      .filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
    // 2. training docs sharing any 8-gram with the eval slice
    val evalGrams = decontGrams(docs.filter(pmod(col("doc_id"), lit(DecontMod)) === 0), "eval_id")
    val contaminated =
      decontGrams(docs.filter(pmod(col("doc_id"), lit(DecontMod)) =!= 0), "train_id")
        .join(broadcast(evalGrams), "g")
        .select(col("train_id").as("doc_id")).distinct()

    // 3.–4. quality blend (t1, exact integer ppm — the same fixed-point
    // value t1 projects, so the gate inherits its engine-portability) +
    // deterministic stratified sample (t6)
    val rate = SampleRatePermille.foldLeft(lit(SampleRateDefault)) {
      case (e, (l, r)) => when(col("lang") === l, lit(r)).otherwise(e)
    }
    val survivors = docs
      .filter(pmod(col("doc_id"), lit(DecontMod)) =!= 0) // eval slice is not training data
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("lw", split(lower(col("text")), " "))
      .withColumn("nt", size(col("lw")).cast(LongType))
      .withColumn("n_stop",
        expr(s"size(filter(lw, x -> x in ${inListSql(StopEn)}))").cast(LongType))
      .withColumn("quality_ppm",
        expr("(least(100L, nt) * nt + 100L * n_stop) * 5000 div nt"))
      .filter(col("quality_ppm") >= QualityMinPpm)
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(doc_id as string)),1,15),16,10) as bigint)"))
      .withColumn("keep_rate", rate)
      .filter(pmod(col("h"), lit(1000)) < col("keep_rate"))
      .select(col("doc_id"), col("text"), col("source"),
        ceil(col("n_chars") / 4.0).cast(LongType).as("est_tokens"))

    // 5. rebalance the survivor corpus to the target source mixture (t12
    // arithmetic over the SURVIVORS' totals — you rebalance what you are
    // about to train on, not the raw corpus)
    val mixShare = MixSharePermille.foldLeft(lit(MixShareDefault)) {
      case (e, (s, r)) => when(col("source") === s, lit(r)).otherwise(e)
    }
    val bySrc = survivors.groupBy(col("source")).agg(sum(col("est_tokens")).as("src_tokens"))
      .withColumn("share_pm", mixShare)
    val budget = bySrc.agg(min(expr("src_tokens * 1000 div share_pm")).as("budget"))
    val rates = bySrc.crossJoin(broadcast(budget))
      .withColumn("keep_pm", least(lit(1000L), expr("budget * share_pm div src_tokens")))
      .select(col("source"), col("keep_pm"))
    val mixed = survivors.join(broadcast(rates), "source")
      .filter(pmod(expr(
        "cast(conv(substring(md5(concat('mix:', cast(doc_id as string))),1,15),16,10) as bigint)"),
        lit(1000)) < col("keep_pm"))
      .select(col("doc_id"), col("text"))

    // 6. chunk the survivors (t5 arithmetic, original-case text)
    val chunks = mixed
      .withColumn("w", split(col("text"), " "))
      .withColumn("n", size(col("w")))
      .withColumn("n_chunks",
        when(col("n") <= ChunkSize, lit(1))
          .otherwise(expr(s"(n - $ChunkSize + $ChunkStride - 1) div $ChunkStride + 1"))
          .cast(IntegerType))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(ChunkSize), col("n") - col("chunk_idx") * ChunkStride).as("chunk_tokens"),
        md5(array_join(slice(col("w"), col("chunk_idx") * ChunkStride + 1, lit(ChunkSize)), " "))
          .as("chunk_md5"))

    // 7. pack chunks into token-budget shards (t7's two-level prefix sum,
    // ordered by (doc_id, chunk_idx) so a document's chunks stay adjacent)
    distributedCumsum(chunks, "chunk_tokens", Seq(col("doc_id"), col("chunk_idx")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("chunk_md5"),
        expr(s"(cum_tokens - chunk_tokens) div $ShardBudget").as("shard_id"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** SECOND composed pipeline — the round-4 curation stages chained the
    * way a measured-curation run uses them (`pipe2_curation`):
    *
    *   1. CONTAMINATION GATE — t16's graded score over the training slice;
    *      only `risk = 'clean'` documents survive (docs too short to score
    *      are dropped with them — unscorable ⇒ unkeepable);
    *   2. PERPLEXITY CURATION — t15's LM score recomputed over the
    *      SURVIVORS (you score against the corpus you kept), then t17's
    *      token-mass terciles; the `tail` third is dropped (CCNet keeps
    *      head, re-filters middle — we keep both to stay measurable);
    *   3. PACK — t7's two-level prefix sum assigns byte-estimated token
    *      budgets to shards in doc_id order.
    *
    * Like [[pipeCorpusPrep]], every stage reuses the exact arithmetic its
    * standalone operator proved against DuckDB, so the composition
    * hash-matches one chained-CTE oracle — the gate that catches stage
    * INTERACTIONS (filtered-corpus distributions, join key drift) that
    * per-operator gates cannot. */
  val pipe2Curation: Q = (spark, dir) => {
    val docs = Sources.testdata(spark, dir)("documents")
    val clean = PipelineQueries.contamScores(docs)
      .filter(col("risk") === "clean").select("doc_id")
    val survivors = docs
      .filter(pmod(col("doc_id"), lit(DecontMod)) =!= 0)
      .join(clean, Seq("doc_id")) // inner: unscored (short) docs drop too
    val kept = PipelineQueries.pplBuckets(PipelineQueries.lmScores(survivors))
      .filter(col("ppl_bucket") =!= "tail")
    val sized = survivors
      .join(kept.select(col("doc_id"), col("lm_xent_e6"), col("ppl_bucket")), "doc_id")
      .select(col("doc_id"), col("lm_xent_e6"), col("ppl_bucket"),
        ceil(col("n_chars") / 4.0).cast(LongType).as("est_tokens"))
    distributedCumsum(sized, "est_tokens", Seq(col("doc_id")))
      .select(col("doc_id"), col("lm_xent_e6"), col("ppl_bucket"), col("est_tokens"),
        expr(s"(cum_tokens - est_tokens) div $ShardBudget").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  /** THIRD composed pipeline — hard gates then domain balancing, the
    * order a web-corpus curation run applies them (`pipe3_gated_quota`):
    *
    *   1. RULE GATE — t20's Gopher rules; only `pass` documents survive;
    *   2. QUOTA — d10's per-source caps recomputed over the SURVIVORS:
    *      each source's cap is a percentage of its post-gate volume, so a
    *      source whose documents fail the rules loses quota with them —
    *      exactly the interaction a per-operator gate cannot see (d10's
    *      standalone caps come from raw counts).
    *
    * Both stages reuse their standalone operators' proven arithmetic, so
    * the composition hash-matches one chained-CTE oracle. Scale shape is
    * inherited: the gate is map-only, the cap table is domain-sized and
    * broadcast, and the rank is d10's skew-proof range-partitioned
    * two-level form ([[PipelineQueries.sourceQuota]] — shared code, so a
    * mega-domain can't funnel the survivor rank through one partition
    * here either). */
  val pipe3GatedQuota: Q = (spark, dir) => {
    val docs = Sources.testdata(spark, dir)("documents")
    // r14 opt: t20Flags directly — the declared t20's global sort exists
    // only for ITS oracle's row order; the gate never needed it (§2.4)
    val pass = PipelineQueries.t20Flags(fanOut(spark, docs))
      .filter(col("pass")).select("doc_id")
    sourceQuota(docs.join(pass, Seq("doc_id")))
  }

  /** FOURTH composed pipeline — the CRAWL-ORDERED opening passes of a
    * web-corpus build (`pipe4_crawl_prep`), cheapest-first as a real
    * crawl pipeline runs them:
    *
    *   1. URL DEDUP — d12's canonicalization; only each URL cluster's
    *      canonical doc survives (metadata-cheap, before any content
    *      work);
    *   2. EXACT CONTENT DEDUP — d1's digest grouping over the URL
    *      SURVIVORS: the kept doc per content class is the min surviving
    *      id, which can differ from standalone d1's keeper whenever URL
    *      dedup removed it — the stage interaction a per-operator gate
    *      cannot see;
    *   3. RULE GATE — t20's Gopher rules (per-doc, so the gate commutes;
    *      applying it last keeps the expensive text pass smallest).
    *
    * Survivor list (doc_id, source, n_words) hash-matches one
    * chained-CTE oracle. Scale shape inherited: d12's groupBy+join, one
    * digest groupBy over survivors, map-only gate. */
  val pipe4CrawlPrep: Q = (spark, dir) => {
    val docs = Sources.testdata(spark, dir)("documents")
    // r14 opt: unsorted cores — the callees' global sorts exist only for
    // their own oracles' row order (§2.4)
    val urlKeep = d12Clusters(spark, dir)
      .filter(col("is_dup") === 0).select("doc_id")
    val contentKeep = docs.join(urlKeep, Seq("doc_id"))
      .groupBy(sha2(col("text"), 256).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val pass = PipelineQueries.t20Flags(fanOut(spark, docs))
      .filter(col("pass")).select("doc_id")
    docs.join(contentKeep, Seq("doc_id")).join(pass, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), " ")).cast(LongType).as("n_words"))
      .orderBy(col("doc_id"))
  }

  /** PIPE5: the curation pipeline INCREMENTALIZED through the store — the
    * shape a growing 100 TB corpus actually runs, where "the corpus" is a
    * snapshot table and each arrival batch flows through the per-document
    * quality gate and exact-dedup ADMISSION against accumulated state,
    * while the corpus-GLOBAL mixture stage re-runs over the admitted
    * table after the last merge (its state is one |sources|-sized totals
    * agg — re-running the cheap global stage while the expensive
    * admission work stays incremental is exactly the production split).
    * Three arrival batches by doc_id range (arrival order = id order, so
    * first-arrival admission ≡ the one-shot min-id keeper), batch 2
    * REDELIVERING part of batch 1 — the digest anti-join must swallow
    * the replay. The final mixture output must hash-match a ONE-SHOT
    * chained oracle over the full corpus: the incremental decomposition
    * may change delivery, never results.
    *
    * Scale shape: per batch, the quality gate is map-only, within-batch
    * dedup is a batch-sized digest groupBy, admission is a keyed
    * anti-join against state (d9's Bloom prefilter is the proven 100 TB
    * form of this join; the gate keeps the plain anti-join — zero moving
    * parts, same result by d9's own equivalence proof), and the merge
    * writes only new-digest rows. Identical text implies identical
    * quality, so gate-then-dedup ≡ dedup-then-gate and the composition
    * stays order-free. */
  val pipe5IncrementalCorpus: Q = (spark, dir) => {
    import graft.incremental.SnapshotStore
    val docs = Sources.testdata(spark, dir)("documents")
    val quality = docs
      .withColumn("lw", split(lower(col("text")), " "))
      .withColumn("nt", size(col("lw")).cast(LongType))
      .withColumn("n_stop",
        expr(s"size(filter(lw, x -> x in ${inListSql(StopEn)}))").cast(LongType))
      .filter(expr("(least(100L, nt) * nt + 100L * n_stop) * 5000 div nt")
        >= QualityMinPpm)
      .select(col("doc_id"), col("source"), col("n_chars"),
        sha2(col("text"), 256).as("digest"))
    // batch boundaries only (a metadata-sized 1-row action, like d9's count)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (t1, t2) = (maxId / 3, 2 * maxId / 3)
    val batches = Seq(
      quality.filter(col("doc_id") <= t1),
      quality.filter(col("doc_id") > t1 && col("doc_id") <= t2)
        .unionByName(quality.filter( // redelivered tail of batch 1
          col("doc_id") <= t1 && pmod(col("doc_id"), lit(5)) === 0)),
      quality.filter(col("doc_id") > t2))
    val root = java.nio.file.Files.createTempDirectory("graft-pipe5").toString
    try {
      batches.foreach { b =>
        val dedup = b.groupBy(col("digest"))
          .agg(min_by(struct(col("doc_id"), col("source"), col("n_chars")),
            col("doc_id")).as("keep"))
          .select(col("digest"), col("keep.doc_id"), col("keep.source"),
            col("keep.n_chars"))
        val fresh = SnapshotStore.read(spark, root) match {
          case Some(state) =>
            dedup.join(state.select(col("digest")), Seq("digest"), "left_anti")
          case None => dedup
        }
        SnapshotStore.merge(spark, root, fresh, Seq("digest"))
      }
      val corpus = SnapshotStore.read(spark, root).get
        .select(col("doc_id"), col("source"),
          ceil(col("n_chars") / 4.0).cast(LongType).as("est_tokens"))
        .localCheckpoint() // feeds totals agg + membership; outlives the temp tree
      val share = MixSharePermille.foldLeft(lit(MixShareDefault)) {
        case (e, (s, r)) => when(col("source") === s, lit(r)).otherwise(e)
      }
      val bySrc = corpus.groupBy(col("source"))
        .agg(sum(col("est_tokens")).as("src_tokens"))
        .withColumn("share_pm", share)
      val budget = bySrc.agg(min(expr("src_tokens * 1000 div share_pm")).as("budget"))
      val rates = bySrc.crossJoin(broadcast(budget))
        .withColumn("keep_pm",
          least(lit(1000L), expr("budget * share_pm div src_tokens")))
        .select(col("source"), col("keep_pm"))
      corpus.join(broadcast(rates), "source")
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('mix:', cast(doc_id as string))),1,15),16,10) as bigint)"))
        .filter(pmod(col("h"), lit(1000)) < col("keep_pm"))
        .select(col("doc_id"), col("source"), col("est_tokens"), col("keep_pm"),
          expr("1000000000 div keep_pm").as("weight_ppm"))
        .orderBy(col("doc_id"))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** pipe6: dedup-as-TRANSFORMATION feeding the batch layout — d16 cuts
    * every corpus-repeated span out of the text, then t26 packs the
    * SURVIVING token stream into fixed contexts (what Lee et al.'s
    * pipeline actually ships to training: the cut corpus, packed). The
    * composition is the point: packing consumes the rewritten counts, so
    * a single mis-cut token anywhere shifts every later context boundary
    * and reds the whole hash — stage interactions are gated, not just
    * stages. Docs cut to zero tokens drop out (nothing left to pack). */
  val pipe6CutPack: Q = (spark, dir) =>
    PipelineQueries.packSequences(
      PipelineQueries.d16CutReport(spark, dir)
        .select(col("doc_id"), col("kept_words").as("est_tokens")))

  /** pipe7: the TRAINING-ORDER pipeline — the last mile a pretraining run
    * actually executes, composed end to end: exact-dedup the corpus (d1's
    * digest election, min-id keeper per identical text), hard-gate the
    * survivors (t20's Gopher rules, the shared [[PipelineQueries.t20Flags]]
    * formula), apportion the global token budget over what remains (t30's
    * Hamilton plan — shares recomputed over the SURVIVING mixture, which
    * is the point: dedup and gating shift every source's quota), then lay
    * out the (doc, epoch) instance stream in salted order into
    * token-budget shards (t31's shuffle). A single wrongly-dropped or
    * wrongly-kept document shifts the apportionment remainders, every
    * later position's running sum, and thus every shard boundary — the
    * composition is gated, not just the stages.
    *
    * Scale: stage 1 shuffles 32-byte digests, stage 2 is map-only, stages
    * 3–4 inherit t30/t31's shapes (domain-sized apportionment broadcast;
    * one hash-range cumsum shuffle). */
  val pipe7TrainingOrder: Q = (spark, dir) => {
    val docs = Sources.testdata(spark, dir)("documents")
    val keepers = docs
      .groupBy(sha2(col("text"), 256).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val surv = PipelineQueries.t20Flags(docs.join(keepers, "doc_id"))
      .filter(col("pass"))
      .select(col("source").as("g"), col("doc_id"),
        expr("(n_chars + 3) div 4").as("tok"))
    PipelineQueries.epochShuffleFor(PipelineQueries.t30PlanFor(surv))
  }

  val all: Map[String, Q] = Map(
    "pipe7_training_order" -> pipe7TrainingOrder,
    "pipe_corpus_prep" -> pipeCorpusPrep,
    "pipe2_curation" -> pipe2Curation,
    "pipe3_gated_quota" -> pipe3GatedQuota,
    "pipe4_crawl_prep" -> pipe4CrawlPrep,
    "pipe5_incremental_corpus" -> pipe5IncrementalCorpus,
    "pipe6_cut_pack" -> pipe6CutPack)
}
