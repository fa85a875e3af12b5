package graft

/** Plan-shape regression guards — the 100 TB invariants. A correctness
  * pass with a quadratic or unpruned plan is still a failing build. */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  /** Queries allowed to contain a nested-loop/cartesian stage:
    * the brute-force kNN baseline (deliberately quadratic) and the
    * IVF/k-means centroid assignment (broadcast of a k-sized centroid
    * set against every vector — linear in the corpus, not quadratic). */
  private val quadraticByDesign =
    Set("sim_knn_brute", "sim_knn_ivf", "sim_kmeans_step", "mm_knn",
      "sim_coreset", // broadcast of the k-sized centroid set (IVF assign)
      "sim_kmeans_inertia", // same k-sized centroid broadcast, per iteration audited
      "sim_ann_recall", // embeds the brute-force baseline it grades against
      "sim_ivf_recall", // same: brute baseline + IVF centroid broadcast
      "sim_pq_code", // broadcast of the 64-subvector PQ codebook
      "sim_pq_adc", // embeds the same broadcast-codebook assignment
      "sim_pq_recall", // embeds the exact-L2 brute force it grades against
      "sim_ivfpq_search", // broadcast centroid probe (k-sized, linear in queries)
      "sim_ivfpq_recall", // embeds the exact-L2 brute force it grades against
      "sim_nprobe_sweep", // the same brute baseline + probe, once per width
      "sim_ivfpq_residual", // same broadcast centroid probe, residual variant
      "sim_ivfpq_res_recall", // embeds the exact-L2 brute force it grades against
      "sim_ivfpq_rerank", // embeds the residual probe's centroid broadcast
      "sim_ivfpq_rerank_recall", // embeds the exact-L2 brute force baseline
      "sim_sq8_search", // broadcast query-sample cross (SQFlat baseline)
      "sim_sq8_recall", // embeds the exact-L2 brute force it grades against
      "sim_ivfsq_search", // broadcast centroid probe + coded query sample
      "sim_ivfsq_recall", // embeds the exact-L2 brute force it grades against
      "sim_rp_search", // broadcast query-sample cross in sketch space
      "sim_rp_recall", // embeds the exact-L2 brute force it grades against
      "sim_index_build", // broadcast centroid + codebook assignments
      "rel_cross_small", // 5×25 dimension product — the cross IS the query
      "wh_dq_checks", // 1-row × 1-row scalar cross (metrics × orphan count)
      "curate_dsir_weights", // 1-row broadcast of the 64-entry weight array
      "curate_dsir_resample", // same 1-row weight-array broadcast, resampled
      "curate_semdedup", // broadcast centroid assignment (k-sized, linear)
      "curate_sem_decontaminate", // same shared assignment build path
      "curate_cluster_balance", // same assignment + k-row count broadcast
      "text_lm_score", // 1-row broadcast of the 65,536-entry LM weight array
      "curate_lm_gate", // same 1-row LM weight-array broadcast, gated
      "text_lm_ratio_score", // TWO 1-row grid broadcasts (target + background)
      "curate_lm_ratio_gate", // same two-grid broadcast, ratio-gated
      "sim_nprobe_rerank_sweep", // brute baseline + probe broadcast, once per width
      "sim_rwidth_sweep", // same, once per shortlist width
      "sim_filtered_search", // broadcast centroid probe, pre-filtered neighbors
      "sim_filtered_recall", // embeds the FILTERED brute baseline it grades against
      "sim_postfilter_recall", // same filtered baseline, post-filter comparison row
      "dedup_band_sweep", // sampled-slice exhaustive Jaccard truth by design
      "sim_index_drift", // broadcast centroid assignment (k-sized, linear)
      "sim_index_retrain", // two broadcast centroid assignments (both k-sized, linear)
      "corpus_hybrid_rrf", // dense branch is the brute query-sample broadcast cross
      "sim_centroid_confusion", // broadcast of the labels-sized centroid set
      "graph_kcore_peel", // per-round 1-row × 1-row scalar cross (survivors × induced edges)
      "curate_pipeline", // DSIR weight-array + LM-grid 1-row broadcasts
      "curate_pipeline_cls", // same broadcasts; the NB stage is map-only literal folds
      "corpus_hll_card", // 1-row × 1-row scalar cross (sketch estimate × exact count)
      "corpus_hll_langs", // same 1-row scalar cross (three sketches × exact set sizes)
      "sim_index_serve_delta", // broadcast centroid assignments + probe (k-sized, linear)
      "corpus_graph_rrf", // dense branch is the hybrid row's brute query-sample broadcast cross
      "graph_skew_audit", // 1-row scalar cross (degree table × its own total)
      "corpus_kmv_estimate", // 1-row scalar cross (sketch estimate × exact count)
      "corpus_kmv_jaccard", // same 1-row scalar cross (two sketches × exact overlap)
      "curate_kmv_decontam", // same 1-row scalar cross (split sketches × exact leak count)
      "graph_skew_mitigated", // 1-row scalar crosses (key table × its total, cold stats × hot stats)
      "graph_skew_step", // same 1-row total cross gating the hub set
      "mm_hybrid_rrf", // feature branch embeds mm_knn's brute query-sample broadcast cross
      // (the graph-ANN serve/recall rows' centroid-probe broadcast crosses
      // live inside their eagerly-checkpointed index builds — those SERVED
      // plans are clean, so they are deliberately NOT registered here)
      "sim_graph_hop_sweep", // the hop-0 branch IS the raw entry-cell scan: its k-sized centroid-probe broadcast is in the plan by design
      "curate_pack_shards", // the same 1-row total cross over the chunk frame
      "curate_shard_plan", // 1-row corpus-total broadcast cross (the scalar-cross doctrine)
      "curate_shard_manifest", // same 1-row total cross under the rollup
      "curate_pipeline_shards", // pipeline's grid broadcasts + the same 1-row total cross
      "sim_graph_delta_drift", // per-fraction entry seeding plans the k-sized centroid-probe broadcast
      "sim_graph_delta_patch", // same entry-seeding broadcast, stale + patched branches
      "sim_graph_entry_sweep", // same centroid-probe broadcast, once per entry width
      "curate_shard_epochs", // shard plan's 1-row total cross + the nEpochs-row epoch broadcast cross (both metadata-sized)
      "sim_hier_assign", // flat + coarse + fine centroid broadcasts (all k-sized, linear in the corpus)
      "sim_hier_probe_sweep") // the same three k-sized broadcasts, once per probe width

  test("no query plans an accidental cartesian / nested-loop join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      val bad = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      if (bad && !quadraticByDesign(name)) Some(name) else None
    }
    offenders shouldBe empty
  }

  test("enrichment joins broadcast the dimension (fact side never hash-shuffles)") {
    val p = plan("cdc_enrich")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // the only exchanges in the whole enrichment are the dimension
    // broadcast and the single source-side round-robin (input-
    // parallelism emulation for the unsplittable one-row-group fixture;
    // a real Kafka topic / multi-split table arrives pre-parallel) —
    // the fact never hash-partitions on its way to the output
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    exchanges.foreach(l =>
      assert(l.contains("BroadcastExchange") || l.contains("RoundRobinPartitioning"),
        s"unexpected fact-side shuffle: $l"))
    exchanges.count(_.contains("RoundRobinPartitioning")) shouldBe 1
  }

  test("text queries prune the documents scan to the used columns") {
    plan("text_stats") should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("top-K plans as TakeOrderedAndProject, not a global sort") {
    plan("rel_top_orders") should include("TakeOrderedAndProject")
  }

  test("filter pushdown reaches the parquet scan") {
    plan("rel_pricing_summary") should include("PushedFilters: [")
  }

  test("blocked jaccard never broadcasts the corpus (shuffled equi-join)") {
    // the build side of the near-dup self-join grows with the corpus —
    // a BroadcastExchange here is the plan that dies at 100 TB
    plan("dedup_ngram_jaccard") should not include "BroadcastExchange"
  }

  test("blocked containment keeps the same no-broadcast join shape") {
    plan("dedup_containment") should not include "BroadcastExchange"
  }

  test("per-group sample pushes the rank limit below the shuffle") {
    // WindowGroupLimit keeps each task's local top-K per group before
    // the exchange — without it the sample shuffles the whole table
    plan("op_reservoir_sample") should include("WindowGroupLimit")
  }

  test("bucketed join is exchange-free on the join key (co-located layout)") {
    val p = plan("op_bucket_join")
    p should include("SortMergeJoin")
    p should include("Bucketed: true")
    // the only exchange allowed is the post-join rollup on c_mktsegment;
    // an exchange on the custkey join key means the bucket layout was
    // not used — the plan that re-shuffles 100 TB on every join
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    exchanges.foreach { l =>
      assert(l.contains("c_mktsegment"), s"join-key exchange in bucketed join: $l")
    }
  }

  test("split manifest is map-only assignment + one manifest shuffle, no join") {
    val p = plan("curate_split")
    p should not include "Join"
    // hash assignment happens in the scan projection; the only exchange
    // is the tiny (source × split) aggregate
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
  }

  test("rolling z-score shuffles once on the window partition key") {
    val p = plan("analytics_rolling_zscore")
    p should include("Window")
    // one hashpartitioning(event_type) for the window; a second exchange
    // would mean the frame evaluation re-partitioned the fact twice
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
  }

  test("bench top-5 slow queries stay inside their exchange budgets") {
    // The queries the bench's plan dump audits (the most expensive ones)
    // each have a measured exchange count; drifting past the ceiling
    // means a shuffle crept into a hot plan — fail the build, don't wait
    // for a reviewer to eyeball bench_plans.txt. Ceilings carry +1 slack
    // over the measured count where AQE has latitude; the single-shuffle
    // plans are pinned exact.
    // Counts are tree-string node occurrences (broadcast exchanges and
    // repeated shared subtrees included), so they sit above the
    // formatted-plan's deduped counts — measured here, +1 slack.
    val ceilings = Map(
      "analytics_basket_pairs" -> 7, // measured 6: pairs agg + freq joins + lift agg
      "dedup_components" -> 0, // checkpointed label frame: a pure scan
      "dedup_keeper_election" -> 7, // measured 6: quality join + argmax two-phase
      "graph_pagerank_step" -> 14, // measured 13 (r12: edges built straight off the events scan — the fact repartition is gone)
      "rel_pricing_summary" -> 1, // TPC-H Q1: single two-phase aggregation
      "mm_knn" -> 2, // measured 1 + slack: quadratic-by-design baseline
      "op_pps_sample" -> 5, // measured 4: bucketed window + offsets agg/window + broadcast
      // r6 bench time doubled with the code untouched (ambient drift,
      // re-profiled at 0.93 s in r7); ceiling pinned so only a PLAN
      // change can move it again, not session noise
      "dedup_embedding_cosine" -> 5, // measured 4: LSH candidates + verify joins
      "curate_scorecard" -> 11, // measured 10: four family subtrees + source rollup
      "mm_phash_clusters" -> 0, // checkpointed CC labels: a pure scan
      "corpus_search" -> 10, // measured 9: tf/df builds × query+corpus sides + top-5
      // r8 bench top-5 entrants (verdict: keep the most-expensive set
      // mechanically pinned as it rotates)
      "adv_grouping_sets" -> 2, // measured 1: expand → partial → one exchange → final
      "sim_kmeans_inertia" -> 15, // measured 14: 3 audited iterations × (assign min + global sum) off the checkpoint
      // r9 entrants: the composed serving path + iterated pagerank
      "sim_ivfpq_search" -> 12, // measured 11: index build (assign + codes) + pruned ADC agg + top-k
      "graph_pagerank_train" -> 0, // checkpointed rank frame: a pure scan
      "graph_pagerank_converge" -> 9, // measured 8: 3 delta joins + sums over checkpointed frames
      // r9 retrieval-frontier entrants
      "sim_ivfpq_rerank" -> 14, // measured 13: residual search at width R + two broadcast gathers + top-k
      "sim_sq8_search" -> 9, // measured 8: range agg collapse + coded cross + top-k
      "corpus_bm25" -> 12, // measured 11: corpus_search's shape + the dl join
      "curate_dsir_weights" -> 7, // measured 6: two count aggs + weight-table collapse
      "curate_dsir_resample" -> 17, // measured 16: weights + bucketed prefix-sum + offsets
      // r9 curation entrants (bench top-5 rotation: pipeline + LM gate)
      "text_lm_train" -> 0, // checkpointed LM grid: a pure scan + filter
      "text_lm_score" -> 3, // measured 2: grid collapse + corpus manifest agg
      "curate_lm_gate" -> 4, // measured 3: the score shape + per-lang rollup
      "curate_semdedup" -> 5, // measured 4: in-cell pair join + manifest join off the checkpointed assignment
      "curate_cluster_balance" -> 4, // measured 3: cell counts + broadcast-back + manifest agg
      "curate_pipeline" -> 24, // measured 20 (r13: survivors' manifest eagerly checkpointed — the literal-grid gate scan runs and plans ONCE; was 44)
      "curate_pipeline_cls" -> 24, // measured 20 (r13: same checkpoint; the fused-gate scan's megabyte literals stopped re-planning per consumer — was 44, and 59 as two passes)
      "sim_nprobe_sweep" -> 50, // measured 48: three probe-width branches × (search + exact-baseline compare)
      // r10 bench top-2 entrants: the production-path serving-knob
      // sweeps each replay the rerank chain + exact baseline 3×
      "sim_nprobe_rerank_sweep" -> 56, // measured 54: 3 × (residual probe search + re-rank gathers + brute compare)
      "sim_rwidth_sweep" -> 56, // measured 54: same chain swept over shortlist widths
      "sim_rp_recall" -> 12, // measured 10 + AQE slack: sketch ranking + shared exact re-rank + brute compare
      "sim_ivfsq_recall" -> 21, // measured 19: IVF assign + probe + SQ8 coding + brute compare
      // r10-final bench entrants (top-5 rotation + the new flagships)
      "dedup_band_sweep" -> 21, // measured 20: 4 configs × (band join + full-outer count agg) + the sampled truth pair
      "sim_index_drift" -> 18, // measured 17: cohort k-means train (2 Lloyd iters) + broadcast argmin assign + cell rollup
      "corpus_hybrid_rrf" -> 17, // measured 16: the BM25 chain + dense brute top-5 + one fusion outer join
      // r11 flagships (new-query shapes locked on entry)
      "sim_index_retrain" -> 6, // measured 5: two broadcast-centroid assignments off checkpoints + one 2-group agg
      "curate_nb_gate" -> 2, // measured 1: map-only literal-grid folds + one per-lang rollup
      "text_nb_score" -> 0, // map-only: |classes| compiled folds over one scan, grids as literals
      "graph_wsp_dists" -> 0, // checkpointed Bellman–Ford trace: a pure scan
      "graph_ppr_train" -> 0, // checkpointed random-walk trace: a pure scan
      "graph_ppr_converge" -> 5, // measured 4: 4 per-round scalar aggs off the checkpointed trace
      "graph_wsp_converge" -> 12, // measured 11: 11 per-round scalar aggs off the checkpointed trace
      "corpus_qhist_merge" -> 4, // measured 3: halves agg + full agg + the cell-keyed join
      "corpus_pmi" -> 6, // measured 5: bigram agg + unigram agg + vocab broadcast-back
      "corpus_qhist_quantiles" -> 6, // measured 5: five 1-row conditional aggs off the windowed checkpoint
      "graph_kcore_peel" -> 50, // measured 49: 7 peel rounds × (two restrictions + degree agg) + 1-row crosses
      // r12 entrants (new-query shapes locked on entry)
      "sim_index_serve_delta" -> 11, // measured 10: two broadcast-centroid assignments + probe + re-rank top-k
      "corpus_graph_rrf" -> 10, // measured 9: dense brute top-5 + edge/PPR probe + one fusion outer join
      "corpus_hll_build" -> 1, // measured 1: one map-side-combined register aggregation
      "corpus_hll_merge" -> 1, // measured 1: one grouped register aggregation (halves in one pass)
      "corpus_hll_card" -> 5, // measured 4: sketch agg + exact count + the 1-row scalar cross
      "corpus_hll_langs" -> 6, // measured 5: per-cohort sketch aggs + exact set sizes + scalar cross
      "graph_skew_audit" -> 5, // measured 4: degree agg + 1-row total broadcast + top-10
      "corpus_kmv_build" -> 1, // measured 1: one map-side-combined value-set aggregation
      "corpus_kmv_merge" -> 1, // measured 1: three conditional sketches in one aggregation
      "corpus_kmv_estimate" -> 5, // measured 4: sketch agg + exact count + the 1-row scalar cross
      "corpus_kmv_jaccard" -> 5, // measured 4: two conditional sketches + exact overlap + scalar cross
      "curate_kmv_decontam" -> 5, // measured 4: two split sketches + exact leak count + scalar cross
      // r13 entrants (new-query shapes locked on entry; tree-string
      // counts repeat the shared deg/tot subtrees per consumer — the
      // physical plan reuses those exchanges)
      "graph_skew_mitigated" -> 18, // measured 17: degree agg + total cross + two stage summaries
      "graph_skew_step" -> 27, // measured 26: deg/hub gate + split-join branches + in-mass agg (deg subtree repeated per branch)
      "mm_hybrid_rrf" -> 17, // measured 16: BM25 chain (qterms broadcast) + feature brute top-5 + one fusion outer join
      // graph-ANN rows (serve plans read eagerly-checkpointed indexes;
      // the builds' centroid broadcasts land before the measured plan)
      "sim_nn_graph" -> 1, // measured 0: a pure scan of the checkpointed edge list
      // r16 re-measure for the graph traversal family: the final hop now
      // executes in the OUTPUT job (last-hop checkpoint elision — one
      // fewer materialization job per search), so its window/join/
      // distinct exchanges moved INTO the measured plan instead of
      // hiding in a checkpoint side-job; executed exchange totals are
      // unchanged-to-lower, the counts below just stopped undercounting
      "sim_graph_search" -> 11, // measured 10: the hop-2 subtree (beam window + edge/query/vec joins + distinct) + final top-K window, over the hop-1 checkpoint
      "sim_graph_recall" -> 14, // measured 13: the search shape + exact-baseline join + per-query recall agg
      "curate_gate_agreement" -> 3, // measured 2: one fused literal-grid pass + the 1-row contingency agg
      "sim_graph_hop_sweep" -> 16, // measured 15 (was 32): r16 trace fusion — ONE traversal with per-depth top-K cuts + ONE branch-keyed recall compare, instead of 3 full searches + 3 compares
      "curate_nb_bands" -> 3, // measured 2: map-only fixed banding + one ≤21-group aggregate
      // r14 entrants (new-query shapes locked on entry)
      "curate_substring_spans" -> 0, // checkpointed span manifest: a pure scan
      "curate_substring_strip" -> 4, // measured 3: interval merge window + per-doc agg + the corpus-side broadcast join
      "sim_graph_serve_delta" -> 11, // measured 10: the sim_graph_search shape on the base-edge/union-assignment pair (r16: final hop in the measured plan, and the serve-side query frame no longer routes through the probe stage's broadcast cross)
      "sim_graph_beam_sweep" -> 14, // measured 13: r16 branch fusion — ONE branch-keyed traversal (per-branch beam cut) + ONE fused recall compare, instead of 3 searches + 3 compares
      "sim_graph_degree_sweep" -> 14, // measured 13: same fused shape over the branch-tagged erank prefixes of the one wide checkpointed build
      "curate_substring_decontam" -> 6, // measured 5: the strip shape (interval merge + per-doc agg + corpus join) + the source rollup, off the checkpointed span manifest
      // r15 entrants (new-query shapes locked on entry)
      "curate_shard_plan" -> 9, // measured 7: prefix-sum kernel (bucket window + offsets agg/window + broadcast) + the 64-row-derived total (its corpus agg is a ReusedExchange) + 1-row broadcast cross
      "curate_shard_manifest" -> 11, // measured 9: the plan shape + the per-shard rollup
      "curate_pipeline_shards" -> 11, // measured 9 (65 before the train-manifest checkpoint): shard kernel over the checkpointed six-family manifest
      "sim_graph_delta_drift" -> 14, // measured 13: r16 branch fusion over the tagged union of per-fraction checkpointed base builds
      "sim_graph_entry_sweep" -> 14, // measured 13: r16 branch fusion; every width's probe set is a __cr-prefix filter of ONE centroid ranking
      "curate_pack_shards" -> 11, // measured 9: shard kernel over the checkpointed chunk frame (sources × chunks rows)
      "sim_graph_delta_patch" -> 14, // measured 13: r16 branch fusion (stale/patched as a 2-branch tagged edge union; final hop in the measured plan)
      // r16 entrants (new-query shapes locked on entry)
      "curate_shard_epochs" -> 11, // measured 9: the shard-plan shape (prefix-sum kernel + total cross) + the per-(epoch,shard) rank window over the epoch-crossed plan
      "sim_graph_patch_sweep" -> 14, // measured 13: r16 branch fusion over the tagged per-fraction base∪patch edge unions — the delta-drift shape
      "sim_hier_assign" -> 9, // measured 7: flat argmin window + the 3-stage hier chain (fine→coarse window, vector→coarse window, probed-cells argmin) + the flat⋈hier SMJ
      "sim_hier_probe_sweep" -> 27) // measured 24: the sim_hier_assign shape once per probe width (3), each branch reduced to a 1-row aggregate before the union
    val over = ceilings.toSeq.sorted.flatMap { case (name, cap) =>
      val n = plan(name).linesIterator
        .count(l => l.contains("Exchange") && !l.contains("ReusedExchange"))
      if (n > cap) Some(s"$name: $n exchanges > ceiling $cap") else None
    }
    over shouldBe empty
  }

  test("prefix-sum operators broadcast the offsets, never shuffle the fact for the join") {
    // pack chunks / PPS sampling: the bucket-offset frame is rows=buckets
    // (64 per source) — it must arrive at the fact via BroadcastExchange;
    // a shuffled join here re-partitions the full table a second time.
    // The fact-side cumsum must run over the hash-bucket partitioning
    // (parallel local windows), not a single global window.
    for (name <- Seq("curate_pack_chunks", "op_pps_sample")) {
      val p = plan(name)
      p should include("BroadcastHashJoin")
      assert(p.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("bkt")),
        s"$name: fact-side cumsum window not partitioned by hash bucket")
      // the only single-partition stage allowed is the offsets window
      // (64 rows per source); the fact side must never collapse
      p.linesIterator.count(_.contains("Exchange SinglePartition")) should be <= 1
    }
  }

  /** Text-walk guard for the one single-task stage the engine permits:
    * an `Exchange SinglePartition` whose input is an AGGREGATE (rows =
    * groups by construction — the prefix-sum offsets frame, global
    * scalar aggregates). Anything else collapsing to one partition —
    * a global window over a raw scan, a join output, a generate — is a
    * scale killer that the known-benign `WindowExec: No Partition
    * Defined` warning noise would otherwise mask. Returns offender
    * descriptions; pure so the deliberately-broken fixture test below
    * can prove it fires. */
  private def singlePartitionOffenders(planText: String): Seq[String] = {
    val lines = planText.linesIterator.toVector
    def indentOf(l: String): Int = l.indexWhere(_.isLetter)
    val aggregates = Seq("HashAggregate", "ObjectHashAggregate", "SortAggregate")
    // pass-through nodes that don't change the child's cardinality class
    // (exchanges repartition but never multiply rows — the distinct-agg
    // two-phase plans SinglePartition → hashpartitioning → aggregate)
    val passThrough = Seq("Project", "Sort", "Filter", "WholeStageCodegen",
      "InputAdapter", "ColumnarToRow", "AQEShuffleRead", "ShuffleQueryStage",
      "Exchange hashpartitioning")
    lines.zipWithIndex
      .filter(_._1.contains("Exchange SinglePartition"))
      .flatMap { case (exLine, i) =>
        val d = indentOf(exLine)
        val subtree = lines.drop(i + 1).takeWhile(l =>
          indentOf(l) < 0 || indentOf(l) > d)
        // aggregates are tested FIRST: "SortAggregate" must not be
        // swallowed by the "Sort" pass-through prefix
        val decider = subtree.map(l => l.dropWhile(c => !c.isLetter))
          .find(node => aggregates.exists(node.startsWith) ||
            !passThrough.exists(node.startsWith))
        decider match {
          case Some(node) if aggregates.exists(node.startsWith) => None
          case Some(node) => Some(s"SinglePartition over non-aggregate: $node")
          case None => Some("SinglePartition with empty subtree")
        }
      }
  }

  test("single-partition collapses ride aggregate frames only (rows=groups)") {
    // registry-wide: the PrefixSum offsets window and global scalar
    // aggregates are the only legitimate single-task stages — both sit
    // directly on an aggregate. A future global window/sort over a
    // corpus-scale frame fails here instead of hiding in warning noise.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      singlePartitionOffenders(plan(name)).map(o => s"$name: $o")
    }
    offenders shouldBe empty
  }

  test("the single-partition guard actually fires on a global window over a scan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    val bad = Seq((1L, 2L), (2L, 3L)).toDF("id", "v")
      .withColumn("c", sum(col("v")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
    val text = bad.queryExecution.executedPlan.toString
    text should include("Exchange SinglePartition") // fixture sanity
    singlePartitionOffenders(text) should not be empty
  }

  test("decontamination consumes the shared pair frame, not a recompute") {
    // the pairs subtree is the checkpointed shared frame (Scan
    // ExistingRDD); a Generate (shingle/band explode) in this plan means
    // the sharing regressed to rebuilding the MinHash pipeline, and any
    // Join means split tagging stopped being endpoint arithmetic
    val p = plan("curate_decontaminate")
    p should include("ExistingRDD")
    p should not include "Generate"
    p should not include "Join"
  }

  test("minhash pair pipeline keeps its scale shape (pinned un-memoized)") {
    // the shared frame hides the pipeline from the registry's plans, so
    // pin the operator itself: exactly one shingle explode per side of
    // the band-key candidate self-join — a symmetrizing union (or a
    // per-orientation recompute) would double the Generate count and
    // the full candidate cost at 100 TB
    val p = graft.operators.Dedup.nearDuplicates(
      graft.ingest.Tables.documents(spark, d),
      "doc_id", "text", n = 1, k = 12, bands = 4, threshold = 0.9,
      bucketCap = 48).queryExecution.executedPlan.toString
    p.linesIterator.count(_.contains("Generate")) shouldBe 2
  }

  test("coreset cell quota is pushed below the cell shuffle") {
    // like op_reservoir_sample: each task keeps its local top-quota per
    // cell before the exchange — without WindowGroupLimit the whole
    // corpus shuffles on cell_id just to drop most of it
    plan("sim_coreset") should include("WindowGroupLimit")
  }

  test("quality gate is one shuffle (per-source window), map-only scoring") {
    val p = plan("curate_quality_gate")
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    p should not include "Join"
  }

  test("recipe capstone applies drops as an anti-join over the shared pair frame") {
    val p = plan("curate_recipe")
    // the drop manifest prunes the gated survivors via LeftAnti — a
    // positive-join + dedup shape would materialize matches instead
    p should include("LeftAnti")
    // the pairs subtree is the checkpointed shared frame, same
    // no-recompute invariant as curate_decontaminate
    p should include("ExistingRDD")
    p.linesIterator.count(_.contains("Generate")) shouldBe 0
  }

  test("pair listing is served from the shared frame (pure checkpoint scan)") {
    val p = plan("dedup_minhash_pairs")
    p should include("ExistingRDD")
    p.linesIterator.count(_.contains("Exchange")) shouldBe 0
  }

  test("keeper election consumes the shared label frame, not a recompute") {
    // dedup_keeper_election must build on the checkpointed connected-
    // components labels (Scan ExistingRDD) — a MinHash/LSH stage in its
    // plan means the label sharing regressed to recomputing the whole
    // near-dup pipeline per query
    val p = plan("dedup_keeper_election")
    p should include("ExistingRDD")
    p should not include "Generate" // the shingle/band explode stage
  }

  test("cluster-size histogram reuses the shared label frame and anti-joins singletons") {
    val p = plan("dedup_cluster_sizes")
    p should include("ExistingRDD") // the checkpointed labels, no recompute
    p should not include "Generate" // no shingle/band explode stage
    p should include("LeftAnti") // singleton count = corpus minus clustered
  }

  test("scorecard reuses the shared label frame and never broadcasts the digest table") {
    val p = plan("curate_scorecard")
    p should include("ExistingRDD") // near-dup membership off the checkpoint
    p should not include "Generate" // no shingle/band explode stage
    // the digest-df join keys on 16-byte digests, corpus-sized on both
    // sides — a broadcast here would ship the digest table to every
    // executor and die at 100 TB (join lines carry the key names in the
    // simple tree string, so pin on the join node itself)
    val digestJoins = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("digest")).toSeq
    digestJoins should not be empty // the join exists...
    digestJoins.filter(_.contains("Broadcast")) shouldBe empty // ...shuffled
  }

  test("span dedup is two shuffles: span-digest election, doc reassembly") {
    val p = plan("dedup_spans")
    p should include("Generate") // map-only span carving (posexplode)
    p should not include "BroadcastExchange" // nothing to broadcast
    p should not include "SortMergeJoin" // no join at all — window + agg
    // exactly two hash exchanges: the first-occurrence window keyed on
    // the 16-byte span digest, then the per-doc reassembly on doc_id —
    // the corpus moves twice and only twice at any scale
    p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning")) shouldBe 2
  }

  test("BPE merge step: two vocab-scale exchanges, top-K without global sort") {
    val p = plan("text_bpe_step")
    p should include("TakeOrderedAndProject") // top-20, not a global sort
    p should not include "SortMergeJoin" // no join anywhere
    p should not include "BroadcastExchange"
    // word-count and pair-count aggregations, both map-side combined —
    // the only data that ever shuffles is vocab-scale, never the corpus
    p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning")) shouldBe 2
  }

  test("PQ assignment is one map-side-combined aggregation, no per-vector window") {
    // the registered row serves the MEMOIZED stored index since r16 —
    // a pure checkpoint scan like the phash pair frame
    val p = plan("sim_pq_code")
    p should include("ExistingRDD")
    p should not include "Window"
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 0
    // the BUILD behind the memo keeps the pinned coding shape: the
    // TRAINED codebook (16 codewords × 4 subspaces, a FrameCache
    // checkpoint) broadcasts onto the subvector fan-out via an
    // equi-join on `sub`; the argmin rides the min-key aggregation, so
    // there must be NO window and exactly one hash exchange carrying
    // (vec_id, sub, partial min)
    val b = graft.queries.SimilarityQueries.pqCodesBuild(spark, d)
      .queryExecution.executedPlan.toString
    b should include("BroadcastHashJoin")
    b should include("ExistingRDD") // codebook read from the trained checkpoint
    b should not include "Window"
    b.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("k-means training: broadcast centroids, no unbounded shuffle, argmin without window") {
    // the trainer itself (the un-memoized pipelines): per iteration the
    // k-sized centroid frame broadcasts (IVF: nested-loop over the
    // corpus — linear, not quadratic; PQ: equi-join on the subspace
    // key) and the argmin is min(struct(d2, cent_id)) — an aggregation,
    // never a per-vector window sort
    val ivf = graft.queries.SimilarityQueries.ivfTrainPipeline(spark, d)
      .queryExecution.executedPlan.toString
    ivf should include("BroadcastNestedLoopJoin")
    ivf should not include "CartesianProduct"
    ivf should not include "Window"
    val pq = graft.queries.SimilarityQueries.pqTrainPipeline(spark, d)
      .queryExecution.executedPlan.toString
    pq should not include "BroadcastNestedLoopJoin" // grouped: keyed on sub
    pq should not include "CartesianProduct"
    pq should not include "Window"
  }

  test("ADC search broadcasts the distance table and group-limits top-k") {
    val p = plan("sim_pq_adc")
    // the |queries|×32 distance table broadcasts onto the coded corpus
    // via an equi-join on (sub, code) — the corpus codes never shuffle
    // for the lookup — and per-query top-k is a WindowGroupLimit
    p should include("BroadcastHashJoin")
    p should include("WindowGroupLimit")
    p should not include "SortMergeJoin"
  }

  test("retrieval broadcasts the query terms and group-limits top-5") {
    val p = plan("corpus_search")
    p should include("BroadcastHashJoin") // query bag ⋈ postings
    p should not include "SortMergeJoin" // corpus never re-sorts for retrieval
    p should include("WindowGroupLimit") // per-query top-5, no global sort
  }

  test("hash-embed is one map-side-combined shuffle, no vocabulary join") {
    val p = plan("text_hash_embed")
    p should not include "Join"
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
  }

  test("overlap chunking is map-only — a zero-exchange plan") {
    val p = plan("curate_chunk_overlap")
    p should include("Generate") // the posexplode fan-out
    p should not include "Exchange" // no agg, no join, no window: scan speed
  }

  test("phash pair listing is served from the shared frame (checkpoint scan)") {
    val p = plan("mm_phash_pairs")
    p should include("ExistingRDD")
    p.linesIterator.count(_.contains("Exchange")) shouldBe 0
  }

  test("phash near-dup pipeline joins signatures shuffled, never broadcast (pinned un-memoized)") {
    // the shared frame hides the pipeline from the registry's plans —
    // pin the operator itself, like the MinHash pipeline pin above
    val p = graft.queries.MultimodalQueries.phashPairsPipeline(spark, d)
      .queryExecution.executedPlan.toString
    p should include("MapElements") // signature map at the codec seam
    p should include("ShuffledHashJoin") // band equi-join, hint respected
    // both join sides are the corpus-scale signature table — a
    // broadcast here dies at 100 TB exactly like the digest table in
    // the scorecard pin
    p should not include "BroadcastHashJoin"
    p should not include "CartesianProduct"
  }

  test("phash clusters consume the shared pair frame, not a recompute") {
    val p = plan("mm_phash_clusters")
    p should include("ExistingRDD") // CC rounds read the checkpointed pairs
    p should not include "MapElements" // no signature recompute
  }

  test("triangle counting stays on equi-joins over oriented id pairs") {
    val p = plan("graph_triangles")
    // degree orientation exists to keep the wedge step an equi-join —
    // a cartesian/BNL stage here means the orientation regressed
    p should not include "Cartesian"
    p should not include "BroadcastNestedLoop"
  }

  test("novelty score never joins the n-gram frequency table back onto shingles") {
    // the 3-gram vocabulary grows with the corpus: the novel count must
    // come out of the df aggregation itself (owner = min(doc_id)),
    // leaving ONE doc-scale join — a second join would mean the
    // unbroadcastable vocab is being shipped back through the shingles
    val p = plan("text_novelty")
    p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) shouldBe 1
  }
}
