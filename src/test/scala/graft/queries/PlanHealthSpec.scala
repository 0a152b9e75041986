package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guard over EVERY registered query: no
  * CartesianProduct anywhere, and BroadcastNestedLoopJoin only in the
  * queries whose non-equi joins are bounded frames BY CONSTRUCTION
  * (1-row totals, <= numPartitions offset stats, fixed 10-query
  * broadcast sides, IVF centroid models). A new query accidentally
  * shipping a data x data cross join fails here before it ever reaches
  * a benchmark.
  */
class PlanHealthSpec extends SparkSpec {

  /** Queries whose NLJ operands are bounded by construction (audited in
    * SURVEY round-3 scale notes). Keep this list SHORT and justified.
    */
  private val boundedNlj = Set(
    "order_deciles",          // 1-row total + <=numPartitions offsets
    "percentiles_exact_rank", // same two frames
    "sample_temperature",     // 1-row min-token frame
    "set_ops_customers",      // scalar-aggregate set algebra
    "sim_topk_brute",         // deliberate exact baseline: 10 fixed queries broadcast
    "knn_label_eval",         // same 10-query broadcast scoring as sim_topk_brute
    "sim_topk_ivf",           // bounded centroid model
    "ann_recall_audit",       // same bounded centroid model + 10-query brute side
    "mrr_knn",                // 10-query broadcast scoring, as sim_topk_brute
    "sim_topk_pq",            // bounded centroid model (subspace codebooks)
    "dedup_semantic",         // bounded centroid model (SemDeDup cells)
    "sketch_stats",           // scalar sketch subqueries
    "sketch_heavy_hitters",   // 1-row threshold frame crossed in
    "sketch_overlap",         // 5-row segment-type frames paired by <
    "shuffle_interleave",     // global-rank offsets over sequence groups
    "dedup_incremental",      // three 1-row stage-summary aggregates crossed
    "token_budget_apportion", // two 1-row scalar frames (total, base_sum) crossed
    "pagerank_3iter",   // 1-row node-count frame crossed per iteration
    "sketch_quantiles", // 1-row stats frame + <=k-row hist/quantile probes
    "hits_2iter",       // 1-row renormalization total crossed per half-step
    "graph_triangles",      // two 1-row census aggregates crossed
    "kcore_peel",           // two 1-row census aggregates crossed
    "time_to_convert",      // 1-row census × 1-row median-pick frame
    "theil_sen_slope",      // date-range-bounded pair join (~730² max) + 1-row frames
    "backlog_timeline",     // 1-row peak/peak-day/census frames crossed
    "rfm_scores",           // 1-row max-ts/user-count frames crossed per rank pass
    "ab_test_proportions",  // two 1-row arm frames crossed
    "embedding_power_iteration", // 1-row count + 1-row w-array + 1-row max frames crossed
    "bh_fdr_tests",         // 1-row family-size/istar frames crossed with the 34-row family
    "permutation_test_halves", // 1-row bounds/observed/tail frames crossed with the day grid
    "xcorr_daily",          // 1-row total/norm frames crossed with the day grid
    "segmented_trend",      // 1-row peak/cp frames (peak joined on |c| = max)
    "yuen_trimmed_t",       // 1-row trim-count frame crossed with the <=50-value frame
    "cramers_v",            // 1-row total frame crossed with the <=6-cell frame
    "max_drawdown",         // 1-row worst/argmax/census frames crossed
    "term_lift_pairs",      // 1-row corpus-doc-count frame crossed
    "bm25_topk",            // 1-row corpus-stats frame (N, total tokens)
    "rrf_fusion",           // 1-row stats frame + global-rank offset frames
    "sample_weighted_pps",  // 1-row total-weight frame
    "source_tv_divergence", // 1-row corpus-token-total frame
    "benford_digit_audit",  // 1-row digit-total frame × 9-row expected table
    "changepoint_cusum",    // 1-row stats/peak frames crossed
    "contrastive_negatives", // 1-row ring-size frame crossed
    "survival_kaplan_meier", // 1-row total frame crossed
    "classifier_lift_deciles", // 1-row totals frame crossed per rank pass
    "graph_modularity",     // 1-row edge-count frame crossed
    "leaderboard_decayed",  // 1-row horizon frame crossed
    "vocab_coverage_curve", // 1-row token-total frame crossed
    "bootstrap_ci_mean",    // 1-row n and CI-fence frames crossed
    "ks_two_sample",        // 1-row totals frame crossed
    "weighted_median",      // 1-row weight-total frame crossed
    "chi2_independence",    // 1-row N/df frame crossed onto <=100 cells
    "vocab_growth_curve",   // 1-row doc-total frame crossed
    "term_burstiness",      // 1-row doc-total frame crossed onto 20 rows
    "acf_daily",            // 1-row totals/denominator frames crossed
    "runs_test",            // 1-row n/median/flips frames crossed
    "mann_kendall_trend",   // 1-row tie/n frames crossed
    "cuped_adjustment",     // 1-row midpoint frame crossed
    "quantile_normalize",   // 1-row pooled-total frame crossed
    "cliffs_delta",         // 1-row totals frame crossed
    "hodges_lehmann",       // <=50x<=50 value-grain cross + 1-row total
    "ndcg_bm25",            // 1-row stats + 1-row idcg frames crossed
    "log_rank_test",        // 1-row at-risk-total + 1-row step-sum frames crossed
    "friedman_test",        // 1-row block-count/statistic frames crossed onto 7 rows
    "did_estimator",        // 1-row calendar-bounds frame crossed
    "jackknife_ratio_ci",   // 1-row totals frame crossed onto the 20-bucket frame
    "simpsons_paradox_audit", // 1-row pooled-sign frame crossed onto <=4 rows
    "page_trend_test",      // 1-row block-count frame crossed
    "rbo_leaderboard",      // 1-row calendar-midpoint frame crossed
    "qte_deciles",          // Quantile rankPicks 1-row/bounded stats frames
    "silhouette_cells",     // bounded centroid model (as sim_topk_ivf)
    "harrell_c_index",      // (dur, death, score) value-grain cell cross, as hodges_lehmann
    "kendall_tau_daily",    // calendar-bounded day-grain pair join (theil_sen class)
    "association_rules",    // 1-row basket-count frame crossed
    "cochran_q",            // two 1-row moment frames (G-side, L-side) crossed
    "jonckheere_terpstra",  // 1-row JT frame × 1-row group-moments frame
    "dsir_reweight")        // 1-row token-totals frame crossed onto the 256-feature model

  /** Data-model columns with single-digit cardinality. A window
    * PARTITION BY drawn ONLY from these caps sort parallelism at the
    * group count no matter how many executors exist — the scale-killer
    * class the round-5 verdict flagged in outlier_mad/window_rank_stats.
    * Those now use the range-partitioned Prefix rank / bounded-heap
    * TopK; this guard keeps the class from coming back.
    */
  private val lowCardCols = Set(
    "l_returnflag", "l_linestatus", "o_orderpriority", "o_orderstatus",
    "event_type", "kind", "g", "type_a", "type_b", "lang", "source")

  /** Windows partitioned by low-card keys over frames BOUNDED BY
    * CONSTRUCTION (not by the fact table), where the per-group sort is
    * over at most a few thousand rows at any corpus size.
    */
  private val boundedLowCardWindow = Set(
    "sketch_overlap",    // merged k-min sketches: pairs x 2k rows, k=256
    "lateral_topk_docs") // pins Catalyst's LATERAL decorrelation, whose
                         // OWN rewrite is the window rank — the query
                         // exists to exercise that SQL surface; the
                         // scale-path twin is topk_native's bounded heap

  test("no window partitioned solely by single-digit-cardinality keys") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!boundedLowCardWindow(name)) {
        val windows = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }
        windows.foreach { w =>
          val partRefs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
          assert(
            partRefs.isEmpty || !partRefs.subsetOf(lowCardCols),
            s"$name plans a window partitioned only by low-cardinality " +
              s"keys $partRefs — its sort runs as |groups| tasks at any " +
              "cluster size; use ext.Prefix ranks or graftnative.TopK " +
              "(or add to boundedLowCardWindow with a justification)")
        }
      }
    }
  }

  test("no cartesian products; NLJ only where operands are bounded") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!boundedNlj(name))
        assert(
          !plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BroadcastNestedLoopJoin — if its operands " +
            "are genuinely bounded, add it to boundedNlj with a justification")
    }
  }
}
