package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The replay-determinism contract, tested directly: representative
  * queries from every family must produce IDENTICAL rows under different
  * shuffle-partition counts (different partitionings, different
  * reduction orders, different AQE decisions). This holds because every
  * double that crosses an aggregation goes through exact decimals and
  * every hash is content-derived — the properties the DuckDB oracle
  * relies on.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q1_pricing_summary",    // decimal-exact aggregation
    "dedup_exact",           // content-hash window
    "dedup_minhash_lsh",     // portable hash family + band join
    "pack_sequences",        // distributed prefix sum (split count = shuffle partitions)
    "order_deciles",         // distributed exact rank + ntile arithmetic
    "shuffle_interleave",    // hash-ordered global rank over packed sequences
    "percentiles_exact_rank", // rank-targeted order statistics
    "events_range_join",     // banded interval equi-join
    "sample_temperature",    // sqrt-rate mixing (IEEE determinism)
    "chunk_sliding_window",  // explode+slice chunker, md5 fingerprints
    "dedup_incremental",     // key-state anti-join summary
    "grouping_sets_orders",  // grouping_id bitmask + decimal sums
    "corpus_curation_funnel", // flag algebra + two windows
    "corr_qty_price",        // double assembly from exact sums
    "sim_topk_ivf",          // trained centroids + top-k
    "sim_topk_pq",           // keyed-kmeans codebooks + integer ADC
    "sketch_overlap",        // KMV k-mins via native TopKPerKey heaps
    "dedup_semantic",        // SemDeDup cells + in-cell threshold
    "text_boilerplate_ngrams", // df-threshold semi-join + left join zero-fill
    "text_lm_score",         // checkpointed bigram relation feeding two branches
    "q21_waiting_suppliers", // EXISTS + NOT EXISTS same-table anti/semi pair
    "q8_market_share",       // conditional decimal share + final IEEE division
    "events_session_window", // native session merge in the aggregation operator
    "pagerank_3iter",        // integer fixed-point iteration (order-free sums)
    "shard_balanced",        // global prefix rank -> serpentine assignment
    "ts_gapfill_interp",     // ignoreNulls neighbor windows + one division
    "sketch_quantiles",      // bucket counts + interpolation doubles
    "mode_fill_typed_agg",   // object-hash Aggregator map merges (commutative)
    "outlier_mad",           // sharded Prefix rank median picks (r6 rewrite)
    "window_rank_stats",     // rank-arithmetic percent_rank/cume_dist (r6 rewrite)
    "hits_2iter",            // fixed-point HITS + native TopK per kind
    "graph_triangles",       // degree-oriented wedge closure (count is order-free)
    "bm25_topk",             // integer-micros rational-idf scoring
    "sample_weighted_pps",   // Prefix running weight sum -> integer pick multiplicity
    "source_tv_divergence",  // integer-micros TV distance per source
    "rrf_fusion",            // two Prefix global ranks fused by integer RRF
    "nucleus_select",        // source-sharded running sum -> integer top-p cut
    "ewma_user",             // sorted-list fold on integer cents
    "item_item_jaccard",     // integer-micros Jaccard over basket co-occurrence
    "skyline_pareto",        // Prefix exclusive running max dominance sweep
    "winsorize_audit",       // Quantile rank-pick fences + clipped integer sums
    "kcore_peel",            // iterative semi-join peeling (checkpointed rounds)
    "attribution_last_touch", // ignoreNulls last over strictly-preceding frame
    "link_predict_jaccard",  // pruned-graph wedge counts + anti-join
    "time_to_convert",       // global median pick over conversion deltas
    "inverted_index",        // TakeOrdered term cut + native TopK postings head
    "embedding_quantize_audit", // fixed-association IEEE quantize, integer-micros error sums
    "bfs_3hop",              // frontier joins + checkpointed visited set
    "anomaly_seasonal",      // exact-integer cross-multiplied 3-sigma test
    "theil_sen_slope",       // bounded pair frame + exact median pick
    "event_paths_top",       // per-user double-lead path trigrams
    "backlog_timeline",      // Prefix running sum over open/close deltas
    "rfm_scores",            // three Prefix NTILE-from-rank passes
    "seasonal_naive_backtest", // day-grain self-join, integer MAE
    "gini_split_scores",     // rational impurity, IEEE-identical rendering
    "knn_label_eval",        // double TopK: 5-NN cut + majority vote
    "ab_test_proportions",   // cross-multiplied exact z-test verdict
    "max_drawdown",          // Prefix running max over the daily level series
    "attribution_linear",    // integer credit split with remainder conservation
    "graph_assortativity",   // exact int64/decimal sums + one double division
    "term_lift_pairs",       // bounded-vocab pair lift in integer micros
    "gini_user_revenue",     // Prefix rank-weighted exact Lorenz sum
    "conversion_rate_7d",    // bounded-window conversion census
    "changepoint_cusum",     // Prefix running sum of n-scaled deviations
    "contrastive_negatives", // Prefix hash-ring rank + modular draw
    "survival_kaplan_meier", // Prefix suffix-sum + sequential HOF fold
    "minhash_calibration",   // LSH candidates + exact-Jaccard join census
    "classifier_lift_deciles", // Prefix NTILE deciles over a scored rank
    "embedding_centroid_drift", // micros-quantized integer vector sums
    "scd2_asof_lookup",      // window-derived versions + range-residual join
    "graph_modularity",      // edge joins + decimal cross-multiply
    "topk_stability_audit",  // two TakeOrdered cuts + bounded rank frames
    "leaderboard_decayed",   // integer half-life weights + TakeOrdered cut
    "ols_trend_exact",       // exact integer moments, pinned double render
    "vocab_coverage_curve",  // Prefix rank + running sum over the vocab
    "roc_auc_exact",         // Prefix running sum over the score frame
    "classifier_prf",        // tiny-frame joins of one checkpointed census
    "bootstrap_ci_mean",     // hash picks + two Prefix ranks + fence picks
    "source_profile_cosine", // bounded self-join + TakeOrdered cut
    "ks_two_sample",         // two Prefix CDF passes + TakeOrdered argmax
    "clustering_coefficient", // oriented wedge joins + exploded corners
    "weighted_median",       // Prefix weight CDF + conditional-min picks
    "spearman_daily",        // two Prefix rank passes, integer rho
    "basket_triples",        // chained self-joins + TakeOrdered cut
    "vocab_growth_curve",    // Prefix doc ranks + first-rank reduction
    "term_burstiness",       // TakeOrdered vocab cut + integer VMR
    "acf_daily",             // n-scaled integer devs + calendar lag joins
    "runs_test",             // two Prefix ranks + rank-adjacency flips
    "mann_kendall_trend",    // bounded pair join + exact tie correction
    "cuped_adjustment",      // exact moments, pinned double renders
    "ltv_cumulative",        // cohort-sharded Prefix running sum
    "dedup_keep_best",       // closure + native k=1 TopK argmax
    "quantile_normalize",    // sharded + global Prefix ranks, rank join
    "ann_recall_audit",      // trained IVF vs brute TopK membership
    "kruskal_wallis",        // pooled Prefix ranks, pinned-order H fold
    "zipf_slope_bucketed",   // Prefix rank + bit-length buckets + OLS
    "attribution_ushape",    // windowed first/last/counts, exact floors
    "cliffs_delta",          // Prefix CDF pass + decimal38 pair counts
    "hodges_lehmann",        // bounded value cross + weighted median pick
    "wilcoxon_signed_rank",  // lag join + Prefix |d| ranks, exact z2
    "ndcg_bm25",             // TakeOrdered cut + two 20-row rank passes
    "mrr_knn",               // TopK cut + bounded rank + label joins
    "reach_7d",              // window-day explosion + distinct + aggs
    "dedup_substrings",      // hash-candidate + exact-gram df + coverage anti-join
    "anova_oneway",          // one agg row, pinned-order F chain
    "kendall_tau_daily",     // bounded day cross, exact pair counts
    "association_rules",     // directed lift/conf + total-order cut
    "calibration_bins",      // <=10-bin agg, integer floors
    "dedup_containment",     // shingle equi-join + min-side floor div
    "ngram_novelty",         // shingle min-agg first-seen + decile census
    "levene_brown_forsythe", // rankPicks medians + shared F fold
    "trend_test_armitage",   // exact moments, pinned-double z2
    "embedding_power_iteration", // two integer Krylov steps, 64-group aggs
    "bh_fdr_tests",          // 34-test family, micros rank + baked ladder
    "permutation_test_halves", // hash-ranked relabels, exact arm sums
    "xcorr_daily",           // n-scaled integer deviations, five lag joins
    "segmented_trend",       // cusum argmax + per-side exact OLS moments
    "yuen_trimmed_t",        // tie-aware trim counts over two Prefix CDFs
    "dedup_quality_shift",   // closure + argmax join + decile census
    "cramers_v",             // floored cell contribs + one pinned sqrt
    "corr_matrix",           // one 15-moment agg, six pair projections
    "rolling_median_7d",     // window explode + sorted-array rank pick
    "log_rank_test",         // two Prefix at-risk passes, floored step contribs
    "friedman_test",         // per-block sorted-array ranks, exact rational
    "did_estimator",         // exact cents moments, pinned double chain
    "partial_correlation",   // one 10-moment agg, pinned sqrt renders
    "jackknife_ratio_ci",    // bucket-sorted pinned fold over leave-one-out ratios
    "simpsons_paradox_audit", // exact cross-multiplied stratum signs
    "capture_recapture_audit", // portable-hash captures, integer Chapman
    "page_trend_test",       // shared weekday block ranks, exact L rational
    "tukey_hsd",             // exact moments, pinned HSD double chain
    "qte_deciles",           // per-arm rankPicks decile value picks
    "rbo_leaderboard",       // two TakeOrdered rank frames, baked weights
    "silhouette_cells",      // trained centroids, micros-floored s per vector
    "harrell_c_index",       // bounded cell-pair join, decimal38 weights
    "lakehouse_compact_read", // bin-pack OPTIMIZE: DV-rebased packed read
    "lakehouse_rename_read") // column mapping: physical->logical across 3 segments

  test("query results are identical across shuffle-partition counts") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    // Sorted compare: the determinism contract is MULTISET equality —
    // the same rows regardless of partitioning — matching the driver's
    // oracle gate, which also sorts before hashing. Row ORDER is not
    // promised by unsorted-output operators (e.g. contrastive_negatives
    // emits 4n pairs and a global sort would be pure spec-convenience
    // cost at scale); rank/topk queries carry their order in columns, so
    // sorting loses no signal there either.
    def run(name: String, parts: String): Seq[String] = {
      conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
    }
    try {
      names.foreach { n =>
        val a = run(n, "3")
        val b = run(n, "17")
        assert(a == b, s"$n differs between 3 and 17 shuffle partitions")
        assert(a.nonEmpty, s"$n returned no rows")
      }
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }
}
