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
    "sim_topk_ivf",           // bounded centroid model
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
    "hits_2iter")       // 1-row renormalization total crossed per half-step

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
