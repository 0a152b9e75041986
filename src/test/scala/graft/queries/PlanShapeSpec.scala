package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Positive plan-shape assertions for the Catalyst rewrite families the
  * round-4 TPC-H analogues were added to exercise: the point of those
  * queries is that the optimizer picks a specific physical strategy, so
  * lock the strategy — a regression that silently degrades one of these
  * to a generic (or worse, unbounded) plan fails here with the plan
  * printed, before any benchmark notices.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q16 NOT IN plans a null-aware anti join, not a cross/NLJ fallback") {
    val p = planOf("q16_supplier_census")
    // Spark plans empty/null-safe NOT IN as a BroadcastHashJoin LeftAnti
    // whose trailing boolean operand (isNullAwareAntiJoin) prints `true`
    assert(
      "LeftAnti, BuildRight, true".r.findFirstIn(p).isDefined,
      s"q16 lost the null-aware anti join:\n$p")
  }

  test("q21 plans one left-semi and one left-anti join on the fact table") {
    val p = planOf("q21_waiting_suppliers")
    assert(p.contains("LeftSemi"), s"q21 lost its EXISTS semi join:\n$p")
    assert(p.contains("LeftAnti"), s"q21 lost its NOT EXISTS anti join:\n$p")
  }

  test("q7's dual-role nation dims broadcast as two separate builds") {
    val p = planOf("q7_volume_shipping")
    // both nation roles must broadcast (at sf0.001 AQE legitimately
    // broadcasts the small fact sides too, so no shuffle-join assertion
    // here — PlanHealthSpec still guards against cartesians)
    assert(p.contains("sn_key") && p.contains("cn_key"), s"q7 lost a nation role:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q7 dims stopped broadcasting:\n$p")
  }

  test("q4/q20 EXISTS/IN chains stay semi joins") {
    val p4 = planOf("q4_order_priority")
    assert(p4.contains("LeftSemi"), s"q4 lost its EXISTS semi join:\n$p4")
    val p20 = planOf("q20_excess_suppliers")
    assert(p20.contains("LeftSemi"), s"q20 lost its IN-chain semi joins:\n$p20")
  }

  test("q17/q2 correlated scalar subqueries de-correlate to aggregate+join") {
    Seq("q17_correlated_min", "q2_min_cost_supplier").foreach { name =>
      val p = planOf(name)
      // a de-correlation failure would surface as a per-row subquery
      // (no join) or a nested-loop re-scan; the rewritten form is an
      // aggregate feeding an equi-join
      assert(
        p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
          p.contains("ShuffledHashJoin"),
        s"$name did not de-correlate to an equi-join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name re-scans per row:\n$p")
    }
  }

  test("q6 pushes every predicate into the parquet scan") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(
      scan.contains("l_shipdate") && scan.contains("l_discount") &&
        scan.contains("l_quantity"),
      s"q6 predicates not reaching the scan: $scan")
  }
}
