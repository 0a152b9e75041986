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

  test("JSON/variant lanes: single pruned scan, hash-agg, codegen'd parse") {
    // AQE off for the assertion only: executedPlan then shows the
    // WholeStageCodegen membership (`*(n)` prefixes) directly instead of
    // hiding it behind an unfinalized AdaptiveSparkPlan wrapper. Codegen
    // membership itself does not depend on AQE.
    val conf = spark.conf
    val saved = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("props_variant", "props_typed_map", "props_extract").foreach { name =>
        val p = planOf(name)
        val lines = p.linesIterator.toSeq
        // one scan, pruned to exactly the two referenced columns
        assert(lines.count(_.contains("FileScan")) == 1, s"$name re-scans:\n$p")
        assert(
          p.contains("ReadSchema: struct<value:double,props:string>"),
          s"$name reads more than (value, props):\n$p")
        // hash aggregation, never a sort-based or object-hash fallback
        assert(p.contains("HashAggregate"), s"$name lost its hash agg:\n$p")
        assert(
          !p.contains("SortAggregate") && !p.contains("ObjectHashAggregate"),
          s"$name degraded to a non-hash aggregate:\n$p")
        // every aggregate runs inside whole-stage codegen
        lines.filter(_.contains("HashAggregate")).foreach(l =>
          assert(l.contains("*("), s"$name has an interpreted aggregate: $l"))
      }
      // the parse expressions themselves: variant_get/parse_json and
      // regexp_extract are codegen'd end-to-end. from_json (typed_map)
      // is Spark's own CodegenFallback — that lane exists to pin the
      // TYPED MapType surface; the codegen-hot path for semi-structured
      // work is the variant lane, and this assertion keeps it that way.
      Seq("props_variant" -> "variant_get", "props_extract" -> "regexp_extract")
        .foreach { case (name, expr) =>
          val p = planOf(name)
          p.linesIterator.filter(_.contains(expr)).foreach(l =>
            assert(l.contains("*("), s"$name's $expr fell out of codegen: $l"))
        }
    } finally conf.set("spark.sql.adaptive.enabled", saved)
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
