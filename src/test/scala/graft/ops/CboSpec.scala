package graft.ops

import graft.SparkSpec

/** The statistics/CBO contract: ANALYZE populates catalog stats, the
  * cost-based reorderer consumes them to produce a DIFFERENT (and
  * better-ordered) join tree than the syntactic plan, and the rows are
  * identical either way.
  */
class CboSpec extends SparkSpec {

  test("ANALYZE records row counts and column stats the DP reorder needs") {
    val s2 = spark.newSession()
    CatalogStats.registerAnalyzed(s2, sf)
    val counts = Seq("nation", "supplier", "part", "lineitem")
      .map(t => t -> CatalogStats.rowCountOf(s2, t))
    counts.foreach { case (t, n) =>
      assert(n.exists(_ > 0), s"cbo_$t must carry a positive catalog rowCount, got $n")
    }
    // sanity: the fact table really is the big one (the premise of the demo)
    val byName = counts.toMap
    assert(byName("lineitem").get > byName("part").get * 10)
  }

  test("cost-based reorder changes the deliberately bad join order; rows do not change") {
    val s2 = spark.newSession()
    CatalogStats.registerAnalyzed(s2, sf)

    def joinOrder(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      // leaf relation names in optimized-plan order = the join tree's
      // left-to-right leaf sequence; a reorder shows up as a permutation
      val plan = df.queryExecution.optimizedPlan
      plan.collectLeaves().map(_.toString).map { s =>
        "cbo_(\\w+)".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("?")
      }
    }

    s2.conf.set("spark.sql.cbo.enabled", "false")
    val baseline = s2.sql(CatalogStats.DemoSql)
    val baselineOrder = joinOrder(baseline)
    val baselineRows = baseline.collect().map(_.toString).toSeq

    val cbo = CatalogStats.demoJoin(s2) // sets cbo+joinReorder on s2
    val cboOrder = joinOrder(cbo)
    val cboRows = cbo.collect().map(_.toString).toSeq

    assert(baselineRows.nonEmpty && baselineRows == cboRows,
      "CBO must be plan-only: identical rows")
    assert(baselineOrder != cboOrder,
      s"cost-based reorder should change the join order; both were $baselineOrder")
    // Textually nation joins LAST — every fact row is carried through the
    // whole pipeline before touching it. The stats DP starts from the
    // cheap dim⋈dim pair instead (observed: supplier⋈nation, then fact,
    // then filtered part), so nation must precede the fact table in the
    // reordered tree. (Asserting the FULL chosen order would pin the
    // optimizer's DP tie-breaks, not our contract.)
    assert(cboOrder.indexOf("nation") < cboOrder.indexOf("lineitem"),
      s"nation (textually last) should join before the fact table, got $cboOrder")
  }
}
