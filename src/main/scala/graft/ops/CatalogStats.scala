package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistics/CBO lane: catalog-registered tables + ANALYZE-computed
  * statistics feeding Spark's cost-based optimizer — the one Catalyst
  * subsystem the DataFrame-over-parquet query set cannot exercise,
  * because CostBasedJoinReorder only fires when every join input carries
  * catalog row counts (a bare parquet relation only has sizeInBytes).
  *
  * At 100 TB this is not a demo nicety: a 4-way join written in the
  * "wrong" textual order is the difference between shipping a fact-x-fact
  * intermediate through the shuffle and joining selective dimensions
  * first. ANALYZE cost is one scan per table (row count) plus one
  * aggregation per analyzed column (NDV/min/max) — amortized over every
  * subsequent plan, exactly how warehouse deployments run it.
  *
  * All registration happens in a CHILD session ([[SparkSession.newSession]]
  * shares the SparkContext but isolates SQLConf), so enabling
  * `spark.sql.cbo.*` never leaks into the sibling queries of a Verify or
  * Bench run. Tables are EXTERNAL (`USING parquet LOCATION ...`): the
  * in-memory catalog holds metadata + stats only, no data is copied and
  * nothing is written to a warehouse directory.
  */
object CatalogStats {

  /** Tables the CBO demo joins, smallest to largest. */
  private val TableNames = Seq("nation", "supplier", "part", "lineitem")

  /** Register the four join tables as external catalog tables in `s`'s
    * catalog and ANALYZE them (row counts + join/filter column stats).
    * Idempotent per session; cheap to re-run (DROP + CREATE is metadata
    * only, ANALYZE re-scans).
    */
  def registerAnalyzed(s: SparkSession, dir: String): Unit = {
    val cols = Map(
      "nation" -> "n_nationkey, n_name",
      "supplier" -> "s_suppkey, s_nationkey",
      // p_size carries min/max into FilterEstimation: a range predicate
      // on it gets a real selectivity estimate (LIKE would get none),
      // which is what makes the reorder decision stats-driven
      "part" -> "p_partkey, p_size",
      "lineitem" -> "l_orderkey, l_partkey, l_suppkey")
    TableNames.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS cbo_$t")
      s.sql(s"CREATE TABLE cbo_$t USING parquet LOCATION '$dir/$t.parquet'")
      // ONE ANALYZE per table (r10, guide §1.2 "don't compute things you
      // throw away"): AnalyzeColumnCommand computes the table-level
      // rowCount + sizeInBytes in the SAME aggregation pass as the column
      // NDV/min/max and writes all of them to the catalog, so a separate
      // `COMPUTE STATISTICS` first is a redundant full scan per table —
      // four scans (one of them lineitem) dropped from every invocation.
      // CBO sees identical statistics either way (rowCountOf still
      // returns Some(n); the demo join's reorder decision is unchanged —
      // oracle-verified).
      s.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR COLUMNS ${cols(t)}")
    }
  }

  /** Catalog row count recorded for `cbo_<table>` (None if un-analyzed) —
    * the statistic CostBasedJoinReorder keys its DP search on.
    */
  def rowCountOf(s: SparkSession, table: String): Option[BigInt] = {
    val id = org.apache.spark.sql.catalyst.TableIdentifier(
      s"cbo_$table", Some("default"))
    s.sessionState.catalog.getTableMetadata(id).stats.flatMap(_.rowCount)
  }

  /** The q9-shaped demo join, written in a DELIBERATELY bad textual order:
    * the unselective supplier⋈lineitem join comes first and the part join
    * — whose `p_size <= 5` range filter is the one stats-estimable
    * reducer — comes last. Catalyst's syntactic ReorderJoin keeps a fully
    * conditioned textual order as written; only CostBasedJoinReorder
    * (stats DP over the join graph) moves the filtered part join earlier.
    * Money sum follows the round-to-scale-2 contract of
    * [[graft.Tables.dmsum]].
    */
  val DemoSql: String =
    """SELECT n_name AS nation, COUNT(1) AS n_items,
      |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
      |FROM cbo_supplier
      |JOIN cbo_lineitem ON l_suppkey = s_suppkey
      |JOIN cbo_part ON p_partkey = l_partkey
      |JOIN cbo_nation ON n_nationkey = s_nationkey
      |WHERE p_size <= 5
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Run the demo join under full CBO (stats must already be registered
    * via [[registerAnalyzed]]). Returns the DataFrame bound to the child
    * session, so executing it later still plans with these settings.
    */
  def demoJoin(s: SparkSession): DataFrame = {
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.sql(DemoSql)
  }
}
