package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that must never drift: every registered
  * query has a DuckDB oracle (a missing oracle silently downgrades the
  * driver's check to rows-only), and names stay collision-free across
  * the contributing modules.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  test("module maps contribute unique names (no silent overwrite)") {
    val maps = Seq(
      graft.queries.ReferenceQueries.queries,
      graft.queries.RelationalQueries.queries,
      graft.queries.TextQueries.queries,
      graft.queries.DedupQueries.queries,
      graft.queries.SimilarityQueries.queries,
      graft.queries.MultimodalQueries.queries,
      graft.queries.CorpusQueries.queries,
      graft.queries.CdcQueries.queries,
      graft.queries.AnalyticsQueries.queries)
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    assert(all.size == SparkEntry.queries.size)
  }
}
