package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed per module; names must match between `queries`
  * and `oracleSql`, and every aggregate column is aliased identically on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      CorpusQueries.queries ++ CdcQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracle ++ RelationalQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ MultimodalQueries.oracle ++
      CorpusQueries.oracle ++ CdcQueries.oracle ++ AnalyticsQueries.oracle
}
