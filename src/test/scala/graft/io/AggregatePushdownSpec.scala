package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Parquet aggregate pushdown: COUNT/MIN/MAX over a parquet table can be
  * answered from row-group footer STATISTICS without decoding a single
  * data page — at 100 TB that is the difference between a metadata walk
  * and a full scan for the "how big is this table / what is its key
  * range" queries every pipeline issues constantly. Requires the V2
  * parquet path plus the pushdown flag; the spec asserts the plan shows
  * PushedAggregation AND that the pushed answer equals the full-scan
  * answer.
  */
class AggregatePushdownSpec extends SparkSpec {

  test("COUNT/MIN/MAX are answered from parquet footers on the V2 path") {
    val conf = spark.conf
    val savedV1 = conf.get("spark.sql.sources.useV1SourceList")
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    conf.set("spark.sql.sources.useV1SourceList", "") // parquet via DS v2
    try {
      val q = spark.read.parquet(s"$sf/orders.parquet")
        .agg(
          count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate was not pushed to the parquet scan:\n$plan")
      assert(plan.contains("MIN(o_orderkey)") && plan.contains("MAX(o_orderkey)"),
        s"min/max not pushed:\n$plan")

      val pushed = q.collect().head
      // ground truth via the default (V1, unpushed) path
      conf.set("spark.sql.sources.useV1SourceList", savedV1)
      val full = spark.read.parquet(s"$sf/orders.parquet")
        .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"))
        .collect().head
      assert(pushed == full, s"pushed=$pushed full=$full")
    } finally {
      conf.set("spark.sql.sources.useV1SourceList", savedV1)
      conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }
}
