package graft.io

import graft.{SparkSpec, Tables}
import graft.ext.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class BucketingSpec extends SparkSpec {

  test("bucketed-on-key join plans with zero shuffle exchanges") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    // defensive cleanup: drop catalog entries AND any orphaned location
    // (a previous run's session may have used a different warehouse dir)
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val n = joined.count()
      assert(n == Tables.lineitem(spark, sf).count()) // every lineitem matches an order
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted aggregation equals direct aggregation exactly") {
    val l = Tables.lineitem(spark, sf)
    val direct = l
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).as("total"))
      .orderBy("l_returnflag")
      .collect()
      .toSeq
    val salted = Skew
      .saltedAgg(l, Seq("l_returnflag"), col("l_quantity").cast(DecimalType(12, 2)), 8)
      .orderBy("l_returnflag")
      .collect()
      .toSeq
    assert(salted == direct)
  }
}
