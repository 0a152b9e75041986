package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("sketch aggregates land within documented error bounds of exact values") {
    val r = RelationalQueries.queries("sketch_stats")(spark, sf).first()
    val li = Tables.lineitem(spark, sf)
    val exactOrders = li.select(countDistinct("l_orderkey")).first().getLong(0)
    val exactParts = li.select(countDistinct("l_partkey")).first().getLong(0)
    // HLL++ default rsd = 5%
    assert(math.abs(r.getLong(0) - exactOrders).toDouble / exactOrders < 0.10)
    assert(math.abs(r.getLong(1) - exactParts).toDouble / exactParts < 0.10)
    // approx_percentile with accuracy 10000 on ~6k rows is near-exact
    val exactP50 = li.selectExpr("percentile(l_extendedprice, 0.5)").first().getDouble(0)
    assert(math.abs(r.getDouble(2) - exactP50) / exactP50 < 0.05)
    assert(r.getDouble(3) > r.getDouble(2)) // p99 > p50
  }
}
