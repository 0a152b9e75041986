package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("KMV sketch estimates land within ~3/sqrt(k) of exact distinct counts") {
    val r = RelationalQueries.queries("sketch_stats")(spark, sf).first()
    val ordersKmv = r.getAs[Double]("orders_kmv")
    val partsKmv = r.getAs[Double]("parts_kmv")
    val ordersExact = r.getAs[Long]("orders_exact")
    val partsExact = r.getAs[Long]("parts_exact")
    // KMV standard error is ~1/sqrt(k-2) (k=1024 -> ~3.1%); allow 3 sigma.
    // Below k distinct values the sketch is exact by construction.
    val tol = 3.0 / math.sqrt(1022.0)
    assert(math.abs(ordersKmv - ordersExact) / ordersExact < tol,
      s"orders KMV $ordersKmv vs exact $ordersExact")
    if (partsExact < 1024) assert(partsKmv == partsExact.toDouble)
    else assert(math.abs(partsKmv - partsExact) / partsExact < tol)
  }

  test("histogram quantile sketch: est within one bucket width of exact; cum sane") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val est = graft.ext.Sketches
      .histQuantiles(li, col("l_extendedprice"), 64, qs)
      .collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est"))
      .toMap
    val stats = li
      .agg(min("l_extendedprice"), max("l_extendedprice"), count(lit(1)))
      .first()
    val bucketWidth = (stats.getDouble(1) - stats.getDouble(0)) / 64.0
    val exact = li
      .selectExpr(s"percentile(l_extendedprice, array(${qs.mkString(",")}))")
      .first()
      .getSeq[Double](0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(
        math.abs(est(q) - ex) <= bucketWidth + 1e-9,
        s"q=$q est=${est(q)} exact=$ex width=$bucketWidth")
    }
    // estimates are monotone in q
    val ordered = qs.map(est)
    assert(ordered == ordered.sorted)
  }

  test("Spark-native sketches (HLL++, KLL percentile) land within documented error bounds") {
    val li = Tables.lineitem(spark, sf)
    val r = li
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)").as("price_q"))
      .first()
    val exactOrders = li.select(countDistinct("l_orderkey")).first().getLong(0)
    // HLL++ default rsd = 5%
    assert(math.abs(r.getLong(0) - exactOrders).toDouble / exactOrders < 0.10)
    val exactP50 = li.selectExpr("percentile(l_extendedprice, 0.5)").first().getDouble(0)
    val qs = r.getSeq[Double](1)
    assert(math.abs(qs(0) - exactP50) / exactP50 < 0.05)
    assert(qs(1) > qs(0)) // p99 > p50
  }
}
