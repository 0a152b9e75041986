package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("bloom pruning preserves join results exactly and sheds probe rows pre-shuffle") {
    // selective build side: only 'P' orders (a few percent of orders)
    val build = Tables.orders(spark, sf).filter(col("o_orderstatus") === "P")
    val probe = Tables.lineitem(spark, sf)
    val nBuild = build.count()
    assert(nBuild > 0)

    val pruned = Skew.bloomPruned(probe, "l_orderkey", build, "o_orderkey", nBuild, 0.01)

    // no false negatives: the pruned-then-joined result is identical
    def joined(p: org.apache.spark.sql.DataFrame) =
      p.join(build, col("l_orderkey") === col("o_orderkey"))
        .agg(
          count(lit(1)).as("n"),
          sum("l_orderkey").cast("long").as("k_sum"))
        .collect()(0)
    val direct = joined(probe)
    val viaBloom = joined(pruned)
    assert(direct == viaBloom)

    // the probe side sheds most non-matching rows at the scan: kept rows
    // are at most (true matches + fpp-bounded false positives)
    val nProbe = probe.count()
    val nKept = pruned.count()
    val nTrue = probe.join(build.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(nKept < nProbe / 2, s"kept $nKept of $nProbe")
    assert(nKept >= nTrue, "bloom must never drop a true match")
    assert(nKept <= nTrue + (nProbe * 0.05).toLong, s"false-positive blowup: $nKept vs $nTrue")
  }
}
