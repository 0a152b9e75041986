package graft.io

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** ORC source/sink lane: Spark ships the ORC reader/writer in-box and it
  * is the other columnar format a lakehouse ingests alongside Parquet
  * (reference scope is CSV+Parquet — S1/S2; this extends the format
  * matrix the same way JSONL did). The lane must preserve values exactly
  * AND keep the scan-efficiency properties we rely on at 100 TB:
  * predicate pushdown and column pruning both visible in the plan.
  */
class OrcSpec extends SparkSpec {

  test("ORC round-trip is value-exact and pushes filters + prunes columns") {
    val dir = Files.createTempDirectory("orc").toString
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag")
    src.write.mode("overwrite").orc(s"$dir/li_orc")

    val back = spark.read.orc(s"$dir/li_orc")
    // value-exact round trip (full content, order-insensitive)
    val a = src.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)

    // scan efficiency: the filter reaches the ORC scan and the projection
    // prunes to the two referenced columns
    val q = back.filter(col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThan(l_quantity,"),
      s"ORC scan did not push the filter:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:") &&
      !scan.contains("l_returnflag"), s"ORC scan did not prune columns:\n$scan")
    assert(q.count() === src.filter(col("l_quantity") > 40).count())
  }
}
