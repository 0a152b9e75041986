package graft.io

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PartitionedWriteSpec extends SparkSpec {

  test("hive-partitioned writes enable partition pruning at the scan") {
    val out = Files.createTempDirectory("pw").toString + "/orders_part"
    val o = Tables.orders(spark, sf)
    o.write.partitionBy("o_orderstatus").parquet(out)

    // one directory per status value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))

    val filtered = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    assert(filtered.count() == o.filter(col("o_orderstatus") === "F").count())
    // the filter must be a PartitionFilter (pruned directories), not a
    // row-level data filter
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), s"plan:\n$scan")
    // and pruning means only the F partition's files are touched
    def touchedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val readFiles = touchedFiles(spark.read.parquet(out).filter(col("o_orderstatus") === "F"))
    val allFiles = touchedFiles(spark.read.parquet(out))
    assert(readFiles < allFiles, s"expected pruning: $readFiles vs $allFiles files")
  }
}
