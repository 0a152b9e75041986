package graft.io

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  private def contributingFiles(df: org.apache.spark.sql.DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("clustered compaction bounds file count and makes range filters skip files") {
    val base = Files.createTempDirectory("compact").toString
    val o = Tables.orders(spark, sf)

    // simulate incremental ingest debris: 40 tiny scattered files
    o.repartition(40).write.parquet(s"$base/small")
    assert(parquetFiles(s"$base/small").length == 40)

    Compaction.writeClustered(spark.read.parquet(s"$base/small"), s"$base/compacted",
      clusterCols = Seq("o_totalprice"), files = 8)
    assert(parquetFiles(s"$base/compacted").length == 8)
    // lossless
    assert(spark.read.parquet(s"$base/compacted").count() == o.count())

    // a narrow range predicate on the cluster key: with range-clustered
    // files the qualifying rows live in few files; with the scattered
    // layout every file contributes
    val lo = 1000.0
    val hi = 5000.0
    def ranged(path: String) =
      spark.read.parquet(path).filter(col("o_totalprice").between(lo, hi))
    val scattered = contributingFiles(ranged(s"$base/small"))
    val clustered = contributingFiles(ranged(s"$base/compacted"))
    assert(ranged(s"$base/compacted").count() == ranged(s"$base/small").count())
    assert(clustered <= 3, s"clustered layout should confine matches: $clustered files")
    assert(scattered >= 4 * clustered,
      s"range clustering should cut contributing files: $scattered -> $clustered")
  }

  test("maxRecordsPerFile splits oversized partitions without a shuffle") {
    val base = Files.createTempDirectory("compact2").toString
    val o = Tables.orders(spark, sf)
    val n = o.count()
    Compaction.writeClustered(o, s"$base/capped", Seq("o_orderkey"), files = 2,
      maxRecordsPerFile = n / 6)
    // 2 range partitions, each force-split into >=3 files by the cap
    val files = parquetFiles(s"$base/capped").length
    assert(files >= 6, s"expected >= 6 capped files, got $files")
    assert(spark.read.parquet(s"$base/capped").count() == n)
  }
}
