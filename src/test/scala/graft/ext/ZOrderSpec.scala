package graft.ext

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (Morton order)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 3L), (5L, 3L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(a,b): a in even bit positions, b in odd
    assert(got == Seq(0L, 1L, 2L, 3L, 12L, 15L, 27L))
  }

  test("z-ordered layout keeps BOTH dimensions file-skippable") {
    val base = Files.createTempDirectory("zorder").toString
    val o = Tables.orders(spark, sf)
      .withColumn("ka", col("o_custkey") % 256)
      .withColumn("kb", col("o_orderkey") % 256)
    val z = o.withColumn("zval", ZOrder.zValue(col("ka"), col("kb"), 8))

    graft.io.Compaction.writeClustered(z, s"$base/zorder", Seq("zval"), files = 16)
    // single-dimension layout for contrast: clustered by ka only
    graft.io.Compaction.writeClustered(o, s"$base/single", Seq("ka"), files = 16)

    def files(path: String, c: String): Long =
      spark.read.parquet(path)
        .filter(col(c).between(10, 40))
        .select(input_file_name()).distinct().count()

    // ka-band: both layouts skip
    assert(files(s"$base/zorder", "ka") < 16, "zorder should skip on ka")
    assert(files(s"$base/single", "ka") <= 6, "single-col layout is near-perfect on ka")
    // kb-band: only the z-order layout skips; the single-col layout
    // scatters kb across every file
    val zkb = files(s"$base/zorder", "kb")
    val skb = files(s"$base/single", "kb")
    assert(zkb < 16, s"zorder should skip on kb too: $zkb")
    assert(skb == 16, s"single-col layout cannot skip on kb: $skb")
    assert(zkb <= skb / 2, s"zorder kb files $zkb vs single-col $skb")
  }
}
