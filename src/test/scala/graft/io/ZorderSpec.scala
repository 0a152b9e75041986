package graft.io

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Z-order OPTIMIZE: Morton-code correctness, content preservation across
  * the rewrite, and — the point of the feature — strictly better file
  * skipping than a scattered layout for a multi-dimensional box predicate.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: bit i of dim j lands at i*d + j") {
    // (x, y, expected morton) hand-computed for bits = 2, d = 2:
    // z = x0 + 2*y0 + 4*x1 + 8*y1
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (2L, 1L, 6L), (3L, 3L, 15L), (2L, 2L, 12L))
    val got = cases.toDF("x", "y", "want")
      .withColumn("z", Compaction.zValue(Seq(col("x"), col("y")), 2))
      .select("z", "want").as[(Long, Long)].collect()
    got.foreach { case (z, want) => assert(z == want, s"z=$z want=$want") }
  }

  test("quantize maps [lo, hi] onto [0, 2^bits) with hi clamped to the top cell") {
    val got = Seq(0L, 500L, 999L, 1000L).toDF("v")
      .withColumn("q", Compaction.quantize(col("v"), 0L, 1000L, 4))
      .select("q").as[Long].collect().toSeq
    assert(got.head == 0L && got.last == 15L)
    assert(got.forall(q => q >= 0L && q <= 15L))
  }

  test("optimizeZorder preserves contents and beats a scattered layout at file skipping") {
    val dir = Files.createTempDirectory("snap_zorder").toString
    // 64x64 grid, hash-shuffled so the scattered layout's files all span
    // the full domain (every file useless to prune on any box)
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        md5(col("id").cast("string")).as("payload"))
      .repartition(16, md5(concat(col("x"), lit(":"), col("y"))))
    val v0 = Snapshots.commitVersionWithStats(spark, grid, dir, Seq("x", "y"))
    val v1 = Snapshots.optimizeZorder(spark, dir, Seq("x", "y"), files = 16, bits = 6)

    // contents identical as a multiset across the rewrite
    val before = Snapshots.readVersion(spark, dir, v0)
    val after = Snapshots.readVersion(spark, dir, v1)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)

    // a 16x16 box (1/16 of the domain): pruned read agrees with the full
    // filter, and the z-layout touches strictly fewer files
    val bounds = Map("x" -> ((8L: Any), (23L: Any)), "y" -> ((8L: Any), (23L: Any)))
    val pred = col("x").between(8, 23) && col("y").between(8, 23)
    val want = before.filter(pred).count()
    assert(Snapshots.readVersionPruned(spark, dir, v1, bounds).filter(pred).count() == want)

    // files touched = distinct input files of the pruned scan itself
    def survivors(v: Long): Long =
      Snapshots.readVersionPruned(spark, dir, v, bounds)
        .select(input_file_name()).distinct().count()
    val scatteredFiles = survivors(v0)
    val zFiles = survivors(v1)
    assert(scatteredFiles == 16L, s"scattered layout should keep all 16 files, kept $scatteredFiles")
    assert(zFiles < scatteredFiles, s"z-order kept $zFiles of $scatteredFiles")
  }
}
