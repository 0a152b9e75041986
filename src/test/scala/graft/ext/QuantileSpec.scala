package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Histogram-refinement rank pick vs the direct row_number formulation:
  * identical on every input shape the refinement has to corner —
  * duplicates massing one bucket, constant groups (hi == lo), tiny
  * groups, skew — and across bucket counts (k smaller than, equal to,
  * larger than group size). The randomized cross-check lives in
  * [[graft.props.OperatorProps]].
  */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  private def directMedian(rows: Seq[(String, Double, Long)]) = {
    val df = rows.toDF("g", "x", "k")
    val w = Window.partitionBy("g").orderBy("x", "k")
    df.withColumn("rn", row_number().over(w))
      .join(df.groupBy("g").agg(count(lit(1)).as("n")), "g")
      .filter(col("rn") === shiftright(col("n") + 1, 1))
      .select(col("g"), col("x"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
  }

  private def refined(rows: Seq[(String, Double, Long)], k: Int) =
    Quantile
      .medianPick(rows.toDF("g", "x", "k"), col("g"), col("x"), Seq(col("k")), "g", "med", k)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap

  test("medianPick == row_number median on a seeded mixed fixture (duplicates + spread + skew)") {
    val rnd = new scala.util.Random(20260814)
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 3}"
      // half the mass on 10 duplicate-heavy values (bucket concentration),
      // half spread continuously
      val x = if (rnd.nextBoolean()) rnd.nextInt(10).toDouble
              else rnd.nextDouble() * 2000 - 1000
      (g, x, i.toLong)
    } :+ (("lone", 42.0, 9999L))
    val expect = directMedian(rows)
    assert(refined(rows, 8) == expect, "k=8 (buckets far smaller than groups)")
    assert(refined(rows, 1024) == expect, "k=1024 (buckets exceed group sizes)")
  }

  test("constant group and single-row group") {
    val rows = Seq(("c", 5.0, 1L), ("c", 5.0, 2L), ("c", 5.0, 3L), ("s", 7.5, 4L))
    assert(refined(rows, 1024) == Map("c" -> 5.0, "s" -> 7.5))
  }

  test("rankPicks: three labeled ranks from one histogram, two sharing a bucket") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i => ("g", rnd.nextDouble() * 100, i.toLong))
    val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
    def nearest(num: Int, den: Int) = sorted((200 * num + den - 1) / den - 1)
    val picks = Quantile
      .rankPicks(rows.toDF("g", "x", "k"), col("g"), col("x"), Seq(col("k")),
        Seq(
          "p50" -> (n => ((n * 1 + 1) / 2).cast("long")),
          "p90" -> (n => ((n * 9 + 9) / 10).cast("long")),
          // k=4 buckets of ~50 rows: p90 and p99 provably share the top bucket
          "p99" -> (n => ((n * 99 + 99) / 100).cast("long"))),
        "g", "v", k = 4)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(picks == Map(
      "p50" -> nearest(1, 2), "p90" -> nearest(9, 10), "p99" -> nearest(99, 100)))
  }

  test("arbitrary rank pick: p90 on a known sequence") {
    val rows = (1 to 100).map(i => ("g", i.toDouble, i.toLong))
    val p90 = Quantile
      .rankPick(rows.toDF("g", "x", "k"), col("g"), col("x"), Seq(col("k")),
        n => ceil(n * lit(0.9)).cast("long"), "g", "p90", 16)
      .collect()
    assert(p90.map(r => r.getDouble(1)).toSeq == Seq(90.0))
  }
}
