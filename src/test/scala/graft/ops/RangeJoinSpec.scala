package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join must equal the naive cross+filter formulation on
  * every edge: points at lo (in) and hi (out), intervals inside one
  * bucket, spanning many buckets, overlapping each other, empty, and
  * bucket widths smaller/larger than the intervals.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points
      .crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def banded(points: DataFrame, intervals: DataFrame, w: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", w)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val points = Seq(
    (1L, 0L), (2L, 9L), (3L, 10L), (4L, 15L), (5L, 29L), (6L, 30L), (7L, 100L))
    .toDF("pt_id", "pt")

  private val intervals = Seq(
    (10L, 10L, 30L),  // spans buckets at w=10; [10,30): pts 3,4,5 in, 6 out
    (11L, 0L, 3L),    // inside one bucket; pt 1 in (lo inclusive)
    (12L, 5L, 45L),   // long interval over many buckets
    (13L, 50L, 50L),  // empty — matches nothing
    (14L, 95L, 105L)) // overlaps nothing but pt 7
    .toDF("iv_id", "lo", "hi")

  test("banded equals naive at widths below, at, and above interval sizes") {
    val expected = naive(points, intervals)
    assert(expected.nonEmpty && expected.contains((1L, 11L)) && !expected.exists(_._2 == 13L))
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L))
      assert(banded(points, intervals, w) == expected, s"width $w diverged")
  }

  test("boundary semantics: lo inclusive, hi exclusive, exactly-once matches") {
    val out = RangeJoin
      .pointInInterval(points, "pt", intervals, "lo", "hi", 10L)
      .groupBy("pt_id", "iv_id").count()
      .filter(col("count") > 1)
    assert(out.isEmpty, "a (point, interval) pair must match exactly once")
    val m = banded(points, intervals, 10L)
    assert(m.contains((3L, 10L)), "pt == lo is inside")
    assert(!m.contains((6L, 10L)), "pt == hi is outside")
  }
}
