package graft.ext

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("linear interpolation across a multi-day gap") {
    val cells = Seq((1L, 10L, 10L), (1L, 13L, 40L)).toDF("entity", "day", "c")
    val out = TimeSeries
      .gapFillInterpolate(cells)
      .orderBy("day")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(out == Seq((11L, 20.0), (12L, 30.0)))
  }

  test("interpolates from NEAREST neighbors, not span endpoints") {
    val cells = Seq((1L, 0L, 0L), (1L, 2L, 100L), (1L, 3L, 0L), (1L, 5L, 0L))
      .toDF("entity", "day", "c")
    val out = TimeSeries
      .gapFillInterpolate(cells)
      .orderBy("day")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .toSeq
    // day 1 between (0,0) and (2,100) -> 50; day 4 between (3,0) and (5,0) -> 0
    assert(out == Seq((1L, 50.0), (4L, 0.0)))
  }

  test("entities are independent; gap-free entities emit nothing") {
    val cells = Seq(
      (1L, 0L, 5L), (1L, 1L, 7L), // dense — no output
      (2L, 0L, 2L), (2L, 2L, 4L) // one gap at day 1
    ).toDF("entity", "day", "c")
    val out = TimeSeries.gapFillInterpolate(cells).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 2L && out(0).getLong(1) == 1L && out(0).getDouble(2) == 3.0)
  }

  test("single-cell entity emits nothing (no interior span)") {
    val cells = Seq((9L, 42L, 1L)).toDF("entity", "day", "c")
    assert(TimeSeries.gapFillInterpolate(cells).count() == 0L)
  }
}
