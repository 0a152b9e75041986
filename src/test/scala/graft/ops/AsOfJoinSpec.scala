package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), // before any right row -> null
    (1L, 200L, 11L),
    (1L, 300L, 12L), // equal-time right row visible (inclusive)
    (2L, 500L, 13L)  // other key
  ).toDF("user_id", "ms", "event_id")

  private val right = Seq(
    (1L, 150L, 1L, 1.5),
    (1L, 300L, 2L, 3.0), // ties left at 300
    (1L, 300L, 3L, 4.0), // same ts, higher tiebreak wins
    (2L, 400L, 4L, 9.0)
  ).toDF("user_id", "ms", "event_id", "value")

  test("backward as-of: latest right at-or-before left time, per key") {
    val out = AsOfJoin
      .asOfJoin(left, right, Seq("user_id"), "ms", "ms", Seq("value"), "event_id")
      .orderBy("user_id", "ms")
      .select("user_id", "ms", "asof_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, 100L, None),        // nothing at or before 100
      (1L, 200L, Some(1.5)),   // 150
      (1L, 300L, Some(4.0)),   // equal-time tie -> highest tiebreak
      (2L, 500L, Some(9.0))))  // key isolation
  }

  test("left columns survive untouched") {
    val out = AsOfJoin.asOfJoin(left, right, Seq("user_id"), "ms", "ms", Seq("value"), "event_id")
    assert(out.columns.toSeq == Seq("user_id", "ms", "event_id", "asof_value"))
    assert(out.count() == 4)
  }
}
