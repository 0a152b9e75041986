package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("scd2History: versions open on change, collapse on re-delivery, current is open-ended") {
    val feed = Seq(
      // user 1: A, A (re-delivered), B, B, A  -> versions A[1,3) B[3,5) A[5,-)
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 3L, 3L, "B"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "A"),
      // user 2: single event -> one current version
      (2L, 6L, 10L, "X")
    ).toDF("user_id", "event_id", "ms", "status")
    val h = Cdc.scd2History(feed, "user_id", Seq("ms", "event_id"), Seq("status"), "ms")
      .select("user_id", "status", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(h == Set(
      (1L, "A", 1L, Some(3L), false),
      (1L, "B", 3L, Some(5L), false),
      (1L, "A", 5L, None, true),
      (2L, "X", 10L, None, true)))
  }

  test("applyUpserts: matched updates, unmatched-base keeps, unmatched-update inserts") {
    val base = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "bal")
    val upd = Seq((2L, 999.0), (3L, 50.0)).toDF("uk", "new_bal")
    val m = Cdc.applyUpserts(base, upd, "k", "uk",
        Seq(("balance", col("bal"), col("new_bal"))))
      .select(col("__key"), col("__op"), col("balance"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(m == Map(
      1L -> ("kept", 100.0),
      2L -> ("updated", 999.0),
      3L -> ("inserted", 50.0)))
  }
}
