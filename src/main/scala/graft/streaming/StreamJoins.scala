package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the remaining leg
  * of the streaming surface (stream-static enrichment lives in
  * [[FileWatch.enrich]], stateful sessions in [[StatefulSessions]]).
  *
  * Scale posture: both sides carry a watermark AND the join condition
  * carries an event-time interval bound, so Spark can expire buffered
  * rows once the watermark passes the interval — state per key is bounded
  * by (watermark + interval) x arrival rate, never the stream's history.
  * An unbounded-condition stream-stream join would buffer forever; this
  * module deliberately exposes only the bounded shape.
  */
object StreamJoins {

  /** Correlate two event streams on a key where the right event must
    * occur within [0, intervalSeconds] AFTER the left event — e.g. "click
    * within 10 minutes of the impression". Inner join: emits once both
    * sides arrive; state expires with the watermark.
    *
    * Each input must already contain the named key and a `ts` timestamp
    * column; output columns are prefixed left_/right_.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftWatermark: String,
      rightWatermark: String,
      intervalSeconds: Long): DataFrame = {
    val l = left
      .withWatermark("ts", leftWatermark)
      .select(
        col(key).as("join_key"),
        col("ts").as("left_ts"),
        struct(left.columns.map(col): _*).as("left"))
    val r = right
      .withWatermark("ts", rightWatermark)
      .select(
        col(key).as("r_join_key"),
        col("ts").as("right_ts"),
        struct(right.columns.map(col): _*).as("right"))
    l.join(
      r,
      col("join_key") === col("r_join_key") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $intervalSeconds SECONDS"))
      .drop("r_join_key")
  }
}
