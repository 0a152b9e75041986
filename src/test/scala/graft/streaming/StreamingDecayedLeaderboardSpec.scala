package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming halve-and-add leaderboard must equal a batch fold with
  * identical calendar-week weights, across micro-batch boundaries and a
  * checkpoint restart — and the per-key state must stay within its 9-week
  * bound no matter how much history streamed through.
  */
class StreamingDecayedLeaderboardSpec extends SparkSpec {
  import spark.implicits._

  test("streamed snapshots scored at the global horizon equal the batch fold; state bounded") {
    val in = Files.createTempDirectory("sdl_in")
    val ckpt = Files.createTempDirectory("sdl_ckpt").toString
    val out = Files.createTempDirectory("sdl_out").toString
    val ev = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("part"),
        floor(unix_millis(col("l_shipdate").cast("timestamp")) / lit(86400000.0))
          .cast("long").as("day"))
      .localCheckpoint(true)
    val cut = ev.agg(expr("percentile_approx(day, 0.5)")).first().getLong(0)
    // batch 0: the older half; batch 1 (after a restart): the newer half —
    // so the horizon MOVES between batches and carried state must decay
    ev.filter(col("day") <= cut).write.parquet(s"$in/b0.parquet")
    val schema = spark.read.parquet(s"$in/b0.parquet").schema
    def run(): Unit = FileWatch.runAvailableNow(
      StreamingDecayedLeaderboard.weekly(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/*.parquet").as[StreamingDecayedLeaderboard.In])
        .writeStream.format("parquet").option("path", out).outputMode("append"),
      ckpt)
    run()
    ev.filter(col("day") > cut).write.parquet(s"$in/b1.parquet")
    run()

    val changelog = spark.read.parquet(out)
    val horizon = ev.agg(max(expr("day div 7"))).first().getLong(0)
    val got = StreamingDecayedLeaderboard.scoresAt(changelog, horizon)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // batch fold with the SAME calendar-week weights over all events
    val want = ev
      .withColumn("dw", lit(horizon) - expr("day div 7"))
      .withColumn("wt",
        when(col("dw").between(0, 8),
          expr("shiftleft(1L, cast(8 - dw as int))")).otherwise(0L))
      .groupBy("part").agg(sum("wt").cast("long").as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("part")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"streamed leaderboard $got != batch fold $want")

    // bounded-state contract: no snapshot ever carries more than 9 weeks
    val maxWeeks = changelog.groupBy("part", "version").count()
      .agg(max("count")).first().getLong(0)
    assert(maxWeeks <= 9L, s"a snapshot carried $maxWeeks weeks")
    // state evolved across batches for at least one part
    assert(changelog.groupBy("part").agg(max("version").as("v"))
      .filter(col("v") > 1).count() > 0)
  }
}
