package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming leaderboard's latest snapshot per key must equal the
  * native batch TopKPerKey over the same data, across micro-batch
  * boundaries and a checkpoint restart.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def latestSnapshots(df: org.apache.spark.sql.DataFrame) = {
    val mx = df.groupBy("key").agg(max("version").as("version"))
    df.join(mx, Seq("key", "version"))
      .select("key", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
  }

  private def batchTopK(ev: org.apache.spark.sql.DataFrame, k: Int) = {
    val top = org.apache.spark.sql.graftnative.TopK
      .perKey(ev, Seq("key"), Seq(("score", true), ("id", false)), k)
    // re-derive ranks over the bounded k-per-key result
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("score"), asc("id"))
    top.withColumn("rank", row_number().over(w))
      .select("key", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("latest streamed snapshot equals the batch TopKPerKey, two ordered batches + restart") {
    val in = Files.createTempDirectory("stk_in")
    val ckpt = Files.createTempDirectory("stk_ckpt").toString
    val out = Files.createTempDirectory("stk_out").toString
    val ev = Tables.events(spark, sf)
      .select(
        col("event_type").as("key"),
        col("event_id").as("id"),
        (Tables.dec2(col("value")) * 100).cast("long").as("score"))
      .localCheckpoint(true)
    val cut = ev.agg(expr("percentile_approx(id, 0.5)")).first().getLong(0)
    ev.filter(col("id") <= cut).write.parquet(s"$in/b0.parquet")
    val schema = spark.read.parquet(s"$in/b0.parquet").schema
    def run(): Unit = FileWatch.runAvailableNow(
      StreamingTopK.topK(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/*.parquet").as[StreamingTopK.In], 3)
        .writeStream.format("parquet").option("path", out).outputMode("append"),
      ckpt)
    run()
    // restart from the checkpoint with the second half appended: the
    // leaderboards must merge into carried state, not restart from empty
    ev.filter(col("id") > cut).write.parquet(s"$in/b1.parquet")
    run()
    val snapshots = spark.read.parquet(out)
    assert(latestSnapshots(snapshots) == batchTopK(ev, 3),
      "latest streamed leaderboards differ from batch TopKPerKey")
    // version increases prove per-key state evolved across batches for
    // at least one key (second half must disturb some leaderboard)
    assert(snapshots.groupBy("key").agg(max("version")).filter(col("max(version)") > 1).count() > 0)
  }
}
