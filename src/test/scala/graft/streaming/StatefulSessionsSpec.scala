package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionizer: closed sessions match the batch query") {
    val in = Files.createTempDirectory("ss_in")
    val ckpt = Files.createTempDirectory("ss_ckpt").toString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(s"$in/all.parquet")
    val schema = spark.read.parquet(s"$in/all.parquet").schema

    val sessions = StatefulSessions.sessionize(
      FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema)
        .as[StatefulSessions.Ev],
      gapMs = 1800000L)
    FileWatch.runAvailableNow(
      sessions.writeStream.format("memory").queryName("sessions").outputMode("append"),
      ckpt)

    val emitted = spark.table("sessions")
    // single micro-batch: every session except each user's last (still
    // open in state) is emitted
    val batchTotals = Tables.events(spark, sf)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag("ms", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ms", "event_id")))
      .withColumn("ns", when(col("prev").isNull || col("ms") - col("prev") > 1800000L, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("ns").as("n_sessions"))
    val nUsers = batchTotals.count()
    val totalSessions = batchTotals.agg(sum("n_sessions")).first().getLong(0)
    assert(emitted.count() == totalSessions - nUsers)
    // per-user emitted counts = batch count - 1
    val perUser = emitted.groupBy("user_id").count()
      .join(batchTotals, Seq("user_id"))
      .filter(col("count") =!= col("n_sessions") - 1)
    assert(perUser.count() == 0)
    // session integrity: start <= end, n_events >= 1
    assert(emitted.filter(col("session_start") > col("session_end")).count() == 0)
    assert(emitted.filter(col("n_events") < 1).count() == 0)
  }
}
