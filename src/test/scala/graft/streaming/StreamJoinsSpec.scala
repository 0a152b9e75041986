package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamJoinsSpec extends SparkSpec {

  test("watermarked stream-stream interval join matches the batch range join") {
    val in = Files.createTempDirectory("sj_in")
    val ckpt = Files.createTempDirectory("sj_ckpt").toString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup").drop("event_type")
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    signups.coalesce(1).write.mode("overwrite").parquet(s"$in/signups/p.parquet")
    purchases.coalesce(1).write.mode("overwrite").parquet(s"$in/purchases/p.parquet")
    val schema = spark.read.parquet(s"$in/signups/p.parquet").schema

    val joined = StreamJoins.intervalJoin(
      FileWatch.watchParquetDir(spark, s"$in/signups/*.parquet", schema),
      FileWatch.watchParquetDir(spark, s"$in/purchases/*.parquet", schema),
      key = "user_id",
      leftWatermark = "2 hours",
      rightWatermark = "2 hours",
      intervalSeconds = 3600L)
      .select(col("left.event_id").as("l_id"), col("right.event_id").as("r_id"))
    FileWatch.runAvailableNow(
      joined.writeStream.format("memory").queryName("sj").outputMode("append"),
      ckpt)

    val got = spark.table("sj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = signups.select(col("event_id").as("l_id"), col("user_id"), col("ts").as("lts"))
      .join(
        purchases.select(col("event_id").as("r_id"), col("user_id"), col("ts").as("rts")),
        Seq("user_id"))
      .filter(col("rts") >= col("lts") && col("rts") <= col("lts") + expr("INTERVAL 3600 SECONDS"))
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(expected.nonEmpty, "fixture should produce at least one correlated pair")
    assert(got == expected)
  }
}
