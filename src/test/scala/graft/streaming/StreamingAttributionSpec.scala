package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The streaming attribution must equal the batch window formulation when
  * micro-batches respect event time, and must carry its one-touch-per-user
  * state across a checkpoint restart.
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def batchAttribution(ev: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn(
        "channel",
        coalesce(
          last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
            .over(w),
          lit("organic")))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("channel"), col("cents"))
  }

  test("ordered micro-batches reproduce the batch window attribution exactly") {
    val in = Files.createTempDirectory("sa_in")
    val ckpt = Files.createTempDirectory("sa_ckpt").toString
    val ev = Tables.events(spark, sf)
      .select(
        col("user_id"),
        unix_millis(col("ts")).as("ms"),
        col("event_id"),
        col("event_type"),
        (Tables.dec2(col("value")) * 100).cast("long").as("cents"))
      .localCheckpoint(true)
    // time-split the input into two files so AvailableNow with
    // maxFilesPerTrigger=1 processes two EVENT-TIME-ORDERED micro-batches
    // (oldest modification time first); purchases in the second half must
    // attribute to touches the state carried from the first
    val cut = ev.agg(expr("percentile_approx(ms, 0.5)")).first().getLong(0)
    ev.filter(col("ms") <= cut).coalesce(1).write.parquet(s"$in/b0.parquet")
    ev.filter(col("ms") > cut).coalesce(1).write.parquet(s"$in/b1.parquet")
    new java.io.File(s"$in/b0.parquet").listFiles().foreach(_.setLastModified(1000000L))
    new java.io.File(s"$in/b1.parquet").listFiles().foreach(_.setLastModified(2000000L))
    val schema = spark.read.parquet(s"$in/b0.parquet").schema

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*.parquet")
      .as[StreamingAttribution.Ev]
    FileWatch.runAvailableNow(
      StreamingAttribution.attribute(stream)
        .writeStream.format("memory").queryName("attrib").outputMode("append"),
      ckpt)

    val got = spark.table("attrib")
    val want = batchAttribution(ev)
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "streamed attribution differs from the batch window formulation")
    // the cross-batch case is non-vacuous: some second-half purchase's
    // crediting touch happened in the first half
    val crossed = want
      .join(ev.filter(col("ms") > cut).select(col("event_id")), Seq("event_id"), "left_semi")
      .filter(col("channel") =!= "organic")
    assert(crossed.count() > 0, "fixture produced no cross-batch attribution")
  }

  test("checkpoint restart: later purchases attribute to pre-restart touches") {
    val in = Files.createTempDirectory("sa2_in")
    val ckpt = Files.createTempDirectory("sa2_ckpt").toString
    val out = Files.createTempDirectory("sa2_out").toString
    val first = Seq(
      StreamingAttribution.Ev(1L, 1000L, 1L, "click", 0L),
      StreamingAttribution.Ev(2L, 1500L, 2L, "view", 0L)).toDS()
    first.write.parquet(s"$in/b0.parquet")
    val schema = spark.read.parquet(s"$in/b0.parquet").schema
    // parquet sink: the memory sink refuses checkpoint recovery, and the
    // restart path is exactly what this case exists to prove
    def run(): Unit = FileWatch.runAvailableNow(
      StreamingAttribution.attribute(
        spark.readStream.schema(schema).parquet(s"$in/*.parquet")
          .as[StreamingAttribution.Ev])
        .writeStream.format("parquet").option("path", out).outputMode("append"),
      ckpt)
    run()
    assert(spark.read.parquet(out).count() == 0) // touches only, no purchases yet
    Seq(
      StreamingAttribution.Ev(1L, 2000L, 3L, "purchase", 700L),
      StreamingAttribution.Ev(3L, 2100L, 4L, "purchase", 900L)).toDS()
      .write.parquet(s"$in/b1.parquet")
    run() // restart from the same checkpoint — state must have survived
    val rows = spark.read.parquet(out)
      .select("user_id", "channel", "cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((1L, "click", 700L), (3L, "organic", 900L)))
  }
}
