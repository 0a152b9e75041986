package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming analogues of the reference's poll-sensor pipeline
  * (SURVEY.md §2A O7/J1): a Structured Streaming file source whose
  * checkpoint IS the seen-set (`google_drive_sensor.py:33-46` keeps it in
  * an Airflow Variable; here Spark's offset log makes the anti-join
  * implicit, exactly-once, and restartable), plus the watermarked
  * event-time aggregation the batch `events_hourly` query mirrors.
  */
object FileWatch {

  /** Watch a directory for new files. Each micro-batch contains ONLY
    * files unseen by the checkpoint — the sensor's `id not in seen`
    * semantics without any driver-side state list.
    */
  def watchCsvDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "64")
      .csv(dir)
      .withColumn("source_file", input_file_name())

  def watchParquetDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Event-time tumbling-window counts with a watermark: late rows beyond
    * the watermark are dropped, state is bounded — the 100 TB-stream
    * posture (no unbounded driver-side seen-lists or state).
    */
  def windowedCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("total_value"))

  /** Streaming exact dedup: exactly-once per id within the watermark
    * horizon — state is bounded by the watermark (old ids age out), the
    * streaming shape of X1 for ingest pipelines.
    */
  def dedupStream(events: DataFrame, idCol: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(idCol, "ts")

  /** Stream-static enrichment join: the static dim is re-read per
    * micro-batch and broadcast when small — the standard pattern for
    * joining a stream against a slowly-changing dimension.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** Drain-everything-then-stop runner (Trigger.AvailableNow): the batch
    * cadence of the reference's 60 s poke loop, but restartable from the
    * checkpoint. Returns after all available input is processed.
    */
  def runAvailableNow[T](writer: DataStreamWriter[T], checkpoint: String): Unit = {
    val q = writer
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
