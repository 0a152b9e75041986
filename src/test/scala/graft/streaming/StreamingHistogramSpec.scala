package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.Sketches
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming face of the fixed-bounds histogram ([[Sketches.histCellsFixed]]):
  * bucket counters are sums, so the cell table is a streaming aggregation
  * whose state is AT MOST k counters no matter how long the stream runs —
  * the same merge property the streaming CMS rides. Cells across genuine
  * micro-batches must be bit-equal to the batch histogram of the union.
  */
class StreamingHistogramSpec extends SparkSpec {

  test("streaming histogram cells across micro-batches == batch cells of the union") {
    val k = 32
    val (mn, mx) = (0.0, 1000.0)
    val in = Files.createTempDirectory("hist_in")
    val ckpt = Files.createTempDirectory("hist_ckpt").toString
    val events = Tables.events(spark, sf).select(col("value"), col("event_id"))
    events.filter(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$in/a.parquet")
    events.filter(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$in/b.parquet")
    events.filter(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$in/c.parquet")
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*.parquet")
    FileWatch.runAvailableNow(
      Sketches.histCellsFixed(stream, col("value"), k, mn, mx)
        .writeStream.format("memory").queryName("hist_cells").outputMode("complete"),
      ckpt)

    val streamed = spark.table("hist_cells").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = Sketches.histCellsFixed(events, col("value"), k, mn, mx).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty && streamed == batch)
    assert(streamed.size <= k)
    // mass conservation: every non-null value landed in exactly one bucket
    assert(streamed.values.sum == events.filter(col("value").isNotNull).count())
  }
}
