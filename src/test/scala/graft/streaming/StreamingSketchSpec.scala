package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.Sketches
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming face of the count-min sketch: the cell table is a
  * streaming aggregation over (d, b), so the engine's state store holds
  * AT MOST depth*width counters no matter how long the stream runs — the
  * fixed-memory frequency summary, maintained incrementally. The spec
  * drives the SAME [[Sketches.cmsCells]] code through three genuine
  * micro-batches (maxFilesPerTrigger=1) and asserts the final cells are
  * bit-equal to the batch sketch of the full input — the merge property
  * (counters are sums) is what makes CMS streamable at all.
  */
class StreamingSketchSpec extends SparkSpec {

  test("streaming CMS cells across micro-batches == batch CMS of the union") {
    val depth = 3
    val width = 64L
    val in = Files.createTempDirectory("cms_in")
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    val events = Tables.events(spark, sf).select(col("user_id"))
    // three files -> three micro-batches (state must carry across them)
    events.filter(col("user_id") % 3 === 0).coalesce(1).write.parquet(s"$in/a.parquet")
    events.filter(col("user_id") % 3 === 1).coalesce(1).write.parquet(s"$in/b.parquet")
    events.filter(col("user_id") % 3 === 2).coalesce(1).write.parquet(s"$in/c.parquet")
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*.parquet")
    FileWatch.runAvailableNow(
      Sketches.cmsCells(stream, col("user_id"), depth, width)
        .writeStream.format("memory").queryName("cms_cells").outputMode("complete"),
      ckpt)

    val streamed = spark.table("cms_cells").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.cmsCells(events, col("user_id"), depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && streamed == batch)
    // the whole point: state is bounded by the sketch dimensions
    assert(streamed.size <= depth * width)
  }
}
