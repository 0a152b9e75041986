package graft.streaming

import graft.SparkSpec
import graft.Tables
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

class FileWatchSpec extends SparkSpec {

  private def copyEvents(dst: Path, name: String, filterMod: Int): Unit = {
    val ev = Tables.events(spark, sf).filter(col("event_id") % 2 === filterMod)
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dst/$name")
  }

  test("file-source checkpoint acts as the seen-set across restarts") {
    val in = Files.createTempDirectory("fw_in")
    val ckpt = Files.createTempDirectory("fw_ckpt").toString
    val outDir = Files.createTempDirectory("fw_out").toString

    // batch 1: only the first file exists
    val ev = Tables.events(spark, sf)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f1.parquet")
    val schema = spark.read.parquet(s"$in/f1.parquet").schema
    val stream1 = FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema)
    FileWatch.runAvailableNow(
      stream1.writeStream.format("parquet").option("path", outDir), ckpt)
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == ev.filter(col("event_id") % 2 === 0).count())

    // batch 2: add a second file, restart from the same checkpoint —
    // ONLY the new file is processed (anti-join via offset log)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f2.parquet")
    val stream2 = FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema)
    FileWatch.runAvailableNow(
      stream2.writeStream.format("parquet").option("path", outDir), ckpt)
    val n2 = spark.read.parquet(outDir).count()
    assert(n2 == ev.count()) // f1 NOT reprocessed
  }

  test("windowed streaming counts equal the batch equivalent") {
    val in = Files.createTempDirectory("fw2_in")
    val ckpt = Files.createTempDirectory("fw2_ckpt").toString
    val ev = Tables.events(spark, sf)
    ev.coalesce(1).write.mode("overwrite").parquet(s"$in/all.parquet")
    val schema = spark.read.parquet(s"$in/all.parquet").schema

    val agg = FileWatch.windowedCounts(
      FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema),
      "1 hour", "10 minutes")
    FileWatch.runAvailableNow(
      agg.writeStream.format("memory").queryName("win_counts").outputMode("append"),
      ckpt)
    // append mode emits only watermark-closed windows; all but the last
    // open window(s) must match the batch aggregation exactly
    val streamed = spark.table("win_counts")
      .groupBy("window_start", "event_type").agg(sum("n").as("n"))
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = streamed.alias("s").join(
      batch.alias("b"), Seq("window_start", "event_type"))
    assert(joined.count() == streamed.count()) // every emitted window matches batch
    assert(joined.filter(col("s.n") =!= col("b.n")).count() == 0)
    assert(streamed.count() > 0)
  }

  test("streaming dedup drops duplicate ids; stream-static join enriches") {
    val in = Files.createTempDirectory("fw3_in")
    val ckpt = Files.createTempDirectory("fw3_ckpt").toString
    val ev = Tables.events(spark, sf)
    // duplicate every event: dedup must return the original count
    ev.union(ev).coalesce(1).write.mode("overwrite").parquet(s"$in/all.parquet")
    val schema = spark.read.parquet(s"$in/all.parquet").schema
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("tier", col("user_id") % 3)
    val stream = FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema)
    val enriched = FileWatch.enrich(
      FileWatch.dedupStream(stream, "event_id", "1 hour"), users, "user_id")
    FileWatch.runAvailableNow(
      enriched.writeStream.format("memory").queryName("enriched").outputMode("append"),
      ckpt)
    val out = spark.table("enriched")
    assert(out.count() == ev.count()) // dups dropped
    assert(out.filter(col("tier").isNull).count() == 0) // every row enriched
  }

  test("parseProps yields a typed map") {
    val withMap = graft.ext.Multimodal.parseProps(Tables.events(spark, sf))
    val r = withMap.select(element_at(col("props_map"), "k")).limit(3).collect()
    assert(r.forall(_.getString(0) != null))
  }
}
