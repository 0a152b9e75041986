package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.{CorpusOps, TextStats}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Curation ops are pure Column expressions, so the same code runs
  * unchanged over a stream — this is the ingest-time shape: documents
  * arrive as files, get quality-filtered and hash-sampled in-flight, and
  * land curated. The spec drives the full pipeline through the streaming
  * engine and checks it emits exactly what the batch pipeline computes.
  */
class StreamingCurationSpec extends SparkSpec {

  test("quality filter + stratified sample run in-stream and match batch") {
    val in = Files.createTempDirectory("cur_in")
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val docs = Tables.documents(spark, sf)
    docs.coalesce(1).write.mode("overwrite").parquet(s"$in/d.parquet")
    val schema = spark.read.parquet(s"$in/d.parquet").schema

    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      CorpusOps.stratifiedSample(
        df.withColumn("t", TextStats.normText(col("text")))
          .withColumn("reason", CorpusOps.qualityReason(col("t")))
          .filter(col("reason") === "keep"),
        "doc_id", "lang", Map("en" -> 0.5), defaultRate = 0.25)

    val stream = curate(FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema))
      .select("doc_id")
    FileWatch.runAvailableNow(
      stream.writeStream.format("memory").queryName("curated").outputMode("append"),
      ckpt)

    val streamed = spark.table("curated").collect().map(_.getLong(0)).toSet
    val batch = curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("train/val/test assignment is a pure projection: in-stream == batch") {
    // the property that makes the split safe for incremental corpus
    // rebuilds: assignment depends only on the row, so streamed arrivals
    // get the same split as a batch rebuild
    val in = Files.createTempDirectory("spl_in")
    val ckpt = Files.createTempDirectory("spl_ckpt").toString
    val docs = Tables.documents(spark, sf)
    docs.coalesce(1).write.mode("overwrite").parquet(s"$in/d.parquet")
    val schema = spark.read.parquet(s"$in/d.parquet").schema

    def assign(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val h = pmod(
        graft.ext.Dedup.portableHash64(concat(lit("split:"), col("doc_id").cast("string"))),
        lit(1000000L))
      df.select(
        col("doc_id"),
        when(h < 980000L, "train").when(h < 990000L, "val").otherwise("test").as("split"))
    }

    FileWatch.runAvailableNow(
      assign(FileWatch.watchParquetDir(spark, s"$in/*.parquet", schema))
        .writeStream.format("memory").queryName("splits").outputMode("append"),
      ckpt)
    val streamed = spark.table("splits").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = assign(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch.nonEmpty && streamed == batch)
    assert(streamed.values.toSet.subsetOf(Set("train", "val", "test")))
  }
}
