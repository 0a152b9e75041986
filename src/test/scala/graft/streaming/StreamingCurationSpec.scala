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
}
