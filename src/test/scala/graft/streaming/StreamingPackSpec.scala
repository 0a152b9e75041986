package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.{CorpusOps, TextStats}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class StreamingPackSpec extends SparkSpec {
  import spark.implicits._

  private def touchAll(dir: String, t: Long): Unit =
    new java.io.File(dir).listFiles().foreach(f => f.setLastModified(t))

  private def withTok = Tables
    .documents(spark, sf)
    .withColumn("t", coalesce(TextStats.normText(col("text")), lit("")))
    .withColumn("n_tok", size(split(col("t"), " ")).cast(LongType))
    .select("source", "doc_id", "n_tok")

  test("streaming packer == batch packer across micro-batch boundaries") {
    val in = Files.createTempDirectory("pk_in")
    val ckpt = Files.createTempDirectory("pk_ckpt").toString
    val docs = withTok
    // two files split at the per-corpus doc_id median -> with
    // maxFilesPerTrigger=1 the stream packs in two micro-batches, so
    // per-source running state must survive a batch boundary
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).first().getLong(0)
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/a.parquet")
    docs.filter(col("doc_id") > mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b.parquet")
    // the file source orders batches by modification time — pin it so
    // a.parquet (lower doc_ids) always precedes b.parquet, matching the
    // packer's manifest-order contract
    touchAll(s"$in/a.parquet", 1000000000L)
    touchAll(s"$in/b.parquet", 2000000000L)
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*.parquet")
      .as[StreamingPack.DocTok]
    FileWatch.runAvailableNow(
      StreamingPack.packStream(stream, 256L)
        .writeStream.format("memory").queryName("packed").outputMode("append"),
      ckpt)
    val streamed = spark.table("packed")
    assert(streamed.count() == docs.count())

    val batch = CorpusOps
      .packSequencesScalable(
        Tables.documents(spark, sf)
          .withColumn("t", coalesce(TextStats.normText(col("text")), lit("")))
          .withColumn("n_tok", size(split(col("t"), " ")).cast(LongType)),
        "source", "doc_id", "n_tok", 256L)
      .select(col("source"), col("doc_id"), col("seq_id"), col("straddles"))

    val mismatches = streamed
      .select(col("source"), col("doc_id"),
        col("seq_id").as("s_seq"), col("straddles").as("s_str"))
      .join(batch, Seq("source", "doc_id"), "full_outer")
      .filter(
        col("s_seq").isNull || col("seq_id").isNull ||
          col("s_seq") =!= col("seq_id") || col("s_str") =!= col("straddles"))
    assert(mismatches.count() == 0)
  }

  test("state continues across a checkpoint restart (second batch of files)") {
    val in = Files.createTempDirectory("pk2_in")
    val ckpt = Files.createTempDirectory("pk2_ckpt").toString
    val outDir = Files.createTempDirectory("pk2_out").toString
    val docs = withTok
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).first().getLong(0)
    val schemaSrc = s"$in/a.parquet"
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("overwrite").parquet(schemaSrc)
    val schema = spark.read.parquet(schemaSrc).schema

    // parquet sink (the memory sink cannot recover from a checkpoint):
    // output accumulates across the restart, exactly-once per doc
    def drain(): Unit = FileWatch.runAvailableNow(
      StreamingPack.packStream(
        spark.readStream.schema(schema).parquet(s"$in/*.parquet")
          .as[StreamingPack.DocTok], 256L)
        .writeStream.format("parquet").option("path", outDir),
      ckpt)
    drain()
    val firstHalf = spark.read.parquet(outDir).count()
    assert(firstHalf == docs.filter(col("doc_id") <= mid).count())
    // a NEW query over the same checkpoint: only b.parquet is unseen, and
    // the per-source cum must resume from the restored flatMapGroups state
    // for the second half's seq_ids to come out right
    docs.filter(col("doc_id") > mid).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b.parquet")
    drain()
    val streamed = spark.read.parquet(outDir)
    assert(streamed.count() == docs.count())

    val batch = CorpusOps
      .packSequencesScalable(
        Tables.documents(spark, sf)
          .withColumn("t", coalesce(TextStats.normText(col("text")), lit("")))
          .withColumn("n_tok", size(split(col("t"), " ")).cast(LongType)),
        "source", "doc_id", "n_tok", 256L)
      .select(col("source"), col("doc_id"), col("seq_id"), col("straddles"))
    val mismatches = streamed
      .select(col("source"), col("doc_id"),
        col("seq_id").as("s_seq"), col("straddles").as("s_str"))
      .join(batch, Seq("source", "doc_id"), "full_outer")
      .filter(
        col("s_seq").isNull || col("seq_id").isNull ||
          col("s_seq") =!= col("seq_id") || col("s_str") =!= col("straddles"))
    assert(mismatches.count() == 0)
  }
}
