package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2B X5): media payloads as opaque
  * `binary` columns with typed metadata, plus a batch-shaped feature
  * extractor with the partitioning/batching layout a Pandas-UDF
  * (`mapInPandas`) pipeline would use on a Python-enabled cluster.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this environment): it derives deterministic fake features from the
  * raw bytes so the Spark-side plumbing — schema, batch iteration,
  * per-partition state, output shape — is real and testable.
  */
object Multimodal {

  /** Semi-structured props: JSON string -> MapType(String,String). The
    * typed library op behind the oracle-checked regexp query
    * (events.props per SURVEY.md §1).
    */
  def parseProps(events: DataFrame, propsCol: String = "props"): DataFrame =
    events.withColumn(
      s"${propsCol}_map",
      from_json(col(propsCol), MapType(StringType, StringType)))

  /** Wrap a text table into the multimodal layout: opaque binary payload +
    * typed metadata struct. Image/audio/video payloads would arrive in
    * exactly this shape from a binary-file source
    * (`spark.read.format("binaryFile")`).
    */
  def binarize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      checksum: Long,
      features: Array[Float])

  /** STUB decoder: a real pipeline would decode the image/audio payload
    * here (PIL/torchaudio via mapInPandas, or a JVM codec). The fake is
    * deterministic in the payload bytes so tests can assert exact values.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1125899906842597L // FNV-ish rolling state
    var i = 0
    while (i < payload.length) {
      acc = acc * 31 + (payload(i) & 0xFF)
      out(i % dim) += ((acc >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Batch-shaped feature extraction over (doc_id, payload) rows.
    * `mapPartitions` + an inner batch loop of `batchSize` mirrors the
    * Arrow-batch contract of `mapInPandas`: per-batch amortized decode
    * state, bounded memory per task, output rows independent of batch
    * boundaries. Partition-parallel — no driver involvement.
    */
  def extractFeatures(binarized: DataFrame, dim: Int = 8, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = binarized.sparkSession
    import spark.implicits._
    binarized
      .select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch "decoder session" (where a real impl would reuse a
          // codec context / model handle across the batch)
          batch.iterator.map { case (id, payload) =>
            var crc = 0L
            var i = 0
            while (i < payload.length) { crc = crc * 131 + (payload(i) & 0xFF); i += 1 }
            MediaFeatures(id, payload.length, crc, decodeStub(payload, dim))
          }
        }
      }
  }
}
