package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus lane: explicit-schema read (no inference pass), corrupt
  * lines quarantined per-row, gzip round-trip through the sink.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("explicit-schema JSONL read quarantines corrupt lines, keeps good ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "hallo welt", "lang": "de"}""",
      """not json at all""",
      """{"doc_id": 4, "text": "missing lang"}""")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val df = Sources.jsonlDocs(spark, dir.toString, schema)
    val good = df.filter(col("_corrupt_record").isNull)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // missing fields are nulls, not corruption; only the unparseable line
    // is quarantined
    assert(good == Set((1L, Some("en")), (2L, Some("de")), (4L, None)))
    // Spark disallows scans whose only surviving column is
    // _corrupt_record (count() would prune everything else) — audit the
    // quarantine by materializing a data column alongside it
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select("doc_id", "_corrupt_record").collect()
    assert(corrupt.length == 1 && corrupt.head.isNullAt(0))
  }

  test("gzip JSONL round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_rt").toString + "/out"
    val in = Seq((10L, "alpha beta", "en"), (11L, "gamma", "fr"))
      .toDF("doc_id", "text", "lang")
    Sinks.jsonlGzip(in, dir)
    val gz = new java.io.File(dir).listFiles.map(_.getName).filter(_.endsWith(".json.gz"))
    assert(gz.nonEmpty, "sink must emit gzip part files")
    val back = Sources.jsonlDocs(spark, dir, schema)
      .filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set((10L, "alpha beta", "en"), (11L, "gamma", "fr")))
  }
}
