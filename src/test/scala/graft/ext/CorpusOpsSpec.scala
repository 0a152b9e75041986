package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("qualityReason: first failing rule wins, in contract order") {
    val cases = Seq(
      ("ok", "the quick brown fox jumps over a lazy dog of note and more to say here"),
      ("short", "tiny doc here"),                        // < 5 tokens
      ("shortw", "a b c d e f g h i j k l"),             // mean word len 1
      ("longw", "the organizational multiprocessing internationalization considerations"),
      ("symb", "the cat!!! ran@@@ far### away$$$ now%%%"),
      ("nostop", "spark shuffles partitions across cluster hash join stages"))
      .toDF("name", "raw")
      .withColumn("t", TextStats.normText(col("raw")))
      .withColumn("reason", CorpusOps.qualityReason(col("t")))
      .collect().map(r => r.getString(0) -> r.getAs[String]("reason")).toMap
    assert(cases("ok") == "keep")
    assert(cases("short") == "too_short")
    assert(cases("shortw") == "short_words")
    assert(cases("longw") == "long_words", cases.toString)
    assert(cases("symb") == "symbol_heavy", cases.toString)
    assert(cases("nostop") == "no_stopwords")
  }

  test("stratifiedSample: membership is identical across partitionings and ~matches rates") {
    val docs = graft.Tables.documents(spark, sf)
    val rates = Map("en" -> 0.25, "fr" -> 1.0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.stratifiedSample(df, "doc_id", "lang", rates, 0.1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    assert(a == b, "sample must not depend on partition layout")
    // fr rate 1.0 keeps everything
    val frAll = docs.filter($"lang" === "fr").count()
    val frKept = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates, 0.1)
      .filter($"lang" === "fr").count()
    assert(frKept == frAll)
    // en rate 0.25: binomial(193, 0.25) => far from 0 and from all
    val enAll = docs.filter($"lang" === "en").count()
    val enKept = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates, 0.1)
      .filter($"lang" === "en").count()
    assert(enKept > enAll / 8 && enKept < enAll / 2, s"$enKept of $enAll")
  }

  test("packSequences: concat-and-chunk assignment and straddle detection") {
    // budget 10; docs of 4,4,4 tokens: third doc starts at 8 -> seq 0,
    // straddles into seq 1; next doc starts at 12 -> seq 1
    val docs = Seq(
      ("s", 1L, 4L), ("s", 2L, 4L), ("s", 3L, 4L), ("s", 4L, 4L),
      ("z", 1L, 25L) // bigger than the budget: starts seq 0, straddles
    ).toDF("shard", "id", "tok")
    val got = CorpusOps.packSequences(docs, "shard", "id", "tok", 10L)
      .select("shard", "id", "seq_id", "straddles")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(("s", 1L)) == (0L, false))
    assert(got(("s", 2L)) == (0L, false))
    assert(got(("s", 3L)) == (0L, true))  // tokens 8..11 cross the cut at 10
    assert(got(("s", 4L)) == (1L, false)) // tokens 12..15
    assert(got(("z", 1L)) == (0L, true))  // spans seqs 0..2
  }
}
