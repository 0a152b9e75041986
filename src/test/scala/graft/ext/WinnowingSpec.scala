package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprints(df: DataFrame): Map[Long, Set[Long]] =
    df.withColumn("t", TextStats.normText(col("t")))
      .withColumn("grams", TextStats.kgramHashes(col("t"), 5))
      .select(col("id"), TextStats.winnow(col("grams"), 4).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat"),
    (2L, "the quick brown fox leaps over the lazy dog while the cat sleeps on the warm mat"), // one word edit
    (3L, "partition pruning and predicate pushdown keep the parquet scan narrow and fast today")
  ).toDF("id", "t")

  test("fingerprints overlap heavily for locally-edited docs, barely for unrelated") {
    val sets = fingerprints(docs)
    def jac(a: Set[Long], b: Set[Long]) = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac(sets(1L), sets(2L)) > 0.5, s"edited pair: ${jac(sets(1L), sets(2L))}")
    assert(jac(sets(1L), sets(3L)) < 0.1, s"unrelated pair: ${jac(sets(1L), sets(3L))}")
  }

  test("native one-pass expression matches the portable HOF pipeline exactly") {
    // value parity must hold ELEMENT-WISE (same distinct fps in the same
    // first-occurrence order), across the whole real corpus including
    // edge rows — this is what lets the query swap in the native path
    // without touching the oracle SQL
    val d = graft.Tables.documents(spark, sf)
      .withColumn("t", TextStats.normText(col("text")))
    val hof = d
      .withColumn("grams", TextStats.kgramHashes(col("t"), 8, portable = true))
      .select(col("doc_id"), TextStats.winnow(col("grams"), 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = d
      .select(col("doc_id"), TextStats.winnowingFingerprintsNative(col("t"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
    // multibyte code points: substr semantics must stay code-point-based
    val uni = Seq((1L, "añb€c😀défghijklm")).toDF("id", "t")
    val h2 = uni.withColumn("g", TextStats.kgramHashes(col("t"), 5, portable = true))
      .select(TextStats.winnow(col("g"), 3)).collect()(0).getSeq[Long](0)
    val n2 = uni.select(TextStats.winnowingFingerprintsNative(col("t"), 5, 3))
      .collect()(0).getSeq[Long](0)
    assert(n2 == h2 && h2.nonEmpty)
  }

  test("deterministic across partitionings; null/short input yields empty sets") {
    val base = fingerprints(docs)
    val repart = fingerprints(docs.repartition(7))
    assert(base == repart)
    val edge = fingerprints(Seq((1L, "hi"), (2L, null.asInstanceOf[String])).toDF("id", "t"))
    assert(edge(1L).isEmpty && edge(2L).isEmpty)
  }
}
