package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing fingerprints overlap heavily for locally-edited docs, barely for unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat"),
      (2L, "the quick brown fox leaps over the lazy dog while the cat sleeps on the warm mat"), // one word edit
      (3L, "partition pruning and predicate pushdown keep the parquet scan narrow and fast today")
    ).toDF("id", "t")
    val fp = docs.select(
      col("id"),
      TextStats.winnowingFingerprints(col("t"), 5, 4).as("fps"))
    val sets = fp.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def jac(a: Set[Long], b: Set[Long]) = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac(sets(1L), sets(2L)) > 0.5, s"edited pair: ${jac(sets(1L), sets(2L))}")
    assert(jac(sets(1L), sets(3L)) < 0.1, s"unrelated pair: ${jac(sets(1L), sets(3L))}")
  }

  test("fingerprints are deterministic and short docs yield empty sets gracefully") {
    val df = Seq((1L, "hi")).toDF("id", "t") // shorter than k
    val out = df.select(TextStats.winnowingFingerprints(col("t"), 5, 4)).first().getSeq[Long](0)
    assert(out.isEmpty)
  }
}
