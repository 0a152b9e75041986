package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum machinery must be BIT-IDENTICAL to the
  * single-window formulation it replaces (order_deciles, pack_sequences
  * keep their unchanged DuckDB oracles on the strength of this), and must
  * enforce the shard-size contract: no window partition larger than one
  * range split, even when every row lands in ONE shard.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic ragged fixture: shard sizes 1..40ish, duplicate token
  // counts, ids interleaved across shards so range splits cut mid-shard
  private lazy val docs = (1L to 500L)
    .map(i => (s"s${i % 7}", i, (i * 37 % 90) + 1))
    .toDF("shard", "id", "tok")

  test("runningSum equals the single-window cumulative sum exactly") {
    val w = Window
      .partitionBy("shard")
      .orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs
      .withColumn("cum", sum("tok").over(w))
      .select("shard", "id", "cum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = Prefix
      .runningSum(docs, col("shard"), Seq(col("id")), col("tok"), "cum", 8)
      .select("shard", "id", "cum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == expected)
  }

  test("globalRank equals row_number over the total order, one shard case") {
    // single logical shard — the exact shape that serialized the old
    // order_deciles into one task
    val expected = docs
      .withColumn("rnk", row_number().over(Window.orderBy(col("tok"), col("id"))).cast("long"))
      .select("id", "rnk")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = Prefix
      .globalRank(docs, Seq(col("tok"), col("id")), "rnk")
      .select("id", "rnk")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expected)
  }

  test("runningMax matches the single-window prefix max, inclusive and exclusive") {
    val wIncl = Window
      .partitionBy("shard")
      .orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window
      .partitionBy("shard")
      .orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("mi", max("tok").over(wIncl))
      .withColumn("me", coalesce(max("tok").over(wExcl), lit(Long.MinValue)))
      .select("shard", "id", "mi", "me")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val gotIncl = Prefix
      .runningMax(docs, col("shard"), Seq(col("id")), col("tok"), "m", inclusive = true,
        numPartitions = 8)
      .select("shard", "id", "m")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val gotExcl = Prefix
      .runningMax(docs, col("shard"), Seq(col("id")), col("tok"), "m", inclusive = false,
        numPartitions = 8)
      .select("shard", "id", "m")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(gotIncl == expected.view.mapValues(_._1).toMap)
    assert(gotExcl == expected.view.mapValues(_._2).toMap)
  }

  test("packSequencesScalable is row-identical to packSequences") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("seq_id"), col("straddles"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val simple = CorpusOps.packSequences(docs, "shard", "id", "tok", 128L)
    val scalable = CorpusOps.packSequencesScalable(docs, "shard", "id", "tok", 128L, 8)
    assert(key(scalable) == key(simple))
  }

  test("shard-size contract: no window partition exceeds one range split") {
    // every row in ONE shard, 8 range splits: the local windows must see
    // at most ~n/8 rows each, never the whole shard. Count rows per
    // (range partition) the same way runningSum keys its local window.
    val one = (1L to 400L).map(i => ("only", i, 5L)).toDF("shard", "id", "tok")
    val perSplit = one
      .repartitionByRange(8, col("shard"), col("id"))
      .groupBy(spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(_.getLong(1))
    assert(perSplit.length > 1, "a single shard must still spread over range splits")
    assert(perSplit.max <= 400 / 2, s"range split too coarse: ${perSplit.mkString(",")}")
    // and the scalable packing stays correct on that degenerate layout
    val simple = CorpusOps.packSequences(one, "shard", "id", "tok", 64L)
      .select("id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scalable = CorpusOps.packSequencesScalable(one, "shard", "id", "tok", 64L, 8)
      .select("id", "seq_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scalable == simple)
  }
}
