package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardBalanceSpec extends SparkSpec {

  test("snake-draft sharding balances token mass to within one max-doc") {
    val out = CorpusQueries
      .queries("shard_balanced")(spark, sf)
      .collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    val sums = out.map(_.getAs[Long]("tok_sum"))
    // balance: snake keeps shard sums tight (spread well under the mean)
    val spread = sums.max - sums.min
    val mean = sums.sum / sums.length
    assert(spread.toDouble <= math.max(mean * 0.2, 64.0), s"spread=$spread sums=${sums.toSeq}")
    // every shard got a near-equal doc count (ranks round-robin exactly)
    val counts = out.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
  }
}
