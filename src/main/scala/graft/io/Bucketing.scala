package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers — the co-located-join path for repeated big
  * joins at 100 TB: two tables bucketed (and sort-ordered) on the same
  * key with the same bucket count join with NO shuffle exchange on either
  * side (verified by BucketingSpec asserting an Exchange-free sort-merge
  * join plan). The one-time bucketed write replaces a shuffle per join
  * with a shuffle per table per load.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
