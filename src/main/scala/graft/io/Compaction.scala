package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Layout-aware compaction — the maintenance pass that keeps a 100 TB
  * table healthy. Two problems, one writer:
  *
  *  - small files: streaming/incremental ingest leaves thousands of tiny
  *    part files; listing and opening them dominates scan time long
  *    before row decoding does.
  *  - clustering: with rows scattered, per-file column min/max stats span
  *    the whole domain and predicate pushdown skips nothing.
  *
  * `repartitionByRange` on the cluster keys gives every output file a
  * narrow, non-overlapping key range (range exchange with sampled
  * bounds), and `maxRecordsPerFile` bounds file size without a second
  * shuffle. Reads filtered on the cluster key then touch only the files
  * whose stats overlap the predicate — parquet row-group skipping does
  * the rest inside each file.
  */
object Compaction {

  def writeClustered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      files: Int,
      maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
