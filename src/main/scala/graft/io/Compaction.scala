package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, floor, least, lit, shiftleft, shiftright}
import org.apache.spark.sql.types.LongType

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

  /** Quantize a long column onto `[0, 2^bits)` by linear min/max scaling —
    * the per-dimension step of Z-ordering. Uses one double division:
    * deterministic, and quantization is a LAYOUT decision only (the
    * z-value never appears in data or results), so a boundary cell
    * landing one bucket over costs a sliver of clustering quality, never
    * correctness. Clamped so `hi` itself maps to the top cell.
    */
  def quantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val k = (1L << bits) - 1
    val range = math.max(hi - lo, 1L).toDouble
    least(floor((c - lit(lo)).cast("double") * k / range).cast(LongType), lit(k))
  }

  /** Interleave the low `bits` bits of each quantized dimension into one
    * Z-value (Morton code): bit `i` of dimension `j` lands at position
    * `i·d + j`, so a range sort on the result keeps EVERY dimension's
    * per-file span narrow — where lexicographic `repartitionByRange(a, b)`
    * clusters only `a` and leaves `b`'s file stats spanning the whole
    * domain (useless for skipping). Pure shift/mask integer expressions:
    * codegen-friendly, no UDF. `d·bits ≤ 62` keeps the code in a signed
    * long.
    */
  def zValue(qcols: Seq[Column], bits: Int): Column = {
    val d = qcols.size
    require(d >= 1 && d * bits <= 62, s"$d dims x $bits bits exceeds a signed long")
    val terms = for {
      i <- 0 until bits
      (q, j) <- qcols.zipWithIndex
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ + _)
  }
}
