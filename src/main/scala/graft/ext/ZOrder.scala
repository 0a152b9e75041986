package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Range-clustering on one column ([[graft.io.Compaction.writeClustered]])
  * makes single-key predicates skip files but leaves a second key
  * scattered; sorting by the bit-interleaved z-value keeps BOTH
  * dimensions locally clustered, so per-file min/max stats stay selective
  * for predicates on either key (the Delta/Iceberg OPTIMIZE ZORDER
  * layout, as plain deterministic integer arithmetic — no UDF, and
  * SQL-expressible so the math is oracle-checkable).
  *
  * Inputs must be non-negative; only the low `bits` bits of each key
  * participate (callers range-scale or bucket real keys first — at 100 TB
  * that is a percentile-rank pass, itself a window/agg job).
  */
object ZOrder {

  /** Interleave the low `bits` bits: a occupies even bit positions, b odd.
    * 2*bits result bits; bits <= 31.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** DuckDB rendering of [[zValue]] over the same expressions. */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(((($a) >> $i) & 1) << ${2 * i})",
        s"(((($b) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString(" + ")
  }
}
