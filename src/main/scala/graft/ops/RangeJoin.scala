package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded point-in-interval range join — Spark has no native range join;
  * the naive formulation (`points JOIN intervals ON pt >= lo AND pt < hi`)
  * has no equi key, so Spark plans a broadcast/cartesian nested-loop:
  * O(|points| x |intervals|) comparisons, unusable once neither side is
  * broadcast-small.
  *
  * The banded rewrite turns it into an EQUI join: pick a bucket width W,
  * explode each interval over the buckets it touches
  * (`floor(lo/W) .. floor(hi_inclusive/W)` — a short list when W is at
  * least the typical interval length), key each point by its single
  * bucket `floor(pt/W)`, hash-join on the bucket id, then keep exact
  * containment. Each (point, interval) pair meets in EXACTLY one bucket
  * (the point's), so no post-join dedup is needed. Cost:
  * one exploded copy of intervals (factor <= len/W + 1), one keyed
  * shuffle, per-bucket local work — the same shape every candidate
  * generator in this engine uses (shingles, LSH bands, sign buckets).
  * Skewed buckets (many intervals over one hot hour) split under AQE
  * like any hot hash key.
  *
  * Interval semantics: half-open `[lo, hi)`. Bucket arithmetic is
  * integer-only (callers pass epoch-ms or any monotone long), so the
  * rewrite is exactly mirrorable in oracle SQL as the plain range
  * predicate.
  */
object RangeJoin {

  /** Join `points` (point column `pt`) to `intervals` (`[lo, hi)` long
    * columns) on containment; emits all point columns + all interval
    * columns. `bucketWidth` trades exploded-copy count (short intervals,
    * big W -> ~1 copy) against per-bucket selectivity.
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    // hi is exclusive: an interval touching a bucket only at its open end
    // ((hi-1)/W) must not explode further. Empty intervals (lo >= hi) are
    // dropped up front — they can match nothing, and sequence() would
    // otherwise DESCEND for them and fabricate buckets.
    val ivb = intervals.filter(col(loCol) < col(hiCol)).withColumn(
      "__b",
      explode(
        sequence(
          (col(loCol) / w).cast(LongType),
          ((col(hiCol) - 1) / w).cast(LongType))))
    val ptb = points.withColumn("__b", (col(ptCol) / w).cast(LongType))
    ptb
      .join(ivb, Seq("__b"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__b")
  }
}
