package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Incremental aggregate maintenance: keep per-bucket PARTIAL aggregate
  * states (count + exact decimal sum per (key, bucket)) and merge them
  * into totals on demand — the "never rescan history" pattern. A daily
  * job aggregates only its own bucket; totals are a merge over the small
  * state table. Correct because the states are commutative monoids:
  * count/sum merge by addition, and the DECIMAL(38,2) sums are exact, so
  * merged totals are bit-identical to a full recompute under ANY bucket
  * split — which is precisely what the oracle hash-check proves.
  */
object Incremental {

  /** Partial states for one or more buckets: (keys..., bucket, n, total). */
  def partialStates(
      df: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      valueCol: String): DataFrame =
    df.groupBy((keys :+ bucketCol).map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(12, 2))).cast(DecimalType(38, 2)).as("total"))

  /** Merge partial states down to per-key totals. */
  def mergeStates(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials
      .groupBy(keys.map(col): _*)
      .agg(
        sum("n").cast(LongType).as("n"),
        sum("total").cast(DecimalType(38, 2)).as("total"))

  /** Maintain per-key totals from a change-data feed (rows tagged
    * `_change` = insert/delete, e.g. [[graft.io.Snapshots.changes]]):
    * inserts add, deletes subtract, keys whose count reaches zero drop
    * out. The refresh pattern at 100 TB — the aggregate is updated by a
    * pass over the DELTA (two versions' diff), never a rescan of the
    * table, and because count/sum are exact-decimal monoids the result
    * is bit-identical to a full recompute.
    */
  def applyDelta(
      totals: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    val sgn = when(col("_change") === "insert", lit(1)).otherwise(lit(-1))
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(
        sum(sgn).cast(LongType).as("dn"),
        sum(sgn * col(valueCol).cast(DecimalType(12, 2))).cast(DecimalType(38, 2)).as("dtotal"))
    val zeroDec = lit(0).cast(DecimalType(38, 2))
    // NULL-SAFE key equality: a NULL grouping key is one bucket (exactly
    // as groupBy treats it) — a plain equi-join would keep the stale
    // total and the delta as two separate rows and silently diverge from
    // a full recompute
    val cond = keys.map(k => totals(k) <=> delta(k)).reduce(_ && _)
    totals
      .join(delta, cond, "full")
      .select(
        keys.map(k => coalesce(totals(k), delta(k)).as(k)) ++ Seq(
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).cast(LongType).as("n"),
          (coalesce(col("total"), zeroDec) + coalesce(col("dtotal"), zeroDec))
            .cast(DecimalType(38, 2)).as("total")): _*)
      .filter(col("n") > 0)
  }
}
