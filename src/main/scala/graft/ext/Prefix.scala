package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums — the scale-safe replacement for a
  * no-partition (single-reducer) ordered window.
  *
  * `SUM(x) OVER (ORDER BY k)` with no PARTITION BY moves the entire input
  * through ONE task; fine at sf0.1, a wall at 100 TB. The classic fix is a
  * two-phase scan: range-partition by the sort key, compute each
  * partition's local running sum, then add the total of every *earlier*
  * partition as a per-partition offset. Every phase here is declarative
  * DataFrame code, so Catalyst still sees one plan (and reuses the range
  * exchange across the stats and data branches):
  *
  *  1. `repartitionByRange(shard, order...)` — one keyed shuffle; ranges
  *     are ordered, so `spark_partition_id()` ascends with the sort key.
  *  2. local inclusive running sum per (partition, shard) — the window is
  *     bounded by one range partition, never the whole input.
  *  3. per-(partition, shard) totals (a partial-agg shuffle of
  *     #partitions x #shards-touched rows, tiny), prefix-summed per shard
  *     over at most #partitions rows, joined back (broadcast at any
  *     realistic partition count).
  *
  * Output is bit-identical to the single-window formulation for any input
  * (the fold order over a shard is the same total order), which is why
  * `order_deciles` and `pack_sequences` keep their unchanged DuckDB
  * oracles after switching to this.
  */
object Prefix {

  /** Inclusive running sum of `valueCol` within `shardCol` groups in
    * `orderCols` order, as column `out` — no single-reducer stage. For a
    * global (unsharded) running sum pass `lit(0L)` as the shard; the only
    * unpartitioned work is then the offset prefix over #partitions rows.
    *
    * `orderCols` must be a total order within each shard (add a unique
    * tiebreak column); equal full keys could otherwise straddle a range
    * boundary and make the local window order non-deterministic.
    */
  def runningSum(
      df: DataFrame,
      shardCol: Column,
      orderCols: Seq[Column],
      valueCol: Column,
      out: String,
      numPartitions: Int = 0): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // MATERIALIZED once (eager localCheckpoint; reliable checkpoint on a
    // real cluster): both phases below key on spark_partition_id(), and
    // RangePartitioner SAMPLES its boundaries with an RDD-id-dependent
    // seed — two independent executions of the same repartitionByRange
    // can split at different keys, making the (pid, shard) join silently
    // drop boundary rows (observed at sf0.1). Exchange reuse does not
    // save us: column pruning gives each branch a different scan, so the
    // two exchanges never canonicalize equal. One materialization costs
    // about one shuffle write — the same price as the second range
    // exchange it replaces, but deterministic.
    val ranged = df
      .withColumn("__shard", shardCol)
      .withColumn("__v", valueCol)
      .repartitionByRange(n, col("__shard") +: orderCols: _*)
      .localCheckpoint(true)
      .withColumn("__pid", spark_partition_id())
    // local inclusive running sum: the window key (__pid, __shard) is
    // constant within a range partition, so each window partition is a
    // slice of ONE range partition — bounded by the range split, not by
    // shard size (this is the shard-size contract packSequences needs)
    val wLocal = Window
      .partitionBy(col("__pid"), col("__shard"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__lcum", sum(col("__v")).over(wLocal))
    // per-shard offsets: total of every earlier range partition's slice
    // of the same shard, via a triangular join over the per-(partition,
    // shard) stats frame — <= numPartitions rows per shard by
    // construction, so the pair work is bounded no matter how big a shard
    // is. Deliberately NOT a prefix window: a constant shard (the global
    // case) would fold out of a window's partition spec and leave a
    // warned-about no-partition WindowExec, and a keyed join states the
    // boundedness directly.
    val stats = ranged
      .groupBy("__pid", "__shard")
      .agg(sum(col("__v")).as("__tot"))
    val earlier = stats
      .select(col("__pid").as("__pid2"), col("__shard").as("__shard2"), col("__tot"))
    val offsets = stats
      .select("__pid", "__shard")
      .join(
        earlier,
        col("__shard") === col("__shard2") && col("__pid2") < col("__pid"),
        "left")
      .groupBy("__pid", "__shard")
      .agg(coalesce(sum("__tot"), lit(0L)).as("__off"))
    // no broadcast hint: offsets is Θ(#partitions + #shards) rows — tiny
    // for global ranks (AQE broadcasts it on its own), but a file/day-
    // sharded 100 TB corpus has millions of shards, where forcing a
    // driver-collected broadcast would OOM exactly where this class must
    // scale; the keyed shuffle join is the safe default either way
    local
      .join(offsets, Seq("__pid", "__shard"))
      .withColumn(out, col("__off") + col("__lcum"))
      .drop("__pid", "__shard", "__v", "__lcum", "__off")
  }

  /** Exact global dense row rank (1-based) by `orderCols` — a running
    * count of 1s. The scale-safe `row_number() OVER (ORDER BY ...)`.
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column], out: String): DataFrame =
    runningSum(df, lit(0L), orderCols, lit(1L), out)

  /** Prefix MAX of a LONG `valueCol` within `shardCol` groups in
    * `orderCols` order — the same two-phase scan as [[runningSum]]
    * (max is associative and commutative, so the partition-offset
    * decomposition is identical), with one extra knob: `inclusive=false`
    * computes the max over STRICTLY EARLIER rows only (the skyline /
    * dominance shape), where a row with no predecessor gets
    * `Long.MinValue`. Exclusive semantics fall out locally from a
    * `(unboundedPreceding, -1)` frame — the cross-partition offset is
    * unchanged because earlier partitions are strictly earlier rows.
    *
    * `orderCols` must be a total order within each shard (same contract
    * as [[runningSum]]). Long-typed only: the MinValue identity makes a
    * generic numeric version lie for other widths.
    */
  def runningMax(
      df: DataFrame,
      shardCol: Column,
      orderCols: Seq[Column],
      valueCol: Column,
      out: String,
      inclusive: Boolean = true,
      numPartitions: Int = 0): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // same determinism hazard as runningSum: both phases key on
    // spark_partition_id(), so the range exchange must be materialized
    // once (RangePartitioner samples boundaries with an RDD-id-dependent
    // seed; two executions can split at different keys)
    val ranged = df
      .withColumn("__shard", shardCol)
      .withColumn("__v", valueCol.cast(org.apache.spark.sql.types.LongType))
      .repartitionByRange(n, col("__shard") +: orderCols: _*)
      .localCheckpoint(true)
      .withColumn("__pid", spark_partition_id())
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val wLocal = Window
      .partitionBy(col("__pid"), col("__shard"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = ranged.withColumn("__lmax", max(col("__v")).over(wLocal))
    val stats = ranged
      .groupBy("__pid", "__shard")
      .agg(max(col("__v")).as("__tot"))
    val earlier = stats
      .select(col("__pid").as("__pid2"), col("__shard").as("__shard2"), col("__tot"))
    val offsets = stats
      .select("__pid", "__shard")
      .join(
        earlier,
        col("__shard") === col("__shard2") && col("__pid2") < col("__pid"),
        "left")
      .groupBy("__pid", "__shard")
      .agg(coalesce(max("__tot"), lit(Long.MinValue)).as("__off"))
    local
      .join(offsets, Seq("__pid", "__shard"))
      .withColumn(out, greatest(coalesce(col("__lmax"), lit(Long.MinValue)), col("__off")))
      .drop("__pid", "__shard", "__v", "__lmax", "__off")
  }
}
