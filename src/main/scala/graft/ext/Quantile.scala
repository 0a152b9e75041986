package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics by HISTOGRAM REFINEMENT — the
  * scale-safe exact median/quantile pick for numeric columns.
  *
  * A full exact rank ([[Prefix.runningSum]] over every row) answers "what
  * is rank r" by materializing a running count of the WHOLE table — one
  * eager checkpoint plus a shuffle proportional to the data. But a rank
  * PICK only needs the one row holding rank r, and that row can be
  * cornered exactly without ranking everything:
  *
  *   1. per-group (min, max, count) — one scan, |groups| rows;
  *   2. equi-width bucket counts over k buckets — one scan, ≤ |groups|·k
  *      cells; the cumulative over cells locates the bucket provably
  *      containing rank r, and how many rows precede it (`before`);
  *   3. only that bucket's rows (~n/k of the data) get an exact
  *      [[Prefix.runningSum]] rank; the row with local rank r − before is
  *      the exact global rank-r element.
  *
  * Every step is exact integer counting — the result is the IDENTICAL row
  * a full sort would pick (same (value, tiebreak) total order), so DuckDB
  * oracles of the plain `row_number` formulation stay unchanged — while
  * the shuffle carries k cells per group instead of the table, and the
  * only materialization is the ~n/k candidate slice. Bucket index is a
  * pure function of the value (floor((x−lo)·k/(hi−lo)), clamped), so the
  * plan is deterministic under any partitioning. Degenerate groups
  * (hi == lo) collapse to bucket 0 and the refinement is a no-op slice.
  *
  * At 100 TB with k=1024 the candidate slice is 0.1% of each group; if a
  * skewed value concentrates a bucket, the slice is exactly that value's
  * duplicate mass and the rank pick inside it is decided by tiebreak
  * columns — still bounded by the Prefix range-partitioning, never by one
  * task.
  *
  * Precision contract: the total order is evaluated on the NATIVE column
  * type (the double cast is used only for bucket placement, where the
  * cast's monotonicity keeps bucket boundaries order-consistent), so
  * int64 values past 2^53 or decimals finer than double spacing still
  * pick the exact row_number element. The OUTPUT column is the double
  * projection of the picked value — exact for the cents/ms/micros
  * domains the queries use; a caller whose values themselves exceed
  * double precision should re-join the picked (group, rank) back to the
  * native column instead of reading `out` directly.
  */
object Quantile {

  /** The exact rank-`rankOf(n)` element of `x` per group, with total
    * order (x, tiebreaks...). Returns one row per group: (groupCol, out).
    * `rankOf` maps the group size column `n` to the 1-based target rank
    * as a Column expression (e.g. `(n+1) div 2` for the lower median).
    */
  def rankPick(
      df: DataFrame,
      groupCol: Column,
      x: Column,
      tiebreaks: Seq[Column],
      rankOf: Column => Column,
      groupOut: String,
      out: String,
      k: Int = 1024): DataFrame = {
    // __xn carries the NATIVE value for ordering; __x is the double
    // projection used for bucketing (monotone, so buckets respect the
    // native order) and for the output rendering
    val base = df.select(
      groupCol.as("__g") +: x.as("__xn") +: x.cast("double").as("__x") +:
        tiebreaks.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
    // |groups|-row frame consumed by the bucket join AND the target
    // lookup: an eager localCheckpoint runs its scan ONCE instead of per
    // consumer (tiny-model materialization, like the IVF centroids)
    val stats = base
      .groupBy("__g")
      .agg(
        min("__x").as("__lo"),
        max("__x").as("__hi"),
        count(lit(1)).as("__n"))
      .withColumn("__r", rankOf(col("__n")))
      .localCheckpoint(true)
    val bucketed = base
      .join(broadcast(stats), Seq("__g"))
      .withColumn(
        "__idx",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(
            least(
              lit(k - 1),
              floor((col("__x") - col("__lo")) / ((col("__hi") - col("__lo")) / k))
                .cast("int"))))
    // cell census: ≤ |groups|·k rows — the window below is over a frame
    // bounded by construction (k cells per group), not by the data
    val cells = bucketed.groupBy("__g", "__idx").agg(count(lit(1)).as("__c"))
    val wc = Window.partitionBy("__g").orderBy("__idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val target = cells
      .withColumn("__cum", sum("__c").over(wc))
      .join(stats.select(col("__g"), col("__r")), Seq("__g"))
      .filter(col("__cum") >= col("__r") && col("__cum") - col("__c") < col("__r"))
      .select(col("__g"), col("__idx"), (col("__cum") - col("__c")).as("__before"), col("__r"))
      // |groups| rows whose lineage is the cell-census scan: checkpointed
      // so the candidate job below re-reads 3 rows, not the census
      .localCheckpoint(true)
    // materialize the slice once: Prefix.runningSum executes its input
    // lineage twice (range-boundary sampling + eager checkpoint), and
    // that lineage is a full scan — checkpointed, both passes touch only
    // the ~n/k candidate rows
    val cand = bucketed
      .drop("__r")
      .join(broadcast(target), Seq("__g", "__idx"))
      .localCheckpoint(true)
    val tiebreakCols = tiebreaks.indices.map(i => col(s"__t$i"))
    Prefix
      .runningSum(cand, col("__g"), col("__xn") +: tiebreakCols, lit(1L), "__rn")
      .filter(col("__rn") === col("__r") - col("__before"))
      .select(col("__g").as(groupOut), col("__x").as(out))
  }

  /** Several exact rank picks per group from ONE histogram pass — the
    * p50/p90/p99 shape. Same refinement as [[rankPick]], but the cell
    * cumulative is joined against every labeled target rank, the
    * candidate slice covers the union of target buckets (≤ one bucket
    * per label), and local ranks are computed per (group, bucket) so
    * each label's pick is `before(bucket) + local`. Output: one row per
    * (group, label) with the picked value — pivot at the call site.
    */
  def rankPicks(
      df: DataFrame,
      groupCol: Column,
      x: Column,
      tiebreaks: Seq[Column],
      ranksOf: Seq[(String, Column => Column)],
      groupOut: String,
      out: String,
      k: Int = 1024): DataFrame = {
    // same native-order / double-bucket split as rankPick
    val base = df.select(
      groupCol.as("__g") +: x.as("__xn") +: x.cast("double").as("__x") +:
        tiebreaks.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
    // |groups|-row frame referenced once PER LABEL in `targets` plus the
    // bucket join — checkpoint eagerly so its scan runs once, not 1+|labels|×
    val stats = base
      .groupBy("__g")
      .agg(
        min("__x").as("__lo"),
        max("__x").as("__hi"),
        count(lit(1)).as("__n"))
      .localCheckpoint(true)
    // one row per (group, label): the target global rank
    val targets = ranksOf
      .map { case (label, rof) =>
        stats.select(col("__g"), lit(label).as("__lbl"), rof(col("__n")).as("__r"))
      }
      .reduce(_ union _)
    val bucketed = base
      .join(broadcast(stats), Seq("__g"))
      .withColumn(
        "__idx",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(
            least(
              lit(k - 1),
              floor((col("__x") - col("__lo")) / ((col("__hi") - col("__lo")) / k))
                .cast("int"))))
    val cells = bucketed.groupBy("__g", "__idx").agg(count(lit(1)).as("__c"))
    val wc = Window.partitionBy("__g").orderBy("__idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("__cum", sum("__c").over(wc))
    val hit = cum
      .join(targets, Seq("__g"))
      .filter(col("__cum") >= col("__r") && col("__cum") - col("__c") < col("__r"))
      .select(col("__g"), col("__idx"), col("__lbl"),
        (col("__r") - (col("__cum") - col("__c"))).as("__local_r"))
      // ≤ |groups|·|labels| rows feeding TWO consumers (bucket slice +
      // final rank match) — checkpoint so the cell census runs once
      .localCheckpoint(true)
    // candidate slice: union of target buckets (distinct — two labels can
    // land in one bucket)
    val candBuckets = hit.select("__g", "__idx").distinct()
    // materialized once for the same two-pass reason as in rankPick
    val cand = bucketed.join(broadcast(candBuckets), Seq("__g", "__idx"))
      .localCheckpoint(true)
    // local rank within (group, bucket): shard key is the bucket
    val ranked = Prefix.runningSum(
      cand,
      struct(col("__g"), col("__idx")),
      col("__xn") +: tiebreaks.indices.map(i => col(s"__t$i")),
      lit(1L),
      "__rn")
    ranked
      .join(broadcast(hit), Seq("__g", "__idx"))
      .filter(col("__rn") === col("__local_r"))
      .select(col("__g").as(groupOut), col("__lbl").as("label"), col("__x").as(out))
  }

  /** Lower median per group: rank (n+1) div 2 of the (x, tiebreaks)
    * order — the same element `row_number`-then-filter picks.
    */
  def medianPick(
      df: DataFrame,
      groupCol: Column,
      x: Column,
      tiebreaks: Seq[Column],
      groupOut: String,
      out: String,
      k: Int = 1024): DataFrame =
    // shiftright is floor((n+1)/2) on nonnegative longs — integer-exact,
    // unlike the Column `/` operator (double division)
    rankPick(df, groupCol, x, tiebreaks, n => shiftright(n + lit(1L), 1), groupOut, out, k)
}
