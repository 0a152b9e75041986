package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: SCD2 history construction from a change
  * feed, and MERGE-style upsert application — the two halves of keeping a
  * dimension table correct without rescanning the fact history.
  *
  * Both are single-shuffle window/join plans keyed by the dimension key:
  * at 100 TB the change feed shuffles once on the key (skew-safe: a key's
  * row count is its change count, not the corpus size), and the base
  * table joins with standard equi-join machinery — broadcast when the
  * day's changes are small, sort-merge otherwise, AQE picking at runtime.
  */
object Cdc {

  /** Slowly-changing-dimension type-2 history from a change feed: one
    * version row per surviving change, valid over [valid_from, valid_to),
    * `valid_to` null for the current version.
    *
    * Consecutive rows whose `attrCols` are unchanged are collapsed first
    * (null-safe comparison) — re-delivered unchanged snapshots, the normal
    * CDC noise, do not open spurious versions. `orderCols` must be a
    * deterministic total order within a key (e.g. event time at ms grain
    * + event id as tiebreak).
    */
  def scd2History(
      cdc: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      attrCols: Seq[String],
      validFromCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val unchanged = attrCols
      .map(a => col(a) <=> lag(col(a), 1).over(w))
      .reduce(_ && _)
    val changes = cdc
      .withColumn("__dup", coalesce(unchanged, lit(false)))
      .filter(!col("__dup"))
      .drop("__dup")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(validFromCol))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** MERGE INTO emulation: apply a batch of keyed upserts to a base
    * snapshot via one full-outer join. `setCols` maps output column ->
    * (base expression, update expression); matched keys take the update
    * value, unmatched-base keeps its value, unmatched-update inserts.
    * Adds `__op` in (kept, updated, inserted) for auditing.
    */
  def applyUpserts(
      base: DataFrame,
      updates: DataFrame,
      baseKey: String,
      updateKey: String,
      setCols: Seq[(String, Column, Column)]): DataFrame = {
    val joined = base.join(updates, col(baseKey) === col(updateKey), "full_outer")
    val out = setCols.foldLeft(joined) { case (df, (name, baseExpr, updExpr)) =>
      df.withColumn(name, when(col(updateKey).isNotNull, updExpr).otherwise(baseExpr))
    }
    out
      .withColumn(
        "__op",
        when(col(updateKey).isNull, "kept")
          .when(col(baseKey).isNull, "inserted")
          .otherwise("updated"))
      .withColumn("__key", coalesce(col(baseKey), col(updateKey)))
  }
}
