package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — attach to each left row the most recent right row
  * (right.time <= left.time) within the same key group. Spark has no
  * native as-of join; the classic implementations are a range cross-join
  * (O(n*m) — unusable at scale) or this union-tag + running-last-value
  * formulation: ONE shuffle on the key, linear work per partition, and
  * whole-stage-codegen'd throughout. DuckDB mirrors it with
  * `last_value(x IGNORE NULLS)` windows, so results are oracle-checkable.
  *
  * Tie rules (deterministic): right rows at the same timestamp as a left
  * row ARE visible (inclusive); among equal-time right rows the one with
  * the greatest tiebreak wins. Both sides must provide a tiebreak column.
  */
object AsOfJoin {
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tiebreak: String,
      prefix: String = "asof_"): DataFrame = {
    val leftStruct = StructType(left.schema.fields)
    val rightStruct = StructType(valueCols.map(c => right.schema(c)).toArray)
    // value columns travel as ONE struct so the running last() attaches a
    // whole right row — per-column last(ignoreNulls) would backfill null
    // fields of the newest right row from older rows, fabricating a row
    // that never existed.
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__is_left"),
        col(tiebreak).as("__tb"),
        struct(left.columns.map(col).toSeq: _*).as("__lrow"),
        lit(null).cast(rightStruct).as("__rvals")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__is_left"),
        col(tiebreak).as("__tb"),
        lit(null).cast(leftStruct).as("__lrow"),
        struct(valueCols.map(col): _*).as("__rvals")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = last(col("__rvals"), ignoreNulls = true).over(w).as("__asof")
    lTagged
      .union(rTagged)
      .select(col("__is_left"), col("__lrow"), attached)
      .filter(col("__is_left") === 1)
      .select(col("__lrow.*") +: valueCols.map(c => col(s"__asof.$c").as(prefix + c)): _*)
  }
}
