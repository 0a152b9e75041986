package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair for feature pipelines: per-entity gap detection and
  * linear interpolation over a regular grid — the step that turns a
  * sparse event log into the dense daily series a model consumes.
  *
  * Scale shape: the grid is generated per entity with
  * `sequence(min_day, max_day)` + explode (rows ∝ entity-days, never a
  * calendar cross join), neighbor lookup is two `last/first(ignoreNulls)`
  * windows PARTITIONED BY the entity (no global window), and the
  * interpolation itself is exact integer numerators over one double
  * division — bit-identical across engines and partitionings.
  */
object TimeSeries {

  /** Fill gaps in per-entity daily series by linear interpolation.
    *
    * Input `cells`: one row per PRESENT (entity, day) with an integer
    * measure `c`; `day` is an epoch-day long. Output: the INTERPOLATED
    * cells only — (entity, day, interp) for every missing grid day
    * strictly inside the entity's [min_day, max_day] span, where
    * `interp = (c_prev·(next−day) + c_next·(day−prev)) / (next−prev)`
    * on the nearest present neighbors. Span endpoints are present by
    * construction, so both neighbors always exist.
    */
  def gapFillInterpolate(cells: DataFrame, entity: String = "entity"): DataFrame = {
    val span = cells
      .groupBy(entity)
      .agg(min("day").as("mn"), max("day").as("mx"))
    val grid = span.select(
      col(entity),
      explode(sequence(col("mn"), col("mx"))).as("day"))
    val joined = grid.join(cells, Seq(entity, "day"), "left")
    val before = Window
      .partitionBy(entity)
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window
      .partitionBy(entity)
      .orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val presentDay = when(col("c").isNotNull, col("day"))
    joined
      .withColumn("pc", last("c", ignoreNulls = true).over(before))
      .withColumn("pd", last(presentDay, ignoreNulls = true).over(before))
      .withColumn("nc", first("c", ignoreNulls = true).over(after))
      .withColumn("nd", first(presentDay, ignoreNulls = true).over(after))
      .filter(col("c").isNull)
      .select(
        col(entity),
        col("day"),
        ((col("pc") * (col("nd") - col("day")) +
          col("nc") * (col("day") - col("pd"))).cast("double") /
          (col("nd") - col("pd")).cast("double")).as("interp"))
  }
}
