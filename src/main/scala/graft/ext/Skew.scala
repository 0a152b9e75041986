package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavily-hot group keys: salted two-phase
  * aggregation. Phase 1 spreads each key across `salts` sub-groups
  * (salt = task partition id, so no extra column scan), phase 2 merges
  * partials. The merge is exact for decomposable aggregates (count/sum —
  * including the decimal-exact sums used for oracle parity). AQE's skew
  * handling covers joins; this covers aggregations whose single hot key
  * would otherwise bottleneck one reducer.
  */
object Skew {
  /** Salted count+sum per key group; identical results to a direct
    * groupBy, but no reducer receives more than ~1/salts of a hot key.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      sumCol: Column,
      salts: Int): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(sumCol).as("__sum"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__cnt").cast("long").as("n"), sum("__sum").as("total"))
  }
}
