package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test-table loaders + cross-engine numeric determinism helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same tables. Double
  * aggregation is order-dependent, so any `SUM(double)` would differ in the
  * last ulps between engines. The fix used across all queries: cast to an
  * exactly-representable DECIMAL before summing (decimal addition is exact
  * and order-independent), then cast the final result back to DOUBLE. Both
  * engines then produce bit-identical doubles.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    * the session sets `spark.sql.legacy.parquet.nanosAsLong=true` (all
    * session builders here do — Verify/Bench/tools/specs; a table loader
    * must not mutate session config as a side effect). The nanos-as-long
    * column is floor-converted to micros; queries must not expose
    * sub-second precision (DuckDB keeps full nanos).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    // Driver-generated dirs carry nanos (read as LONG under the legacy
    // flag); ScaleGen-produced dirs carry real TIMESTAMP(MICROS) — accept
    // both so every query runs unchanged against either layout.
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** money/measure column -> DECIMAL(12,2): exact, order-independent sums. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** rate column (discount/tax in [0,1]) -> DECIMAL(4,2). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum rendered as double — bit-identical across engines. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, in double space. */
  def davg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c).cast(DoubleType)
}
