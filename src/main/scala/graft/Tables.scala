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
  /** events.ts has shipped in three parquet shapes across driver rounds:
    * TIMESTAMP(NANOS) (read as LONG under the
    * `spark.sql.legacy.parquet.nanosAsLong=true` flag every session
    * builder here sets — a table loader must not mutate session config as
    * a side effect), naive TIMESTAMP(MICROS) (Spark 4's TIMESTAMP_NTZ,
    * which `unix_millis` et al. reject), and tz-aware MICROS. Normalize
    * all three to the instant type (TimestampType): nanos floor-convert
    * to micros (queries must not expose sub-second precision — DuckDB
    * keeps full nanos), and NTZ wall-clocks are interpreted as UTC — the
    * session timezone is pinned to UTC everywhere, so the cast preserves
    * the wall clock, exactly how DuckDB treats the naive column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Scale-adaptive respread of a LOW-SPLIT scan (optimization guide
    * §1.2/§6, the `sim_topk_pq` round-6 lesson generalized): a parquet
    * file is split at ROW-GROUP grain, so a small single-row-group table
    * arrives as ONE scan task and every downstream narrow operation
    * serializes on one core no matter how many the session has (measured
    * at sf0.1: the dedup_substrings gram pass ran 1.2 s on 1 of 32
    * cores). Repartition BY THE ROW KEY to the session's shuffle
    * parallelism — but only when the scan actually has fewer splits, so
    * on a production many-row-group table this is a provable no-op (the
    * gate reads the scan's partition count, not a constant): nothing is
    * shuffled at 100 TB where the scan is already wide. Keyed (hash)
    * repartition, not round-robin: deterministic row placement with no
    * sort-before-repartition pass.
    *
    * Apply SELECTIVELY, A/B-measured per lane (r10): it wins only where
    * the per-row work before the first natural exchange dwarfs one
    * exchange of the raw rows — posexplode-all-12-grams+md5
    * (dedup_substrings −63%), winnowing fingerprint HOFs (−25%),
    * broadcast-probed shingle explodes (contamination/decontaminate
    * −23..27%), PII regex chains (−11%), 8-gram novelty (−19%). Where
    * the first operation is itself an aggregating exchange
    * (terms/tfDf/withTok → groupBy, shingles → distinct), the map-side
    * partial agg already runs on the scan task and the extra exchange +
    * 32-way task overhead is a measured LOSS at fixture scale
    * (quantile_normalize +75%, dsir_reweight +51%, nucleus_select +53%,
    * text_vocab_oov +46%, the jaccardPairs dedup family +12..56%) —
    * those call sites read the table directly.
    */
  def spread(df: DataFrame, key: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= parts) df
    else df.repartition(parts, col(key))
  }

  /** money/measure column -> DECIMAL(12,2): exact, order-independent sums. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** rate column (discount/tax in [0,1]) -> DECIMAL(4,2). */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum rendered as double — bit-identical across engines. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Product-decimal sum (scale 4 or 6 from price × rate factors) rendered
    * as money: round the exact sum to scale 2 BEFORE the double cast.
    * Why: decimal→double is only bit-identical across engines while the
    * UNSCALED value fits in 2^53 (then both engines do one exact int→double
    * plus one correctly-rounded divide by a power of ten). A scale-6 sum
    * crosses 2^53 around 9e9 in value — the sf1 gate caught q1's
    * sum_charge differing in the last ulp (DuckDB double-rounds int128→
    * double→÷1e6; Java BigDecimal.doubleValue() is correctly rounded).
    * At scale 2 the safe range is ~9e13, far beyond any group sum whose
    * magnitude grows with corpus size. Use for GROWING-group money sums;
    * per-entity-bounded sums (per-order, per-customer) cannot outgrow
    * 2^53 at native scale and may keep full precision.
    *
    * round(), not a DECIMAL(38,2) downcast: both engines' round() is
    * half-away-from-zero (probed: 1.185→1.19, -1.185→-1.19, 2.675→2.68 in
    * both), while DuckDB's decimal scale-DOWN cast truncates where
    * Spark's rounds (3652441.1856 → .18 vs .19 — caught at sf0.01 the
    * moment this helper first shipped as a cast).
    */
  def dmsum(c: Column): Column =
    round(sum(c), 2).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, in double space. */
  def davg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c).cast(DoubleType)
}
