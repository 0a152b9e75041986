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

  /** Salted equi-join for a statically-known hot-key skew: the big
    * (skewed) side salts each row into one of `salts` sub-keys from its
    * task partition id; the small side is REPLICATED across all `salts`
    * sub-keys (explode over 0..salts-1). The join key becomes
    * (key, salt), so a hot key's rows spread over `salts` reducers
    * instead of one. Results are exactly the inner join's — each big-side
    * row meets each matching small-side row at exactly one salt (its
    * own). Cost: small side x salts, the standard replicate-broadcast
    * trade. Use when AQE's runtime skew split can't fire (e.g. the skew
    * is inside an aggregation-feeding join it cannot re-plan, or
    * deterministic partitioning is required); prefer AQE otherwise.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    // fail fast: with ANSI off, salts=0 would make pmod null on every
    // big-side row and silently join to nothing
    require(salts > 0, s"salts must be positive, got $salts")
    val bigS = big.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val smallS = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS
      .join(smallS, keys :+ "__salt")
      .drop("__salt")
  }

  /** Bloom semi-join pruning: drop probe-side rows whose key cannot exist
    * on the build side BEFORE the join's shuffle. The filter is built
    * driver-side from the (small, often pre-filtered) build side — a
    * bounded-size sketch regardless of probe-side scale — and probed by a
    * per-row expression at the scan. False positives (<= fpp) pass
    * through and are eliminated by the join itself, so results are exactly
    * the join's; the win is shuffle volume: the probe side sheds its
    * non-matching fraction at the scan stage. Use when the join is
    * selective but the build side exceeds the broadcast threshold (else
    * a broadcast join already avoids the probe-side shuffle).
    */
  def bloomPruned(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    probe.filter(
      org.apache.spark.sql.graftnative.BloomExpressions
        .mightContain(col(probeKey).cast("long"), bloom))
  }
}
