package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-memory sketches with deterministic, cross-engine-reproducible
  * results (SURVEY.md §2B X6 "sketch_stats").
  *
  * Spark's own sketches (HLL++ `approx_count_distinct`, KLL
  * `approx_percentile`) are the first choice in a pure-Spark pipeline and
  * stay exercised in SketchSpec — but their estimates are
  * implementation-specific, so no other engine can reproduce them and the
  * correctness gate could only row-count them. The KMV (k-minimum-values)
  * distinct-count sketch here is built from [[Dedup.portableHash64]]:
  * deterministic given the hash, so DuckDB reproduces the estimate
  * bit-for-bit and the sketch is hash-checked like any exact query.
  *
  * Scale shape: `distinct` on 60-bit hashes partially aggregates before
  * the exchange (the shuffle carries per-partition-distinct hashes, not
  * rows), and the k-smallest selection is a TakeOrdered of k values —
  * driver traffic is O(k) no matter the corpus.
  */
object Sketches {

  /** 2^60 as an exact double — the portable-hash value space. */
  val HashSpace = 1152921504606846976.0

  /** One-row KMV distinct-count sketch of `key`: (n_seen, kth_min,
    * estimate). With fewer than k distinct hashes the sketch is exact;
    * otherwise estimate = (k-1) / (kth_min / 2^60), the classic KMV
    * estimator (Bar-Yossef et al. 2002), relative error ~ 1/sqrt(k).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(Dedup.portableHash64(key.cast(StringType)).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
      .agg(count(lit(1)).as("n"), max("h").as("kth"))
      .select(
        when(col("n") < k, col("n").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble * HashSpace) / col("kth").cast(DoubleType))
          .as("estimate"),
        col("n"),
        col("kth"))

  /** DuckDB image of [[kmvDistinct]] as a scalar-producing subquery pair;
    * interpolate into oracle SQL. `expr` must already be VARCHAR.
    */
  def kmvOracleSql(table: String, expr: String, k: Int): String =
    s"""(WITH hs AS (SELECT DISTINCT CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT) AS h FROM $table),
       |  ks AS (SELECT h FROM hs ORDER BY h LIMIT $k),
       |  s AS (SELECT COUNT(*) AS n, MAX(h) AS kth FROM ks)
       |  SELECT CASE WHEN n < $k THEN CAST(n AS DOUBLE)
       |    ELSE (${(k - 1).toDouble} * $HashSpace) / CAST(kth AS DOUBLE) END FROM s)""".stripMargin

  /** Count-min sketch over `key` (depth rows × width buckets, portable
    * hashes): returns the bounded cell table `(d, b, c)` — depth*width
    * rows no matter the stream size, the fixed-memory frequency summary
    * a streaming pipeline maintains. Deterministic given the hash, so
    * DuckDB reproduces every cell (and therefore every estimate) exactly.
    */
  def cmsCells(df: DataFrame, key: Column, depth: Int, width: Long): DataFrame =
    df.select(
        posexplode(array((0 until depth).map(dd =>
          pmod(
            Dedup.portableHash64(concat(lit(dd), lit(":"), key.cast(StringType))),
            lit(width))): _*)).as(Seq("d", "b")))
      .groupBy("d", "b")
      .agg(count(lit(1)).as("c"))

  /** CMS cell table from a pre-aggregated (key, weight) frequency table —
    * cell-identical to [[cmsCells]] over the raw stream (the sum of a
    * key's weight into cell (d, h_d(k)) equals its row count), but the
    * per-key hash work runs once per DISTINCT key instead of once per
    * row. This is how a BATCH engine should build a sketch: the groupBy
    * pre-aggregation is map-side-combined anyway, and under the
    * heavy-hitter skew that motivates a CMS, distinct keys are orders of
    * magnitude fewer than rows (sf1: 3 hashes x 6M rows -> 3 x 206k).
    * The per-row [[cmsCells]] stays as the shape a STREAM arrives in
    * (graft.streaming keeps bounded cell state from it).
    */
  def cmsCellsWeighted(
      freq: DataFrame,
      key: Column,
      weight: Column,
      depth: Int,
      width: Long): DataFrame =
    freq.select(
        weight.as("w"),
        posexplode(array((0 until depth).map(dd =>
          pmod(
            Dedup.portableHash64(concat(lit(dd), lit(":"), key.cast(StringType))),
            lit(width))): _*)).as(Seq("d", "b")))
      .groupBy("d", "b")
      .agg(sum("w").cast(LongType).as("c"))

  /** Point-estimate frequencies for `candidates` against a CMS cell
    * table: est(k) = min over rows of cell(d, h_d(k)) — the classic
    * Cormode–Muthukrishnan upper bound. One equi-join against the
    * bounded cell table (broadcastable: depth*width rows), never a
    * second pass over the stream.
    */
  def cmsEstimate(
      candidates: DataFrame,
      key: Column,
      cells: DataFrame,
      depth: Int,
      width: Long): DataFrame =
    candidates
      .select(
        key.as("k"),
        posexplode(array((0 until depth).map(dd =>
          pmod(
            Dedup.portableHash64(concat(lit(dd), lit(":"), key.cast(StringType))),
            lit(width))): _*)).as(Seq("d", "b")))
      .join(cells, Seq("d", "b"))
      .groupBy("k")
      .agg(min("c").cast(LongType).as("cms_est"))
}
