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

  /** Equi-width histogram quantile sketch: bounded-state quantile
    * estimation in TWO scans (min/max/count, then bucket counts) — the
    * batch shape of a streaming histogram. Spark's own KLL
    * (`approx_percentile`) stays first choice inside a pure-Spark
    * pipeline, but its estimates are implementation-specific; this
    * sketch is deterministic given only (min, max, k), so DuckDB
    * reproduces every bucket count AND every interpolated estimate
    * bit-for-bit and the estimator itself is hash-checked.
    *
    * Estimate: the classic within-bucket linear interpolation
    * `mn + (b + (q·n − cum_below)/c_b)·(mx−mn)/k` at the first bucket
    * whose cumulative count reaches q·n. Error ≤ one bucket width by
    * construction ((mx−mn)/k) — checked against exact percentiles in
    * SketchSpec. All post-scan state is O(k): the cumulative table is a
    * bounded self-join (no single-partition window), the quantile probe
    * a bounded broadcast join.
    */
  def histQuantiles(df: DataFrame, v: Column, k: Int, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(v.cast(DoubleType).as("x")).filter(col("x").isNotNull)
    val stats = vals.agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("n"))
    val bucketed = vals
      .crossJoin(broadcast(stats))
      .select(
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(
            floor(((col("x") - col("mn")) * lit(k)) / (col("mx") - col("mn"))),
            lit((k - 1).toLong)))
          .cast(IntegerType)
          .as("b"))
    val hist = bucketed.groupBy("b").agg(count(lit(1)).as("c"))
    // cumulative counts over ≤k rows: bounded self-join, not a
    // no-partition window (which would serialize on one reducer)
    val h2 = hist.select(col("b").as("b2"), col("c").as("c2"))
    val cum = hist
      .join(broadcast(h2), col("b2") <= col("b"))
      .groupBy("b", "c")
      .agg(sum("c2").as("cum"))
    val qdf = qs.toDF("q")
    val targets = qdf
      .crossJoin(broadcast(stats))
      .select(col("q"), (col("q") * col("n")).as("target"), col("mn"), col("mx"))
    val hit = targets
      .join(broadcast(cum), col("cum") >= col("target"))
      .groupBy("q", "target", "mn", "mx")
      .agg(min("b").as("b"))
      .join(broadcast(cum), Seq("b"))
    hit
      .select(
        col("q"),
        (col("mn") +
          ((col("b").cast(DoubleType) +
            (col("target") - (col("cum") - col("c")).cast(DoubleType)) /
              col("c").cast(DoubleType)) *
            ((col("mx") - col("mn")) / lit(k.toDouble)))).as("est"),
        col("b").as("bucket"),
        col("cum").cast(LongType).as("cum"))
      .orderBy("q")
  }

  /** Streaming-compatible histogram cells: bucket counts against FIXED
    * bounds (the production streaming choice — bounds come from a
    * calibration pass or domain knowledge, because a one-pass stream
    * cannot see its own min/max before bucketing). The cell table is a
    * plain `groupBy(b).count()`, so under Structured Streaming the state
    * store holds AT MOST k+2 counters forever — same merge property that
    * makes the CMS streamable; out-of-range values clamp into the edge
    * buckets. [[histQuantiles]] stays the batch shape with data-driven
    * bounds; interpolation over these cells works identically once the
    * bounds are known.
    */
  def histCellsFixed(df: DataFrame, v: Column, k: Int, mn: Double, mx: Double): DataFrame = {
    require(mx > mn, s"histCellsFixed needs a non-degenerate range, got [$mn, $mx]")
    df.select(v.cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .select(
        greatest(
          least(
            floor(((col("x") - lit(mn)) * lit(k)) / lit(mx - mn)),
            lit((k - 1).toLong)),
          lit(0L))
          .cast(IntegerType)
          .as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"))
  }

  /** DuckDB image of [[histQuantiles]] — expression-for-expression the
    * same double math, so estimates match bit-for-bit. `expr` is the
    * value column, `qsSql` a VALUES list like "(0.25),(0.5)".
    */
  def histQuantilesOracleSql(table: String, expr: String, k: Int, qsSql: String): String =
    s"""WITH vals AS (SELECT CAST($expr AS DOUBLE) AS x FROM $table WHERE $expr IS NOT NULL),
       |stats AS (SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n FROM vals),
       |bkt AS (SELECT CASE WHEN mx = mn THEN 0
       |  ELSE CAST(LEAST(FLOOR(((x - mn) * $k) / (mx - mn)), ${k - 1}) AS INT) END AS b
       |  FROM vals, stats),
       |hist AS (SELECT b, COUNT(*) AS c FROM bkt GROUP BY b),
       |cum AS (SELECT h1.b, h1.c, SUM(h2.c) AS cum FROM hist h1
       |        JOIN hist h2 ON h2.b <= h1.b GROUP BY h1.b, h1.c),
       |qs(q) AS (VALUES $qsSql),
       |tgt AS (SELECT q, q * n AS target, mn, mx FROM qs, stats),
       |hit AS (SELECT q, target, mn, mx, MIN(b) AS b FROM tgt
       |        JOIN cum ON cum.cum >= tgt.target GROUP BY q, target, mn, mx)
       |SELECT q,
       |  mn + ((CAST(b AS DOUBLE) +
       |    (target - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE)) *
       |    ((mx - mn) / ${k.toDouble})) AS est,
       |  b AS bucket, CAST(cum AS BIGINT) AS cum
       |FROM hit JOIN cum USING (b) ORDER BY q""".stripMargin

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
