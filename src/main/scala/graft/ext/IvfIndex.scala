package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) ANN index pieces (SURVEY.md §2B X3): k-means
  * centroid training via Lloyd's iterations and cell assignment, all
  * joins + aggregations — no UDFs, no driver-side math.
  *
  * Scale posture: training assignment runs over a deterministic SAMPLE
  * (`idCol % sampleStride == 0`), so per-iteration cost is
  * O(|sample| * k) regardless of corpus size; only the final index
  * assignment touches every vector once (inherent to building an IVF
  * index — this is the standard train-on-sample/assign-all split).
  * Centroids are broadcast (k * dim doubles), never shuffled.
  *
  * Determinism contract (the oracle hash-compares trained results):
  * centroid updates sum components as ROUND(x * 1e6) BIGINTs — integer
  * addition is order-independent, so the mean (sum/cnt/1e6 in double
  * space) is bit-identical across engines and partitionings, unlike a
  * raw double SUM. Quantizing the mean to 1e-6 loses nothing real: the
  * inputs are float32 embeddings with ~7 significant digits.
  */
object IvfIndex {

  /** SCALE BOUNDARY, measured (BENCH_sf10.md round-7): assignment scores
    * every (vector, cell) pair, so with the n/256 cell rule the build
    * pass is O(n²/256) — sim_topk_ivf ran 19.7× for 10× data at
    * sf1→sf10. Past ~1e6 vectors the design needs a coarse-quantizer
    * front (two-level assignment, n·√k — the IMI/IVF-HNSW move); the
    * flat codebook is kept here because it is the recall-correct choice
    * on the driver's bounded, measured-isotropic embeddings corpus, and
    * audits that do not need index parity (silhouette_cells) already
    * run on a fixed small codebook instead.
    *
    * Cell count targeting ~256 vectors per cell (min 8 cells). With
    * probes fixed (default 5), per-query candidate work is ~probes*256
    * vectors at ANY corpus size — the index grows cells, not cell size.
    * Chosen empirically against this corpus: the synthetic embeddings are
    * ISOTROPIC (measured: median pairwise cos ~0.001, top-3 neighbor cos
    * ~0.4 — pairwise-close points, no cluster structure), which is the
    * worst case for any partition-pruning ANN; finer grids (sqrt(n)
    * cells) dropped recall@3 to 0.33 at sf0.1, while 256-vector cells
    * with probe-5 hold 0.87. Real embedding corpora cluster, where the
    * same machinery prunes far harder; k and probes are explicit
    * parameters for that reason. Integer-only arithmetic — no
    * ceil(sqrt()) floating-point edge to mirror.
    */
  def cellCount(n: Long): Long = math.max(8L, n / 256L)

  /** Query-time probe count paired with [[cellCount]]. */
  val DefaultProbes = 5

  /** Rank of each (vector, centroid) pair per vector: 1 = nearest. */
  private def ranked(vec: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("__vid").orderBy(desc("cos_c"), asc("cid"))
    vec
      .crossJoin(broadcast(cent))
      .withColumn("cos_c", Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rk_c", row_number().over(w))
  }

  /** Lloyd's k-means over `vec` (columns: idCol, v: array<double>,
    * nrm: double; ids assumed ~dense in [0, n)). Callers size k with
    * [[cellCount]] (max(8, n/256) — chosen over sqrt(n), whose cells
    * measured far worse recall on this corpus; see cellCount's doc);
    * init = stride sampling over the id space (`idCol % (n/k) == 0`);
    * `iters` update rounds over the <=1024-vector training sample.
    * Returns (cid, cv, cn). Cells that lose all sample members disappear
    * (mirrored by the oracle).
    */
  def trainCentroids(
      vec: DataFrame,
      idCol: String,
      dim: Int,
      n: Long,
      iters: Int): DataFrame =
    trainCentroidsK(vec, idCol, dim, n, cellCount(n), iters)

  /** As [[trainCentroids]] with an explicit cell count. */
  def trainCentroidsK(
      vec: DataFrame,
      idCol: String,
      dim: Int,
      n: Long,
      k: Long,
      iters: Int): DataFrame = {
    val stride = math.max(1L, n / k)
    val sampleStride = math.max(1L, n / 1024)
    var cent = vec
      .filter(col(idCol) % stride === 0)
      .select((col(idCol) / stride).cast(LongType).as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // materialize the bounded (~1024-row) training sample ONCE: every
    // Lloyd iteration joins against it, and iteration i's centroid plan
    // nests iteration i-1's whole DAG — without truncation each pass
    // re-reads and re-transforms the full vector scan per iteration
    val sample = vec.filter(col(idCol) % sampleStride === 0)
      .withColumnRenamed(idCol, "__vid")
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = ranked(sample, cent)
        .filter(col("rk_c") === 1)
        .select(col("cid"), col("v"))
      val sums = (0 until dim).map(i =>
        sum(round(get(col("v"), lit(i)) * 1e6).cast(LongType)).as(s"s$i")) :+
        count(lit(1)).as("cnt")
      val aggd = assigned.groupBy("cid").agg(sums.head, sums.tail: _*)
      val cxs = (0 until dim).map(i =>
        col(s"s$i").cast(DoubleType) / col("cnt").cast(DoubleType) / 1e6)
      cent = aggd
        .select(col("cid"), array(cxs: _*).as("cv"))
        .withColumn("cn", Vectors.l2Norm(col("cv")))
    }
    cent
  }

  /** Materialize trained centroids as a local-relation "model" (bounded:
    * k rows of dim doubles — the IVF analogue of a fitted KMeans model
    * object). Evaluates the training DAG exactly once; downstream
    * assignment plans stay shallow and the broadcast ships a
    * LocalRelation instead of re-running training per consumer.
    */
  def materialize(s: org.apache.spark.sql.SparkSession, cent: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(cent.collect().toSeq.asJava, cent.schema)
  }

  /** Assign every vector to its `probes` nearest cells (probes=1 builds
    * the index; probes>1 is multi-probe query expansion). Output:
    * idCol, cell, v, nrm — one row per (vector, probed cell).
    */
  def assignCells(vec: DataFrame, idCol: String, cent: DataFrame, probes: Int): DataFrame =
    ranked(vec.withColumnRenamed(idCol, "__vid"), cent)
      .filter(col("rk_c") <= probes)
      .select(col("__vid").as(idCol), col("cid").as("cell"), col("v"), col("nrm"))

  /** DuckDB image of the whole train+assign pipeline, generated so the
    * oracle replays the identical iterations. `m` must be a CTE named
    * `m(vec_id, v, nrm)`; emits CTE clauses ending with `cent(cid, cv,
    * cn)` and `asg(vec_id, cell, v, nrm)` (probes=1) /
    * `qasg` (probes=`probes`).
    */
  def oracleCtes(dim: Int, iters: Int, probes: Int): String =
    oracleCtes(dim, iters, probes, None)

  /** As the 3-arg form; `kFixed` pins the cell count instead of the
    * n/256 sizing rule — the audit-lane variant (silhouette_cells uses a
    * FIXED 64-cell codebook so the audit stays O(n·64) at any corpus
    * size, where the index's own n/256 rule makes assignment O(n²/256)
    * — measured 16.5× for 10× data at sf1→sf10).
    */
  def oracleCtes(dim: Int, iters: Int, probes: Int, kFixed: Option[Long]): String = {
    val sums = (0 until dim)
      .map(i => s"SUM(CAST(round(v[${i + 1}] * 1000000.0) AS BIGINT)) AS s$i")
      .mkString(", ")
    val cxs = (0 until dim)
      .map(i => s"CAST(s$i AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0")
      .mkString(", ")
    def assignSql(cent: String, name: String, keep: String) =
      s"""$name AS (SELECT vec_id, cid AS cell, v, nrm FROM (
         |  SELECT m.vec_id, c.cid, m.v, m.nrm,
         |    ROW_NUMBER() OVER (PARTITION BY m.vec_id
         |      ORDER BY list_dot_product(m.v, c.cv) / (m.nrm * c.cn) DESC, c.cid) AS rk
         |  FROM m CROSS JOIN $cent c) WHERE rk <= $keep)""".stripMargin
    val kExpr = kFixed.map(_.toString).getOrElse("greatest(8, COUNT(*) // 256)")
    val init =
      s"""params AS (SELECT COUNT(*) AS n, $kExpr AS k FROM m),
         |strv AS (SELECT greatest(1, n // k) AS stride, greatest(1, n // 1024) AS sstride FROM params),
         |c0 AS (SELECT vec_id // (SELECT stride FROM strv) AS cid, v AS cv, nrm AS cn FROM m
         |  WHERE vec_id % (SELECT stride FROM strv) = 0),
         |samp AS (SELECT * FROM m WHERE vec_id % (SELECT sstride FROM strv) = 0)""".stripMargin
    val iterSql = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (SELECT cid, v FROM (
         |  SELECT s.vec_id, c.cid, s.v,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |      ORDER BY list_dot_product(s.v, c.cv) / (s.nrm * c.cn) DESC, c.cid) AS rk
         |  FROM samp s CROSS JOIN $prev c) WHERE rk = 1),
         |g$it AS (SELECT cid, COUNT(*) AS cnt, $sums FROM a$it GROUP BY cid),
         |c$it AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
         |  SELECT cid, [$cxs] AS cv FROM g$it))""".stripMargin
    }.mkString(",\n")
    val finals =
      s"""cent AS (SELECT cid, cv, cn FROM c$iters),
         |${assignSql("cent", "asg", "1")},
         |${assignSql("cent", "qasg", probes.toString)}""".stripMargin
    s"$init,\n$iterSql,\n$finals"
  }
}
