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

  /** SCALE NOTE (the round-7 measured boundary, now closed): FLAT
    * assignment scores every (vector, cell) pair, so with the n/256 cell
    * rule the build pass was O(n²/256) — sim_topk_ivf measured 19.7× for
    * 10× data at sf1→sf10. [[assignCells]] now routes through a COARSE
    * QUANTIZER (two-level assignment: score √k super-cells, then only the
    * probed super-cells' children — the IMI/IVF-HNSW move every
    * production ANN system makes), cutting assignment to O(n·√k).
    * With corpus-proportional cells that is still O(n^1.5) total — the
    * next rung past ~1e8 vectors is a log-depth coarse front (HNSW/tree)
    * over the same routing contract; recorded here as the next design
    * boundary rather than silently shipped.
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

  /** Coarse-quantizer size over k fine cells: √k super-cells (min 4), the
    * point that balances the two stages of two-level assignment (score g
    * coarse + probed children ≈ g + cp·k/g, minimized near g = √k).
    * Integer-only: floor of an exactly-rounded IEEE sqrt, mirrored by the
    * oracle as `greatest(4, CAST(floor(sqrt(...)) AS BIGINT))`.
    */
  def coarseCount(k: Long): Long = math.max(4L, math.sqrt(k.toDouble).toLong)

  /** Coarse probes paired with [[coarseCount]]: how many super-cells a
    * vector consults before the fine ranking. Swept against this corpus's
    * measured isotropy (tools/IvfSweep, round 8): cp=4 measures recall@3
    * = 0.867 at sf0.1 (= flat exactly — g=4 there, so routing is
    * exhaustive at driver SFs) and 0.367 at sf1 where routing is real
    * (cp=4 of 9 super-cells) — the SAME value the exhaustive cp=6 sweep
    * point reads, i.e. routing loses nothing beyond the fixed-probes/
    * growing-k decay the flat index already had (probes=5 of 78 cells at
    * sf1; isotropy makes that decay inherent — IvfIndex scaladoc).
    * Per-vector assignment work: (1+cp)·√k instead of k.
    */
  val DefaultCoarseProbes = 4

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

  /** Build the coarse quantizer over a MATERIALIZED fine codebook `cent`
    * (cid, cv, cn): pick every ⌊k/g⌋-th fine centroid (by cid rank — the
    * stride-init move, pure integer picks so both engines choose the
    * same rows) as the g = [[coarseCount]](k) super-centroids, then map
    * every fine cell to its nearest super-cell by cosine (k×g pairs —
    * bounded model-side work, never corpus-side). Returns
    * (centS = cent + its `sid` parent, coarse = (sid, gv, gn)), both
    * re-materialized as local relations so assignment plans broadcast
    * bounded models instead of re-running this derivation.
    */
  def coarsen(
      s: org.apache.spark.sql.SparkSession,
      cent: DataFrame): (DataFrame, DataFrame) = {
    val rows = cent.collect().sortBy(_.getLong(0)) // by cid — cent is a bounded local relation
    val k = rows.length.toLong
    val g = coarseCount(k)
    val cstride = math.max(1L, k / g)
    val coarseRows = rows.zipWithIndex.collect {
      case (r, i) if i % cstride == 0 =>
        org.apache.spark.sql.Row(i / cstride, r.get(1), r.get(2))
    }
    val coarseSchema = StructType(Seq(
      StructField("sid", LongType, nullable = false),
      StructField("gv", cent.schema("cv").dataType),
      StructField("gn", DoubleType)))
    import scala.jdk.CollectionConverters._
    val coarse = s.createDataFrame(coarseRows.toSeq.asJava, coarseSchema)
    // fine → coarse parent by cosine (tie: lowest sid) — the same
    // expression machinery as every other cosine here, so the oracle's
    // list_dot_product replay is bit-identical
    val wm = Window.partitionBy("cid").orderBy(desc("cos_s"), asc("sid"))
    val centS = cent
      .crossJoin(broadcast(coarse))
      .withColumn("cos_s", Vectors.dot(col("cv"), col("gv")) / (col("cn") * col("gn")))
      .withColumn("rk_s", row_number().over(wm))
      .filter(col("rk_s") === 1)
      .select("cid", "cv", "cn", "sid")
    (materialize(s, centS), coarse)
  }

  /** Assign every vector to its `probes` nearest cells (probes=1 builds
    * the index; probes>1 is multi-probe query expansion). Output:
    * idCol, cell, v, nrm — one row per (vector, probed cell).
    *
    * TWO-LEVEL: each vector first ranks the g ≈ √k super-centroids and
    * keeps its [[DefaultCoarseProbes]] nearest super-cells, then ranks
    * only THOSE super-cells' fine children — O(n·√k) scored pairs
    * instead of the flat O(n·k) that measured 19.7×/decade in round 7.
    * Both ranking windows run over NARROW (id, cell, cos) rows — the
    * 64-dim vector never rides a shuffle; it is re-attached by one keyed
    * join at the end. The probed-children rank is over a REDUCED
    * candidate set, so a routing miss loses that cell — the same
    * recall-for-cost trade as the fine probes themselves, swept and
    * mirrored exactly by the oracle.
    */
  def assignCells(vec: DataFrame, idCol: String, cent: DataFrame, probes: Int): DataFrame = {
    val (centS, coarse) = coarsen(vec.sparkSession, cent)
    assignCellsTwoLevel(vec, idCol, centS, coarse, DefaultCoarseProbes, probes)
  }

  /** As [[assignCells]] with an explicit pre-[[coarsen]]ed model and
    * coarse probe count — call sites that assign twice (corpus build +
    * query expansion) coarsen once and share the model.
    */
  def assignCellsTwoLevel(
      vec: DataFrame,
      idCol: String,
      centS: DataFrame,
      coarse: DataFrame,
      coarseProbes: Int,
      probes: Int): DataFrame = {
    val v0 = vec.withColumnRenamed(idCol, "__vid")
    val wg = Window.partitionBy("__vid").orderBy(desc("cos_g"), asc("sid"))
    val route = v0
      .crossJoin(broadcast(coarse))
      .withColumn("cos_g", Vectors.dot(col("v"), col("gv")) / (col("nrm") * col("gn")))
      .select(col("__vid"), col("sid"), col("cos_g"))
      .withColumn("rk_g", row_number().over(wg))
      .filter(col("rk_g") <= coarseProbes)
      .select("__vid", "sid")
    val wc = Window.partitionBy("__vid").orderBy(desc("cos_c"), asc("cid"))
    val picked = route
      .join(v0.select(col("__vid"), col("v"), col("nrm")), Seq("__vid"))
      .join(broadcast(centS), Seq("sid"))
      .withColumn("cos_c", Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .select(col("__vid"), col("cid"), col("cos_c"))
      .withColumn("rk_c", row_number().over(wc))
      .filter(col("rk_c") <= probes)
      .select(col("__vid"), col("cid").as("cell"))
    picked
      .join(v0.select(col("__vid"), col("v"), col("nrm")), Seq("__vid"))
      .select(col("__vid").as(idCol), col("cell"), col("v"), col("nrm"))
  }

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
    // two-level assignment, the [[assignCellsTwoLevel]] mirror: route each
    // vector to its DefaultCoarseProbes nearest super-cells, then rank only
    // those super-cells' fine children
    def assignSql(name: String, keep: String) =
      s"""${name}r AS (SELECT vec_id, sid FROM (
         |  SELECT m.vec_id, c.sid,
         |    ROW_NUMBER() OVER (PARTITION BY m.vec_id
         |      ORDER BY list_dot_product(m.v, c.gv) / (m.nrm * c.gn) DESC, c.sid) AS rk
         |  FROM m CROSS JOIN co c) WHERE rk <= $DefaultCoarseProbes),
         |$name AS (SELECT vec_id, cid AS cell, v, nrm FROM (
         |  SELECT m.vec_id, f.cid, m.v, m.nrm,
         |    ROW_NUMBER() OVER (PARTITION BY m.vec_id
         |      ORDER BY list_dot_product(m.v, f.cv) / (m.nrm * f.cn) DESC, f.cid) AS rk
         |  FROM ${name}r r JOIN m ON m.vec_id = r.vec_id
         |  JOIN fmap f ON f.sid = r.sid) WHERE rk <= $keep)""".stripMargin
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
    // coarse quantizer over the fine codebook ([[coarsen]] mirror):
    // strided picks by cid rank (pure integer choices), then each fine
    // cell's nearest super-cell by cosine
    val coarseSql =
      s"""crk AS (SELECT cid, cv, cn,
         |    ROW_NUMBER() OVER (ORDER BY cid) - 1 AS r FROM cent),
         |cprm AS (SELECT greatest(4, CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS g,
         |    COUNT(*) AS kk FROM cent),
         |cstrv AS (SELECT greatest(1, kk // g) AS cstride FROM cprm),
         |co AS (SELECT r // (SELECT cstride FROM cstrv) AS sid, cv AS gv, cn AS gn
         |  FROM crk WHERE r % (SELECT cstride FROM cstrv) = 0),
         |fmap AS (SELECT cid, cv, cn, sid FROM (
         |  SELECT f.cid, f.cv, f.cn, c.sid,
         |    ROW_NUMBER() OVER (PARTITION BY f.cid
         |      ORDER BY list_dot_product(f.cv, c.gv) / (f.cn * c.gn) DESC, c.sid) AS rk
         |  FROM cent f CROSS JOIN co c) WHERE rk = 1)""".stripMargin
    val finals =
      s"""cent AS (SELECT cid, cv, cn FROM c$iters),
         |$coarseSql,
         |${assignSql("asg", "1")},
         |${assignSql("qasg", probes.toString)}""".stripMargin
    s"$init,\n$iterSql,\n$finals"
  }
}
