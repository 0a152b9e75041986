package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) index pieces (SURVEY.md §2B X3 — the
  * memory-compression ANN path): each `dim`-dim vector is split into `m`
  * subspaces of `subDim` dims, every subspace gets its own codebook of
  * ~`k` centroids (Lloyd's iterations, L2 metric), and a vector is stored
  * as `m` small integer codes — 64 floats (256 B) become 8 codes (8 B), a
  * 32x compression that is what lets a 10^11-vector index stay RAM-resident
  * on a cluster. Query-time scoring is the classic ADC (asymmetric
  * distance computation): the query builds a (subspace, code) -> dot
  * lookup table of m*k entries, and candidate scores are ONE equi-join of
  * the codes table against that LUT plus an integer SUM — no full vectors
  * are touched until the final shortlist re-rank.
  *
  * All subspaces train in ONE keyed k-means DAG (subspace id `s` is a
  * grouping key, not a loop): one broadcast-hash join per iteration, one
  * groupBy — the plan does not grow with m.
  *
  * Determinism contract (the oracle replays training bit-for-bit, see
  * [[IvfIndex]] for the same trick): centroid component sums are
  * ROUND(x*1e6) BIGINTs (order-independent integer addition); L2
  * ranking uses dist^2 = xx - 2.0*xc + cc where each term is a left-fold
  * dot product, so the double bits agree cross-engine; ties break on cid.
  * ADC scores are floor(dot*1e6) BIGINTs, so the shortlist SUM is
  * order-independent too.
  */
object PqIndex {

  /** Explode vectors (idCol, v: array<double>) into per-subspace rows
    * (idCol, s, sv, xx) — sv is the `subDim`-wide slice, xx its squared
    * norm (hoisted once; every L2 ranking below reuses it).
    */
  def subVectors(vec: DataFrame, idCol: String, m: Int, subDim: Int): DataFrame =
    vec
      .select(
        col(idCol),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), slice(col("v"), s * subDim + 1, subDim).as("sv"))): _*)).as("sub"))
      .select(col(idCol), col("sub.s").as("s"), col("sub.sv").as("sv"))
      .withColumn("xx", Vectors.dot(col("sv"), col("sv")))

  /** Rank codebook rows per (s, vector): 1 = nearest by L2. The codebook
    * is broadcast (m*k rows of subDim doubles — the bounded model) and the
    * join is an equi-join on the subspace key.
    */
  private def rankedL2(sub: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy("s", "__vid").orderBy(asc("dist2"), asc("cid"))
    sub
      .join(broadcast(cb), Seq("s"))
      .withColumn("xc", Vectors.dot(col("sv"), col("cv")))
      .withColumn("dist2", col("xx") - lit(2.0) * col("xc") + col("cc"))
      .withColumn("rk_c", row_number().over(w))
  }

  /** Keyed Lloyd's over the sub-vector table (columns idCol, s, sv, xx;
    * ids assumed ~dense in [0, n)). Init = stride sampling over the id
    * space (same rule in every subspace); `iters` update rounds over a
    * <=1024-vector sample. Returns (s, cid, cv, cc). Codebook cells that
    * lose all sample members disappear (mirrored by the oracle).
    */
  def trainCodebooks(
      sub: DataFrame,
      idCol: String,
      subDim: Int,
      n: Long,
      k: Long,
      iters: Int): DataFrame = {
    val stride = math.max(1L, n / k)
    val sampleStride = math.max(1L, n / 1024)
    var cb = sub
      .filter(col(idCol) % stride === 0)
      .select(col("s"), (col(idCol) / stride).cast(LongType).as("cid"), col("sv").as("cv"))
      .withColumn("cc", Vectors.dot(col("cv"), col("cv")))
    // bounded sample (~1024 ids × m subspaces), materialized once — same
    // lineage-truncation move as IvfIndex.trainCentroidsK: the per-
    // iteration codebook plan otherwise nests the full subvector
    // explode-scan once per Lloyd pass
    val sample = sub.filter(col(idCol) % sampleStride === 0)
      .withColumnRenamed(idCol, "__vid")
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = rankedL2(sample, cb)
        .filter(col("rk_c") === 1)
        .select(col("s"), col("cid"), col("sv"))
      val sums = (0 until subDim).map(i =>
        sum(round(get(col("sv"), lit(i)) * 1e6).cast(LongType)).as(s"c$i")) :+
        count(lit(1)).as("cnt")
      val aggd = assigned.groupBy("s", "cid").agg(sums.head, sums.tail: _*)
      val cxs = (0 until subDim).map(i =>
        col(s"c$i").cast(DoubleType) / col("cnt").cast(DoubleType) / 1e6)
      cb = aggd
        .select(col("s"), col("cid"), array(cxs: _*).as("cv"))
        .withColumn("cc", Vectors.dot(col("cv"), col("cv")))
    }
    cb
  }

  /** Quantize every vector: (idCol, s, code) — the 8-byte-per-vector
    * representation.
    *
    * NOT the [[rankedL2]] join-then-rank shape: that materializes
    * |subvectors|·k rows through a row_number window (256M rows at sf10 —
    * measured 180 s, the whole query's superlinearity). Instead the
    * codebook collapses to ONE row per subspace carrying all k candidates
    * as an array, and the nearest cell is `array_min` over a
    * transform-scored struct array — struct ordering is (dist2, cid), so
    * the pick is EXACTLY the window's (dist2 asc, cid asc) rank-1 row,
    * with identical double arithmetic (same left-fold dot). One broadcast
    * join at |subvectors| rows, zero exchanges, whole-stage codegen
    * end-to-end.
    */
  def encode(sub: DataFrame, idCol: String, cb: DataFrame): DataFrame = {
    val cbArr = cb
      .groupBy("s")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv"), col("cc")))).as("cands"))
    sub
      .join(broadcast(cbArr), Seq("s"))
      .withColumn(
        "code",
        array_min(transform(col("cands"), c =>
          struct(
            (col("xx") - lit(2.0) * Vectors.dot(col("sv"), c.getField("cv")) + c.getField("cc"))
              .as("dist2"),
            c.getField("cid").as("cid")))).getField("cid"))
      .select(col(idCol), col("s"), col("code"))
  }

  /** Quantize every vector in ONE projection row per vector: (idCol,
    * codes) with `codes[s]` = nearest cell of subspace s. The whole
    * codebook (m·k rows) collapses to a single broadcast row; each
    * subspace's pick is the same `array_min` struct-ordering argmin as
    * [[encode]] over the same dist2 doubles — no subvector explode at
    * all, so the scoring input for ADC stays |vectors| rows.
    */
  def encodeWide(vec: DataFrame, idCol: String, vCol: String, m: Int, subDim: Int, cb: DataFrame): DataFrame = {
    // one broadcast row: cands[s] = that subspace's candidate array,
    // assembled on the 1-row side so the per-data-row work is lookups only
    val all = cb
      .groupBy()
      .agg(sort_array(collect_list(struct(col("s"), col("cid"), col("cv"), col("cc")))).as("__allc"))
      .select(transform(
        sequence(lit(0), lit(m - 1)),
        s => filter(col("__allc"), c => c.getField("s") === s)).as("__cands"))
    // Every value the candidate lambda touches is a LAMBDA VARIABLE
    // (bound once per element), never a re-evaluated subexpression:
    // slices bind through the outer transform (one slice + one self-dot
    // per subspace), candidates through zip_with. A column-reference
    // formulation measured 2.3× slower at sf1 — Catalyst inlines
    // projected columns into HOF lambdas, re-slicing per candidate.
    val svs = transform(
      array((0 until m).map(s => slice(col(vCol), s * subDim + 1, subDim)): _*),
      p => struct(p.as("sv"), Vectors.dot(p, p).as("xx")))
    vec
      .crossJoin(broadcast(all))
      .select(
        col(idCol),
        zip_with(
          svs,
          col("__cands"),
          (pv, cands) =>
            array_min(transform(
              cands,
              c =>
                struct(
                  (pv.getField("xx") - lit(2.0) * Vectors.dot(pv.getField("sv"), c.getField("cv")) +
                    c.getField("cc")).as("dist2"),
                  c.getField("cid").as("cid")))).getField("cid")).as("codes"))
  }

  /** DuckDB image of subspace-split + train + encode. `m` must be a CTE
    * named `m(vec_id, v, nrm)`; emits clauses ending with
    * `cent(s, cid, cv, cc)` and `codes(vec_id, s, code)`, plus `subx`
    * (vec_id, s, sv, xx) for query-side LUT building.
    */
  def oracleCtes(m: Int, subDim: Int, k: Long, iters: Int): String = {
    val svals = (0 until m).mkString(", ")
    val sums = (0 until subDim)
      .map(i => s"SUM(CAST(round(sv[${i + 1}] * 1000000.0) AS BIGINT)) AS c$i")
      .mkString(", ")
    val cxs = (0 until subDim)
      .map(i => s"CAST(c$i AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0")
      .mkString(", ")
    def rankSql(src: String, cbName: String, out: String, keepCols: String) =
      s"""$out AS (SELECT $keepCols FROM (
         |  SELECT x.vec_id, x.s, c.cid, x.sv,
         |    ROW_NUMBER() OVER (PARTITION BY x.s, x.vec_id
         |      ORDER BY x.xx - 2.0 * list_dot_product(x.sv, c.cv) + c.cc, c.cid) AS rk
         |  FROM $src x JOIN $cbName c ON x.s = c.s) WHERE rk = 1)""".stripMargin
    val init =
      s"""pqparams AS (SELECT COUNT(*) AS n FROM m),
         |pqstrv AS (SELECT greatest(1, n // $k) AS stride, greatest(1, n // 1024) AS sstride FROM pqparams),
         |subx AS (SELECT vec_id, t.s AS s,
         |    v[(t.s * $subDim + 1):(t.s * $subDim + $subDim)] AS sv,
         |    list_dot_product(v[(t.s * $subDim + 1):(t.s * $subDim + $subDim)],
         |                     v[(t.s * $subDim + 1):(t.s * $subDim + $subDim)]) AS xx
         |  FROM m, (SELECT unnest([$svals]) AS s) t),
         |cb0 AS (SELECT s, vec_id // (SELECT stride FROM pqstrv) AS cid, sv AS cv,
         |    list_dot_product(sv, sv) AS cc
         |  FROM subx WHERE vec_id % (SELECT stride FROM pqstrv) = 0),
         |pqsamp AS (SELECT * FROM subx WHERE vec_id % (SELECT sstride FROM pqstrv) = 0)""".stripMargin
    val iterSql = (1 to iters).map { it =>
      val prev = s"cb${it - 1}"
      s"""${rankSql("pqsamp", prev, s"pa$it", "s, cid, sv")},
         |pg$it AS (SELECT s, cid, COUNT(*) AS cnt, $sums FROM pa$it GROUP BY s, cid),
         |cb$it AS (SELECT s, cid, cv, list_dot_product(cv, cv) AS cc FROM (
         |  SELECT s, cid, [$cxs] AS cv FROM pg$it))""".stripMargin
    }.mkString(",\n")
    val finals =
      s"""cent AS (SELECT s, cid, cv, cc FROM cb$iters),
         |${rankSql("subx", "cent", "codes_r", "vec_id, s, cid")},
         |codes AS (SELECT vec_id, s, cid AS code FROM codes_r)""".stripMargin
    s"$init,\n$iterSql,\n$finals"
  }
}
