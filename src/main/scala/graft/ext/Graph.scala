package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components ([[Dedup]]'s CC
  * routes): PageRank with a fixed iteration count.
  *
  * Arithmetic is INTEGER fixed-point (ranks scaled to `scale` = 10^12):
  * every contribution is `rank div deg` and the damping step is
  * `(85 · Σcontrib) div 100` — exact long math whose per-key sums are
  * order-independent, so a re-plan / re-partition at 100× produces
  * bit-identical ranks and DuckDB replays the whole iteration chain
  * exactly (float PageRank sums doubles in shuffle order — unverifiable
  * cross-engine in the last ulps). Floor losses are bounded by one unit
  * per division and only ever LOWER mass; production would use doubles,
  * the fixed-point grid here is ~12 significant digits.
  *
  * Scale shape: each iteration is one equi-join of the edge list against
  * the current rank table plus one keyed sum — the same O(E) shuffle per
  * round a Pregel step costs. The only driver fetches are bounded
  * scalars (node count, renorm totals) read once from a materialized
  * frame, never row data. Fixed `iters` keeps the lineage linear; for
  * large graphs use reliable checkpoint instead of localCheckpoint.
  */
object Graph {

  /** HITS hubs/authorities on a directed bipartite edge list `(src,
    * dst)`, fixed iteration count, integer fixed-point like
    * [[pagerankFixed]]: each half-step is one edge-join + one keyed sum,
    * then a scaled renormalization `score div (Σ div scale)` — plain
    * integer division, chosen over the textbook `(score·scale) div Σ`
    * because the latter overflows a long at ~10^14·10^12; the divisor
    * form never multiplies. Deterministic, order-independent,
    * oracle-replayable. Hub mass starts uniform at `scale` per source
    * node.
    *
    * OPTIMIZATION r10 (guide §2.4/§3.3 — remove repeated subtrees, not
    * just bound them): the previous shape truncated lineage only every
    * second iteration and renormalized through a broadcast 1-row join, so
    * each renorm referenced its input twice and each iteration nested the
    * previous one — the 2-iteration plan carried 158 Exchange nodes and
    * re-read ~31× the edge table (measured, ProfileOne: 4.7M records in
    * for a 150k-row base). Now every half-step's O(V) score frame is
    * localCheckpointed ONCE and its total Σ is read driver-side from that
    * materialization (one 1-row partial agg over in-memory blocks — the
    * same bounded-scalar-to-driver move duplicateClusters' convergence
    * probe documents), so the renorm is a pure projection with a literal
    * divisor and the whole run is exactly 2·iters edge-joins. Plan: 3168
    * → 97 lines, 158 → 8 Exchanges; sf0.1 bench 1.66 → ~0.9 s. On a real
    * cluster use reliable checkpoint for executor-loss tolerance.
    */
  def hitsFixed(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    val ed = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var hub = ed.select(col("src").as("s")).distinct().withColumn("hub", lit(scale))
    var auth = ed.select(col("dst").as("p")).distinct().withColumn("auth", lit(0L))
    // materialize the half-step result, THEN read its total from the
    // materialized blocks and renorm as a literal projection — integer
    // division by the same Σ the broadcast-join form computed, so scores
    // are bit-identical
    def renorm(df: DataFrame, c: String): DataFrame = {
      val m = df.localCheckpoint()
      val tot = m.agg(sum(c).cast("long")).first().getLong(0)
      val div = math.max(tot / scale, 1L)
      m.select(
        m.columns.filter(_ != c).map(col) :+
          expr(s"$c div CAST($div AS BIGINT)").as(c): _*)
    }
    (1 to iters).foreach { _ =>
      val authRaw = ed
        .join(hub, col("src") === col("s"))
        .groupBy(col("dst").as("p"))
        .agg(sum("hub").cast("long").as("auth"))
      auth = renorm(authRaw, "auth")
      val hubRaw = ed
        .join(auth, col("dst") === col("p"))
        .groupBy(col("src").as("s"))
        .agg(sum("auth").cast("long").as("hub"))
      hub = renorm(hubRaw, "hub")
    }
    hub
      .select(col("s").as("node"), lit("hub").as("kind"), col("hub").as("score"))
      .union(auth.select(col("p").as("node"), lit("authority").as("kind"), col("auth").as("score")))
  }

  /** PageRank over a DIRECTED edge list `(src, dst)` (mirror the edges
    * for an undirected walk). Every node must appear as a src at least
    * once (true for mirrored undirected graphs — no dangling handling).
    * Returns `(node, rank)` with rank on the fixed-point `scale` grid.
    */
  def pagerankFixed(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    // The edge+degree table is iteration-INVARIANT: materialize it once
    // (localCheckpoint truncates lineage) so iteration i joins the stored
    // O(E) table instead of nesting i re-scans of the source — the same
    // pass-count posture as the IVF/PQ training sample. On a real cluster
    // a reliable checkpoint dir hardens this against executor loss.
    val ed = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint()
    // OPTIMIZATION r10 (guide §2.4): `nodes` is referenced by every
    // iteration's rank rebuild — materialize the O(V) frame once instead
    // of re-deriving the distinct per reference; the node count is a
    // bounded scalar, read driver-side from that materialization once
    // (same move as hitsFixed's renorm) so no iteration re-runs the count
    // aggregate or carries a 1-row broadcast join. Ranks are identical:
    // same integers, same formula. Measured (ProfileOne, sf0.1): 3.56M →
    // ~0.9M records read, bench 2.05 → ~1.1 s.
    val nodes = ed.select(col("src").as("node")).distinct().localCheckpoint()
    val nNodes = nodes.count()
    val base = scale / nNodes // scale div n_nodes, positive integers
    var r = nodes.select(col("node"), lit(base).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = ed
        .join(r, col("src") === col("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
      val sums = contrib.groupBy("node").agg(sum("contrib").as("csum"))
      r = nodes
        .join(sums, Seq("node"), "left")
        .select(
          col("node"),
          (lit((15L * base) / 100L) +
            expr("(85 * coalesce(csum, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }
}
