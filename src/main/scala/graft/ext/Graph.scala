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
  * round a Pregel step costs; no driver materialization (the node count
  * rides as a broadcast 1-row frame). Fixed `iters` keeps the lineage
  * linear; for large graphs checkpoint every few rounds as the CC routes
  * do.
  */
object Graph {

  /** Lineage-truncation cadence for the iterative routines: without it
    * the HITS plan quadruples per half-step (each renorm reads its input
    * twice). Two rounds of growth between checkpoints keeps analysis
    * bounded while amortizing the materialization cost.
    */
  val TruncateEvery = 2

  /** HITS hubs/authorities on a directed bipartite edge list `(src,
    * dst)`, fixed iteration count, integer fixed-point like
    * [[pagerankFixed]]: each half-step is one edge-join + one keyed sum,
    * then a scaled renormalization `score div (Σ div scale)` — plain
    * integer division against a broadcast 1-row total, chosen over the
    * textbook `(score·scale) div Σ` because the latter overflows a long
    * at ~10^14·10^12; the divisor form never multiplies. Deterministic,
    * order-independent, oracle-replayable. Hub mass starts uniform at
    * `scale` per source node.
    *
    * Each renorm references its input twice (once for the broadcast
    * total, once for the join), so the un-truncated plan grows ~4× per
    * half-step; both score frames are localCheckpointed every
    * [[Graph.TruncateEvery]] iterations to keep analysis/execution cost
    * linear in `iters` (the same lineage posture as the CC routes and
    * [[pagerankFixed]]'s edge table).
    */
  def hitsFixed(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    val ed = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var hub = ed.select(col("src").as("s")).distinct().withColumn("hub", lit(scale))
    var auth = ed.select(col("dst").as("p")).distinct().withColumn("auth", lit(0L))
    def renorm(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(sum(c).cast("long").as("tot"))
      df.crossJoin(broadcast(tot))
        .select(
          df.columns.filter(_ != c).map(col) :+
            expr(s"$c div greatest(tot div $scale, CAST(1 AS BIGINT))").as(c): _*)
    }
    (1 to iters).foreach { i =>
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
      if (i % TruncateEvery == 0 && i < iters) {
        hub = hub.localCheckpoint()
        auth = auth.localCheckpoint()
      }
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
    val nodes = ed.select(col("src").as("node")).distinct()
    val n1 = nodes.agg(count(lit(1)).as("n_nodes"))
    var r = nodes
      .crossJoin(broadcast(n1))
      .select(col("node"), expr(s"$scale div n_nodes").as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = ed
        .join(r, col("src") === col("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
      val sums = contrib.groupBy("node").agg(sum("contrib").as("csum"))
      r = nodes
        .crossJoin(broadcast(n1))
        .join(sums, Seq("node"), "left")
        .select(
          col("node"),
          (expr(s"(15 * ($scale div n_nodes)) div 100") +
            expr("(85 * coalesce(csum, CAST(0 AS BIGINT))) div 100")).as("rank"))
    }
    r
  }
}
