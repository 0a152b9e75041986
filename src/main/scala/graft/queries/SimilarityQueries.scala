package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ext.Vectors

/** Similarity-search queries (X3): brute-force cosine top-k as the exact
  * baseline, sign-bucket LSH as the scale path. Query set is fixed
  * (vec_id < 10) so cost is O(queries x corpus), never corpus^2.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private def normed(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("v", Vectors.toDouble(col("embedding")))
      .withColumn("nrm", Vectors.l2Norm(col("v")))

  /** k-NN label evaluation: classify each of the 10 fixed query vectors
    * by the majority label of its 5 exact cosine neighbors and score
    * against its own label — the eval primitive behind "is this
    * embedding space any good". Reuses the brute scoring shape (exact
    * baseline, O(queries × corpus)) with BOTH selections on the native
    * bounded-heap TopK: the 5-NN cut (5×10 heap state) and the majority
    * vote (1×10) — never a low-cardinality row_number window.
    */
  private val knnLabelEval: Q = (s, d) => {
    val base = normed(s, d)
    val lab = embeddings(s, d).select(col("vec_id"), col("label"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = base.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = q
      .join(c, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cos")
    val top5 = org.apache.spark.sql.graftnative.TopK
      .perKey(scored, Seq("query_id"), Seq(("cos", true), ("neighbor_id", false)), 5)
    val votes = top5
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label")), Seq("neighbor_id"))
      .groupBy("query_id", "label")
      .agg(count(lit(1)).cast("long").as("votes"))
    val pred = org.apache.spark.sql.graftnative.TopK
      .perKey(votes, Seq("query_id"), Seq(("votes", true), ("label", false)), 1)
    pred
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("actual")), Seq("query_id"))
      .select(col("query_id"), col("actual").cast("long").as("actual_label"),
        col("label").cast("long").as("predicted_label"), col("votes"),
        (col("label") === col("actual")).cast("long").as("correct"))
      .orderBy("query_id")
  }

  /** Mean reciprocal rank of the first SAME-LABEL neighbor in each
    * query's exact top-5 — the retrieval-eval complement of
    * [[knnLabelEval]] (majority vote asks "is the neighborhood right on
    * balance"; MRR asks "how high does the first right answer sit").
    * Reciprocals are exact integers (1e6 div rank — no transcendental,
    * no baked table needed); rank re-derived by a window over the
    * BOUNDED 5-row-per-query TopK result (the bruteTopK precedent);
    * queries with no same-label neighbor in the top-5 report rank 0 /
    * rr 0 rather than vanishing.
    */
  private val mrrKnn: Q = (s, d) => {
    val base = normed(s, d)
    val lab = embeddings(s, d).select(col("vec_id"), col("label"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = q
      .join(base.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cos")
    val top5 = org.apache.spark.sql.graftnative.TopK
      .perKey(scored, Seq("query_id"), Seq(("cos", true), ("neighbor_id", false)), 5)
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    val firstHit = top5
      .withColumn("rk", row_number().over(w))
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), Seq("neighbor_id"))
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("ql")), Seq("query_id"))
      .filter(col("nl") === col("ql"))
      .groupBy("query_id").agg(min("rk").cast("long").as("first_rank"))
    q.select("query_id")
      .join(firstHit, Seq("query_id"), "left")
      .na.fill(0L, Seq("first_rank"))
      .select(col("query_id"), col("first_rank"),
        expr("case when first_rank = 0 then 0L else 1000000 div first_rank end")
          .as("rr_micros"))
      .orderBy("query_id")
  }

  private val bruteTopK: Q = (s, d) => {
    val base = normed(s, d)
    val q = base.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("query_id") < 10)
    val c = base.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    // top-5 per query via the native bounded-heap TopKPerKey: the scoring
    // is deliberately exhaustive (this is the exact baseline), but the
    // SELECTION must not be a row_number window partitioned by 10 query
    // ids — that sorts the whole scored corpus on 10 tasks at any scale
    // (the low-cardinality-window class the sf10 gate caught in
    // sim_topk_pq). Heap state: 5 rows × 10 queries per task.
    val scored = q
      .join(c, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cos")
    val top = org.apache.spark.sql.graftnative.TopK
      .perKey(scored, Seq("query_id"), Seq(("cos", true), ("neighbor_id", false)), 5)
    // rank numbers re-derived over the BOUNDED 5-row-per-query result
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    top
      .withColumn("rk", row_number().over(w))
      .select("query_id", "rk", "neighbor_id", "cos")
      .orderBy("query_id", "rk")
  }

  /** Sign-bucket LSH top-k with bucket bits derived from corpus size
    * (same [[Vectors.signBucketBits]] statistics-then-plan move as
    * `dedup_embedding`, oracle-mirrored as a CASE ladder over COUNT(*)).
    * minBits=4 here instead of dedup's 12: retrieval needs each query's
    * bucket to hold ~`target` candidates — near-dup detection only needs
    * near-identical vectors to collide, so it can afford far sparser
    * buckets. Candidates per query stay ~64 at ANY corpus size (24-bit
    * cap = 16M buckets), instead of the old fixed 16 buckets' O(n/16).
    */
  private val lshTopK: Q = (s, d) => {
    val bits = Vectors.signBucketBits(
      embeddings(s, d).count(), minBits = 4)
    val base = normed(s, d)
      .withColumn("bucket", Vectors.signBucket(col("embedding"), bits))
    val q = base
      .select(col("vec_id").as("query_id"), col("bucket"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("query_id") < 10)
    val c = base.select(col("vec_id").as("neighbor_id"), col("bucket"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("query_id", "rk", "neighbor_id", "cos")
      .orderBy("query_id", "rk")
  }

  /** Multi-probe sign-bucket LSH: each query probes its own bucket plus
    * every Hamming-1 neighbor (bits+1 probes — flip one sign at a time),
    * recovering most boundary-loss recall of single-probe LSH for a
    * bounded ~(bits+1) x target candidate cost per query. Probing only
    * the QUERY side keeps the corpus indexed once; a (query, candidate)
    * pair can meet in at most one probe (the candidate's bucket), so no
    * dedup pass is needed. This is the classic multi-probe trade:
    * recall of 2^bits/2 buckets at the cost of bits+1 lookups.
    */
  private val lshMultiProbe: Q = (s, d) => {
    val bits = Vectors.signBucketBits(embeddings(s, d).count(), minBits = 4)
    val base = normed(s, d)
      .withColumn("bucket", Vectors.signBucket(col("embedding"), bits))
    val probes = explode(array(
      col("bucket") +: (1 to bits).map(i =>
        concat(
          substring(col("bucket"), 1, i - 1),
          when(substring(col("bucket"), i, 1) === "1", lit("0")).otherwise(lit("1")),
          substring(col("bucket"), i + 1, bits - i))): _*))
    val q = base
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), probes.as("bucket"), col("v").as("qv"), col("nrm").as("qn"))
    val c = base.select(col("vec_id").as("neighbor_id"), col("bucket"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("query_id", "rk", "neighbor_id", "cos")
      .orderBy("query_id", "rk")
  }

  /** IVF ANN with TRAINED centroids: max(8, n/256) cells from 2 Lloyd's
    * iterations over a bounded sample ([[graft.ext.IvfIndex]]), corpus
    * assigned to its nearest cell THROUGH the log-depth routing tree
    * (beam descent over strided-pick levels — O(n·log k) assignment, the
    * fix for the two-level O(n·√k) pass round 8 measured at 12.8× for
    * 10× data at sf10→sf100), queries probe their 5 nearest routed cells
    * (parameters calibrated to this corpus's measured isotropy — see
    * [[graft.ext.IvfIndex.cellCount]]).
    * At scale: training cost is O(sample * k) per iteration, centroids +
    * tree steps broadcast as materialized models (k*dim doubles — the
    * bounded KMeans-model artifact, like any ML model object), the whole
    * descent runs under ONE vector-id partitioning (one shuffle), then
    * one shuffle on cell id and per-cell local top-k — corpus² never
    * materializes. Routing + multi-probe recall loss is mirrored by the
    * oracle, which replays the identical training iterations and the
    * identical tree route (integer-quantized centroid sums make them
    * bit-deterministic cross-engine).
    */
  /** Recall@3 of the IVF index against the exact brute-force ground
    * truth — the standard ANN quality metric, and the audit that closes
    * the similarity ladder the way minhash_calibration closes LSH: the
    * approximate structure is MEASURED against the exact answer it
    * approximates, per query, instead of trusted. Both sides are the
    * registered operators' own shapes (brute: exhaustive scoring +
    * native bounded-heap top-3; IVF: trained centroids, 1-probe
    * candidates, multi-probe queries); recall is membership-only, so the
    * cosine doubles never reach the output — pure integer micros.
    */
  private val annRecallAudit: Q = (s, d) => {
    val vec = normed(s, d).select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint(true) // brute side + IVF training + assignment
    val q = vec.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = q
      .join(vec.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cos")
    val brute3 = org.apache.spark.sql.graftnative.TopK
      .perKey(scored, Seq("query_id"), Seq(("cos", true), ("neighbor_id", false)), 3)
      .select("query_id", "neighbor_id")
      .localCheckpoint(true) // query list + hit join
    val n = vec.count()
    val cent = graft.ext.IvfIndex.materialize(
      s, graft.ext.IvfIndex.trainCentroids(vec, "vec_id", 64, n, iters = 2))
    val tree = graft.ext.IvfIndex.buildTree(s, cent)
    val asg = graft.ext.IvfIndex.assignCellsTree(vec, "vec_id", tree, probes = 1)
    val qa = graft.ext.IvfIndex
      .assignCellsTree(vec.filter(col("vec_id") < 10), "vec_id", tree,
        probes = graft.ext.IvfIndex.DefaultProbes)
      .select(col("vec_id").as("query_id"), col("cell"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    val ivf3 = qa
      .join(asg.select(col("vec_id").as("neighbor_id"), col("cell"),
        col("v").as("cv2"), col("nrm").as("cn2")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("query_id", "neighbor_id")
    val hits = brute3.join(ivf3, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).cast("long").as("n_hits"))
    brute3.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        expr("n_hits * 1000000 div 3").as("recall_micros"))
      .orderBy("query_id")
  }

  private val ivfTopK: Q = (s, d) => {
    val vec = normed(s, d).select(col("vec_id"), col("v"), col("nrm"))
    val n = vec.count()
    val cent = graft.ext.IvfIndex.materialize(
      s, graft.ext.IvfIndex.trainCentroids(vec, "vec_id", 64, n, iters = 2))
    val tree = graft.ext.IvfIndex.buildTree(s, cent)
    val asg = graft.ext.IvfIndex.assignCellsTree(vec, "vec_id", tree, probes = 1)
    val q = graft.ext.IvfIndex
      .assignCellsTree(vec.filter(col("vec_id") < 10), "vec_id", tree,
        probes = graft.ext.IvfIndex.DefaultProbes)
      .select(col("vec_id").as("query_id"), col("cell"), col("v").as("qv"), col("nrm").as("qn"))
    val c = asg.select(col("vec_id").as("neighbor_id"), col("cell"), col("v").as("cv2"), col("nrm").as("cn2"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("query_id", "rk", "neighbor_id", "cos")
      .orderBy("query_id", "rk")
  }

  /** PQ-compressed ANN ([[graft.ext.PqIndex]]): 64-dim vectors split into
    * 8 subspaces of 8 dims, each with a ~16-centroid trained codebook, so
    * a vector is stored as 8 small codes (8 B vs 256 B — the 32x
    * compression that keeps a 10^11-vector index RAM-resident). Scoring
    * is ADC: the query materializes a (subspace, code) -> floor(dot*1e6)
    * LUT (m*k integers, broadcast), candidates are scored by ONE equi-join
    * of the codes table against the LUT plus an integer SUM — full vectors
    * are only touched for the 32-candidate exact-cosine re-rank. The adc
    * column stays in the output so the approximation itself is
    * oracle-checked, not just the final ranking.
    */
  private val pqTopK: Q = (s, d) => {
    // The wide pipeline below is shuffle-free projections end-to-end —
    // which means its parallelism is the SCAN's split count, and a
    // single ~50 MB parquet file arrives as ONE split (measured: the
    // whole 2M-vector encode+ADC chain on one task at sf10). One cheap
    // round-robin repartition of the narrow vector table buys the
    // compute chain full-cluster parallelism; on a many-file production
    // table this is a no-op cost.
    val vec = normed(s, d)
      .select(col("vec_id"), col("v"), col("nrm"))
      .repartition(s.sessionState.conf.numShufflePartitions)
    val n = vec.count()
    val sub = graft.ext.PqIndex.subVectors(vec, "vec_id", m = 8, subDim = 8)
    val cb = graft.ext.IvfIndex.materialize(
      s, graft.ext.PqIndex.trainCodebooks(sub, "vec_id", subDim = 8, n, k = 16, iters = 2))
    // Wide encoding: one row per vector carrying its 8 codes — the
    // subvector EXPLODE never happens on the corpus side. The previous
    // shape (16M exploded subvectors × rank window, then a 160M-row
    // (s,code) join + 20M-group re-aggregation) measured 174 s at sf10;
    // every step of it was linear-shaped but row-explosion-heavy.
    val codes = graft.ext.PqIndex.encodeWide(vec, "vec_id", "v", 8, 8, cb)
    val lut = sub
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("s"), col("sv"))
      .join(broadcast(cb), Seq("s"))
      .select(
        col("query_id"), col("s"), col("cid").as("code"),
        floor(Vectors.dot(col("sv"), col("cv")) * 1e6).cast("long").as("d"))
    // per-query LUT as ONE map row (8 subspaces × k cells = 128 entries):
    // ADC becomes a pure projection — 10 broadcast rows × corpus, sum of
    // 8 map lookups per pair, no join explosion, no re-aggregation
    val lutMap = lut
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(
        (col("s").cast("long") * 1000 + col("code")).as("k"), col("d").as("v")))).as("lm"))
    val adc = codes
      .crossJoin(broadcast(lutMap))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn(
        "adc",
        expr("aggregate(transform(codes, (c, i) -> element_at(lm, bigint(i) * 1000 + c)), 0L, (a, x) -> a + x)"))
      .select("query_id", "vec_id", "adc")
    // ADC scores EVERY vector for every query (that is the PQ deal: cheap
    // integer scoring of the whole corpus), so the 32-candidate shortlist
    // must come from the native bounded-heap TopKPerKey — a row_number
    // window partitioned by the 10 query ids sorts the entire scored
    // corpus on 10 tasks at any cluster size. The sf10 gate measured that
    // window at 33× for 10× data (174 s); the heap path restores ~linear.
    val short = org.apache.spark.sql.graftnative.TopK
      .perKey(adc, Seq("query_id"), Seq(("adc", true), ("vec_id", false)), 32)
      .withColumnRenamed("vec_id", "neighbor_id")
    val qv = vec.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cv = vec.select(col("vec_id").as("neighbor_id"), col("v").as("cv2"), col("nrm").as("cn2"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    short
      .join(qv, Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cos", Vectors.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("query_id", "rk", "neighbor_id", "adc", "cos")
      .orderBy("query_id", "rk")
  }

  /** Embedding-table audit — the drift/health check an embedding store
    * runs per ingest batch: per-label vector counts, dimensionality
    * bounds (a ragged table is a broken ingest), and exact per-dimension
    * micro-unit sums for the leading dimensions. Each cell's float
    * widens exactly to double and is floored to integer micro-units
    * BEFORE summing, so the sums are order-independent and bit-identical
    * cross-engine — the decimal-sum trick, applied to float features.
    * One scan, one aggregate; no shuffle beyond the label groupBy.
    */
  private val dimAudit: Q = (s, d) => {
    def micro(i: Int) =
      floor(element_at(col("embedding"), i).cast("double") * 1000000d).cast("long")
    embeddings(s, d)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        min(size(col("embedding"))).cast("long").as("dim_min"),
        max(size(col("embedding"))).cast("long").as("dim_max"),
        sum(micro(1)).cast("long").as("d1_sum"),
        sum(micro(2)).cast("long").as("d2_sum"),
        sum(micro(3)).cast("long").as("d3_sum"),
        sum(micro(4)).cast("long").as("d4_sum"))
      .orderBy("label")
  }

  /** Simplified silhouette census over the trained IVF cells — the
    * clustering-quality audit run before TRUSTING any cell-based
    * structure (semantic dedup cells, IVF pruning): how much closer is
    * each vector to its own centroid than to the nearest other one?
    * The simplified (centroid-based) silhouette replaces the O(n²)
    * pairwise form — a(i) = cosine distance to the own centroid,
    * b(i) = distance to the nearest OTHER centroid, s = (b−a)/max(a,b);
    * assignment to the nearest cell makes a ≤ b, so
    * s = (cos₁−cos₂)/(1−cos₂) ∈ [0, 1] from the rank-1/rank-2 centroid
    * cosines of the SAME ranking [[graft.ext.IvfIndex]] assignment uses
    * (its doubles are bit-identical cross-engine, the dedup_embedding
    * contract). Per-vector s floors to micros BEFORE the per-cell mean
    * (integer sums — order-independent), sign-safe integral division.
    * On this corpus the means sit near zero: the embeddings are
    * MEASURED isotropic (IvfIndex scaladoc), and a near-zero silhouette
    * is the audit saying so — the honest reading, not a failure.
    * Cost: corpus × a FIXED 64-cell audit codebook (one row per vector,
    * two hash aggs) — deliberately NOT the index's n/256 cell rule,
    * whose every-pair assignment is O(n²/256) (measured 16.5× for 10×
    * data before the pin; 64 cells hold the decade at ~10×).
    */
  private val silhouetteCells: Q = (s, d) => {
    val vec = normed(s, d).select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint(true) // training sample + full assignment
    val n = vec.count()
    // FIXED 64-cell audit codebook, not the index's n/256 sizing: the
    // census below touches every (vector, centroid) pair, so a corpus-
    // proportional k makes the audit O(n²/256) — measured 16.5× for 10×
    // data at sf1→sf10 before this pin; k=64 keeps it O(n·64) (10.2×
    // after) and a quality census needs granularity, not index parity
    val cent = graft.ext.IvfIndex.materialize(
      s, graft.ext.IvfIndex.trainCentroidsK(vec, "vec_id", 64, n, k = 64L, iters = 2))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos_c"), asc("cid"))
    val two = vec.crossJoin(broadcast(cent))
      .withColumn("cos_c", Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rk_c", row_number().over(w))
      .filter(col("rk_c") <= 2)
    val pair = two.groupBy("vec_id").agg(
      min(when(col("rk_c") === 1, col("cid"))).as("cell"),
      min(when(col("rk_c") === 1, col("cos_c"))).as("cos1"),
      min(when(col("rk_c") === 2, col("cos_c"))).as("cos2"))
    pair
      .select(col("cell"),
        when(col("cos2") >= 1.0, 0L).otherwise(
          floor((col("cos1") - col("cos2")) / (lit(1.0) - col("cos2")) * lit(1e6))
            .cast("long")).as("sm"))
      .groupBy("cell").agg(
        count(lit(1)).cast("long").as("n_vecs"),
        sum("sm").cast("long").as("sum_s_micros"))
      .withColumn("mean_s_micros", expr(
        """case when sum_s_micros >= 0 then sum_s_micros div n_vecs
           else -((-sum_s_micros) div n_vecs) end"""))
  }

  val queries: Map[String, Q] = Map(
    "silhouette_cells" -> silhouetteCells,
    "knn_label_eval" -> knnLabelEval,
    "mrr_knn" -> mrrKnn,
    "ann_recall_audit" -> annRecallAudit,
    "sim_topk_brute" -> bruteTopK,
    "sim_topk_lsh" -> lshTopK,
    "sim_topk_lsh_multiprobe" -> lshMultiProbe,
    "sim_topk_ivf" -> ivfTopK,
    "sim_topk_pq" -> pqTopK,
    "embedding_dim_audit" -> dimAudit
  )

  val oracle: Map[String, String] = Map(
    "silhouette_cells" ->
      s"""WITH m0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM m0),
        |${graft.ext.IvfIndex.oracleCtes(64, 2, graft.ext.IvfIndex.DefaultProbes, Some(64L))},
        |rk AS (SELECT m.vec_id, c.cid,
        |    list_dot_product(m.v, c.cv) / (m.nrm * c.cn) AS cos_c,
        |    ROW_NUMBER() OVER (PARTITION BY m.vec_id
        |      ORDER BY list_dot_product(m.v, c.cv) / (m.nrm * c.cn) DESC, c.cid) AS rk
        |  FROM m CROSS JOIN cent c),
        |pr AS (SELECT vec_id,
        |    MIN(CASE WHEN rk = 1 THEN cid END) AS cell,
        |    MIN(CASE WHEN rk = 1 THEN cos_c END) AS cos1,
        |    MIN(CASE WHEN rk = 2 THEN cos_c END) AS cos2
        |  FROM rk WHERE rk <= 2 GROUP BY vec_id),
        |sv AS (SELECT cell,
        |    CASE WHEN cos2 >= 1.0 THEN 0
        |      ELSE CAST(floor((cos1 - cos2) / (1.0 - cos2) * 1000000.0) AS BIGINT)
        |    END AS sm FROM pr),
        |ag AS (SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(sm) AS BIGINT) AS sum_s_micros FROM sv GROUP BY cell)
        |SELECT cell, n_vecs, sum_s_micros,
        |  CASE WHEN sum_s_micros >= 0 THEN sum_s_micros // n_vecs
        |    ELSE -((-sum_s_micros) // n_vecs) END AS mean_s_micros
        |FROM ag""".stripMargin,
    "knn_label_eval" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |      FROM m q JOIN m c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
        |t AS (SELECT query_id, neighbor_id FROM (
        |        SELECT query_id, neighbor_id,
        |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        |        FROM p) WHERE rn <= 5),
        |v AS (SELECT t.query_id, e.label, CAST(COUNT(*) AS BIGINT) AS votes
        |      FROM t JOIN embeddings e ON e.vec_id = t.neighbor_id GROUP BY 1, 2),
        |pr AS (SELECT query_id, label, votes FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
        |        FROM v) WHERE rn = 1)
        |SELECT pr.query_id, CAST(e.label AS BIGINT) AS actual_label,
        |  CAST(pr.label AS BIGINT) AS predicted_label, votes,
        |  CAST(CASE WHEN pr.label = e.label THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM pr JOIN embeddings e ON e.vec_id = pr.query_id ORDER BY pr.query_id""".stripMargin,
    "embedding_dim_audit" -> {
      def m(i: Int) =
        s"CAST(SUM(CAST(floor(CAST(embedding[$i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS d${i}_sum"
      s"""SELECT label, COUNT(*) AS n_vecs,
        |  CAST(MIN(len(embedding)) AS BIGINT) AS dim_min,
        |  CAST(MAX(len(embedding)) AS BIGINT) AS dim_max,
        |  ${m(1)}, ${m(2)}, ${m(3)}, ${m(4)}
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    },
    "sim_topk_pq" ->
      s"""WITH m0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM m0),
        |${graft.ext.PqIndex.oracleCtes(m = 8, subDim = 8, k = 16, iters = 2)},
        |lut AS (SELECT q.vec_id AS query_id, c.s, c.cid AS code,
        |    CAST(floor(list_dot_product(q.sv, c.cv) * 1000000.0) AS BIGINT) AS d
        |  FROM subx q JOIN cent c ON q.s = c.s WHERE q.vec_id < 10),
        |adcv AS (SELECT l.query_id, cd.vec_id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS adc
        |  FROM codes cd JOIN lut l ON cd.s = l.s AND cd.code = l.code AND cd.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |short AS (SELECT query_id, neighbor_id, adc FROM (
        |    SELECT query_id, neighbor_id, adc,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rs
        |    FROM adcv) WHERE rs <= 32),
        |rer AS (SELECT sh.query_id, sh.neighbor_id, sh.adc,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM short sh JOIN m q ON q.vec_id = sh.query_id JOIN m c ON c.vec_id = sh.neighbor_id)
        |SELECT query_id, rk, neighbor_id, adc, cos FROM (
        |  SELECT query_id, neighbor_id, adc, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM rer)
        |WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "mrr_knn" ->
      """WITH n AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |p AS (SELECT q.vec_id AS query_id, q.label AS ql, c.vec_id AS neighbor_id, c.label AS nl,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM m q JOIN m c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
        |r AS (SELECT query_id, ql, nl,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM p),
        |fh AS (SELECT query_id, CAST(MIN(rk) AS BIGINT) AS first_rank
        |  FROM r WHERE rk <= 5 AND nl = ql GROUP BY 1),
        |ql AS (SELECT DISTINCT vec_id AS query_id FROM m WHERE vec_id < 10)
        |SELECT ql.query_id, CAST(coalesce(first_rank, 0) AS BIGINT) AS first_rank,
        |  CASE WHEN coalesce(first_rank, 0) = 0 THEN 0
        |       ELSE 1000000 // first_rank END AS rr_micros
        |FROM ql LEFT JOIN fh USING (query_id) ORDER BY query_id""".stripMargin,
    "ann_recall_audit" ->
      s"""WITH m0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM m0),
        |${graft.ext.IvfIndex.oracleCtes(64, 2, graft.ext.IvfIndex.DefaultProbes)},
        |ivfp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM qasg q JOIN asg c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |ivf3 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM ivfp) WHERE rk <= 3),
        |brp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM m q JOIN m c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
        |br3 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM brp) WHERE rk <= 3),
        |hits AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |  FROM br3 JOIN ivf3 USING (query_id, neighbor_id) GROUP BY 1),
        |ql AS (SELECT DISTINCT query_id FROM br3)
        |SELECT ql.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(n_hits, 0) * 1000000 // 3 AS BIGINT) AS recall_micros
        |FROM ql LEFT JOIN hits USING (query_id) ORDER BY query_id""".stripMargin,
    "sim_topk_ivf" ->
      s"""WITH m0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM m0),
        |${graft.ext.IvfIndex.oracleCtes(64, 2, graft.ext.IvfIndex.DefaultProbes)},
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |  FROM qasg q JOIN asg c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (SELECT query_id, neighbor_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM p)
        |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "sim_topk_brute" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |  m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |  p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |    FROM m q JOIN m c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
        |  r AS (SELECT query_id, neighbor_id, cos,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM p)
        |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "sim_topk_lsh_multiprobe" ->
      s"""WITH bitsv AS (SELECT ${Vectors.signBucketBitsSql("COUNT(*)", minBits = 4)} AS bits
        |    FROM embeddings),
        |  n AS (SELECT vec_id,
        |    array_to_string(list_transform(generate_series(1, (SELECT bits FROM bitsv)),
        |      i -> CASE WHEN embedding[i] > 0 THEN '1' ELSE '0' END), '') AS bucket,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |  m AS (SELECT vec_id, bucket, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |  qp AS (SELECT vec_id, v, nrm, unnest(list_prepend(bucket,
        |      list_transform(generate_series(1, bits),
        |        i -> substr(bucket, 1, i - 1) ||
        |             (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
        |             substr(bucket, i + 1, bits - i)))) AS bucket
        |    FROM m, bitsv WHERE vec_id < 10),
        |  p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |    FROM qp q JOIN m c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id),
        |  r AS (SELECT query_id, neighbor_id, cos,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM p)
        |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "sim_topk_lsh" ->
      s"""WITH bitsv AS (SELECT ${Vectors.signBucketBitsSql("COUNT(*)", minBits = 4)} AS bits
        |    FROM embeddings),
        |  n AS (SELECT vec_id,
        |    array_to_string(list_transform(generate_series(1, (SELECT bits FROM bitsv)),
        |      i -> CASE WHEN embedding[i] > 0 THEN '1' ELSE '0' END), '') AS bucket,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |  m AS (SELECT vec_id, bucket, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |  p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        |    FROM m q JOIN m c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
        |    WHERE q.vec_id < 10),
        |  r AS (SELECT query_id, neighbor_id, cos,
        |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM p)
        |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin
  )
}
