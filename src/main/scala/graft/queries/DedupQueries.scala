package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ext.{Dedup, TextStats, Vectors}

/** Dedup-family queries (X1/X2). The test corpus has no natural dups, so
  * each query injects deterministic duplicates/near-duplicates first (the
  * same injection is mirrored in the oracle SQL). MinHash and SimHash run
  * in portable mode — md5-derived hashes ([[Dedup.portableHash64]]) that
  * DuckDB reproduces bit-for-bit — so the full signature -> band ->
  * candidate path is oracle-checked, not rows-only.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Shared shingle df-cap, mirrored verbatim in every oracle. At this
    * corpus the max shingle document frequency is single-digit, so the cap
    * provably never fires at test scale (results identical with/without);
    * at 100 TB it bounds the hottest join key to dfCap^2 pairs.
    */
  val ShingleDfCap = 256

  /** documents + whole-copy dups for every 5th doc. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    docs.union(
      docs
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** normalized documents + first-word-dropped near-copies for every 7th.
    * Deliberately NOT [[graft.Tables.spread]] (r10): every consumer's
    * first real operation is wordShingles' distinct() — an exchange
    * whose map side dedups the exploded shingles — so the corpus text is
    * re-spread by that aggregation anyway, and A/B at sf0.1 (min-of-7,
    * same JVM conditions, canary-flat) measured the extra up-front text
    * exchange as a pure LOSS on the jaccardPairs family:
    * dedup_ngram_jaccard 1.78→2.78 s, containment 1.94→2.57,
    * clusters 2.48→3.30, quality_shift 2.43→2.72. Contrast
    * [[repeatedSubstringRewrite]], where spread wins 63% because the
    * per-doc 12-gram+md5 pass dwarfs one text exchange.
    */
  private def nearDupCorpus(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), TextStats.normText(col("text")).as("t"))
    base
      .union(
        base
          .filter(col("doc_id") % 7 === 0)
          .select(
            (col("doc_id") + 200000).as("doc_id"),
            expr("substring(t, instr(t, ' ') + 1)").as("t")))
      // BORDERLINE near-dups: a 60% token prefix sits at jaccard
      // (0.6n-4)/(n-4) against its source — inside [0.5, 0.6) for short
      // docs, above 0.6 for long ones. The first planted family (drop one
      // word, jaccard ~0.95) left the whole [0.5, 0.8] band empty, so a
      // mutated jaccard threshold (0.5->0.6) and coarser LSH banding
      // (8x2 -> 4x4) were EQUIVALENT mutants on the fixture — the round-5
      // mutation audit caught the gap; this family makes both observable.
      .union(
        base
          .filter(col("doc_id") % 11 === 3)
          .select(
            (col("doc_id") + 400000).as("doc_id"),
            expr("array_join(slice(split(t, ' '), 1, " +
              "int(greatest(size(split(t, ' ')) * 6 div 10, 10L))), ' ')").as("t")))
  }

  /** embeddings + identical-vector copies for every 9th vector. */
  private def dupVectors(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    e.union(
      e.filter(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  private val exact: Q = (s, d) =>
    Dedup
      .exactDedup(dupCorpus(s, d), Seq("text"), "doc_id")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").cast(LongType).as("id_sum"))

  /** Incremental (continuous-crawl) dedup: an incoming batch is deduped
    * WITHIN itself (first doc per content key) and AGAINST the existing
    * corpus state — which at scale is the bounded (content_key ->
    * canonical_id) table, not the corpus: the anti-join touches only
    * keys. Docs with id % 3 == 0 play the new batch; the rest are prior
    * state. One intra-batch window + one key anti-join; the accepted-set
    * id_sum pins exactly WHICH docs survive, not just how many.
    */
  private val incrementalDedup: Q = (s, d) => {
    val keyed = documents(s, d)
      .select(
        col("doc_id"),
        sha2(coalesce(TextStats.normText(col("text")), lit("")), 256).as("tkey"))
    val state = keyed.filter(col("doc_id") % 3 =!= 0).select("tkey").distinct()
    val incoming = keyed.filter(col("doc_id") % 3 === 0)
    val firstInBatch = Dedup.exactDedup(incoming, Seq("tkey"), "doc_id")
    val accepted = firstInBatch.join(state, Seq("tkey"), "left_anti")
    incoming
      .agg(count(lit(1)).as("n_incoming"))
      .crossJoin(
        firstInBatch.agg(count(lit(1)).as("n_first_in_batch")))
      .crossJoin(
        accepted.agg(
          count(lit(1)).as("n_accepted"),
          coalesce(sum("doc_id"), lit(0L)).cast(LongType).as("accepted_id_sum")))
  }

  private val ngramJaccard: Q = (s, d) => {
    // measured: materializing the shingle table does NOT help here —
    // Spark already reuses the exchange across the self-join's two sides,
    // and the per-doc counts aggregation overlaps the join stages
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
    Dedup
      .jaccardPairs(sh, "doc_id", 0.5, ShingleDfCap)
      .orderBy("id_a", "id_b")
  }

  /** 16 portable hashes in 8 bands of 2: band-match probability at jaccard
    * 0.5 is 1-(1-0.25)^8 ≈ 0.90 (vs 0.40 for 8x4) with half the signature
    * expressions. The query output is the candidate pair LIST — the full
    * signature/band computation is what the oracle hash-checks. Recall vs
    * the exact-jaccard truth set is measured in DedupSpec, NOT here: round
    * 1 embedded the O(pairs) brute-force verifier inside this query, which
    * made the *scalable* variant the slowest thing in the bench.
    */
  private val minhashLsh: Q = (s, d) => {
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
    val sig = Dedup.minhashSignature(sh, "doc_id", 16, portable = true)
    Dedup.lshCandidates(sig, "doc_id", 16, 2, portable = true).orderBy("id_a", "id_b")
  }

  /** Containment >= 0.9 pairs on the SAME corpus + shingles as
    * [[ngramJaccard]]: the planted truncation variants (the 60 %-prefix
    * and drop-first-word docs in [[nearDupCorpus]]) are exactly the
    * subset-duplicate class containment exists for — every shingle of the
    * derived doc is a shingle of its original, so they score 1e6 here
    * while symmetric Jaccard only clears 0.5 when the overlap is mutual.
    */
  private val containment: Q = (s, d) => {
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
    Dedup
      .containmentPairs(sh, "doc_id", 900000L, ShingleDfCap)
      .orderBy("id_a", "id_b")
  }

  /** 60-bit md5-vote SimHash, 4 bands x 15 bits, Hamming <= 3 (pigeonhole:
    * <= 3 differing bits cannot touch all 4 bands, so banding loses
    * nothing at this threshold). 60 bits matters on this corpus: its
    * shared synthetic vocabulary makes per-bit votes converge, and at 32
    * bits most UNRELATED pairs sat within Hamming 3 (measured: background
    * 1st-percentile Hamming is 9 at 60 bits vs ~2 at 32) — the pair list
    * would have gone quadratic. Pair list output — fully oracle-checked.
    * The 64-bit native-expression SimHash remains the scale path
    * (spec-covered; zero shuffle).
    */
  private val simhash: Q = (s, d) => {
    val sim = Dedup.simhashPortable(nearDupCorpus(s, d), "doc_id", "t", 60)
    Dedup
      .simhashPairs(sim, "doc_id", 3, bandBits = 15)
      .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Sign-bucket LSH with bits derived from corpus size (>=12, targeting
    * ~64 vectors/bucket — see [[Vectors.signBucketBits]]). The count() is
    * one cheap statistics job before planning, the same move AQE makes;
    * the oracle recomputes the identical integer formula from COUNT(*) so
    * both engines bucket with the same width at every scale factor.
    */
  private val embeddingNearDup: Q = (s, d) => {
    val corpus = dupVectors(s, d)
    val bits = Vectors.signBucketBits(corpus.count())
    val base = corpus
      .withColumn("bucket", Vectors.signBucket(col("embedding"), bits))
      .withColumn("v", Vectors.toDouble(col("embedding")))
    val n = base.withColumn("nrm", Vectors.l2Norm(col("v")))
    val a = n.select(col("vec_id").as("id_a"), col("bucket"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("id_b"), col("bucket"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.9)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023 shape): k-means
    * cluster the embedding space ([[graft.ext.IvfIndex]] — trained
    * centroids, bounded sample, broadcast model), then compare pairs ONLY
    * within a cluster and drop every vector that has a lower-id neighbor
    * with cosine >= 0.9 in its cell, keeping that lowest-id vector as the
    * retained representative. At 100 TB the cluster step is what makes
    * semantic dedup tractable: cells stay ~256 vectors wide at any corpus
    * size (the index grows cells, not cell size), so in-cell pair work is
    * O(n * 256), never O(n^2), and the only shuffle is on the cell id.
    * Recall loss at cell boundaries is inherent to the method (that IS
    * SemDeDup's trade) and mirrored exactly by the oracle, which replays
    * the identical training iterations.
    */
  private val semanticDedup: Q = (s, d) => {
    val vec = dupVectors(s, d)
      .withColumn("v", Vectors.toDouble(col("embedding")))
      .withColumn("nrm", Vectors.l2Norm(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"))
    val n = vec.count()
    val cent = graft.ext.IvfIndex.materialize(
      s, graft.ext.IvfIndex.trainCentroids(vec, "vec_id", 64, n, iters = 2))
    val asg = graft.ext.IvfIndex.assignCells(vec, "vec_id", cent, probes = 1)
    val a = asg.select(col("cell"), col("vec_id").as("kept_id"), col("v").as("va"), col("nrm").as("na"))
    val b = asg.select(col("cell"), col("vec_id").as("dropped_id"), col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy("dropped_id").orderBy(asc("kept_id"))
    a.join(b, Seq("cell"))
      .filter(col("kept_id") < col("dropped_id"))
      .withColumn("cos", Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.9)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("dropped_id", "kept_id", "cos")
      .orderBy("dropped_id")
  }

  /** C4/CCNet-style duplicated-line removal, the curation op that REWRITES
    * documents instead of dropping them: segment each doc into fixed
    * 8-token "lines", count each line's document frequency across the
    * corpus, delete every occurrence of lines appearing in >= 3 docs
    * (the license-header/boilerplate case — the fixture prepends one to
    * every 5th doc), and reassemble the surviving lines IN ORDER. At
    * scale: the df pass is one hash aggregate on the line text, removal
    * is one equi-anti-join, and reassembly is a per-doc sort of O(lines)
    * structs — no window over the whole corpus, no driver text handling.
    * Output carries md5(cleaned) so the reassembled text itself is
    * hash-checked, not just the counts.
    */
  private val lineDedup: Q = (s, d) => {
    val corpus = documents(s, d).select(
      col("doc_id"),
      // exactly 8 tokens = one full segment, so the header IS a hot line
      // (df = n/5) and the rest of a planted doc stays segment-aligned
      // with its unplanted twin segmentation
      when(col("doc_id") % 5 === 0,
        concat(lit("copyright header all terms of use apply here "), col("text")))
        .otherwise(col("text")).as("txt"))
    val segs = corpus
      .select(col("doc_id"), expr(
        """posexplode(transform(sequence(0, (size(split(txt, ' ')) + 7) div 8 - 1),
          |  g -> array_join(slice(split(txt, ' '), g * 8 + 1, 8), ' ')))""".stripMargin))
      .withColumnRenamed("col", "seg")
    val hot = segs.groupBy("seg")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 3)
      .select("seg")
    val kept = segs.join(hot, Seq("seg"), "left_anti")
    val reasm = kept.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          expr("transform(array_sort(collect_list(struct(pos, seg))), x -> x.seg)"),
          " ").as("cleaned"))
    corpus
      .join(segs.groupBy("doc_id").agg(count(lit(1)).as("n_seg")), Seq("doc_id"))
      .join(reasm, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_seg"),
        (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        md5(coalesce(col("cleaned"), lit(""))).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** Fuzzy entity matching via deletion-neighborhood blocking (the
    * SymSpell/FastSS symmetric-delete scheme): each name emits itself plus
    * every delete-one-character variant as blocking keys; two strings
    * within edit distance 1 are GUARANTEED to share a key (delete: b is in
    * D1(a); insert: symmetric; substitute: both contain the string with
    * that position deleted), so the candidate generator is a plain
    * equi-join on the variant string — O(len) keys per record, never an
    * all-pairs compare — and exact `levenshtein` verifies candidates.
    * Fixture plants one-character-deleted copies of every 7th supplier
    * name; natural matches (supplier numbers differing in one digit) are
    * found by the same keys. For natural-language names the key table
    * would get a df cap like the shingle joins; identifier-like keys stay
    * near-unique by construction.
    */
  private val fuzzyMatch: Q = (s, d) => {
    val base = supplier(s, d).select(col("s_suppkey").as("id"), col("s_name").as("nm"))
    val planted = supplier(s, d)
      .filter(col("s_suppkey") % 7 === 0)
      .select(
        (col("s_suppkey") + 500000).as("id"),
        expr("substr(s_name, 1, CAST(s_suppkey % 18 AS INT)) || substr(s_name, CAST(s_suppkey % 18 AS INT) + 2)").as("nm"))
    val names = base.unionAll(planted)
    val keys = names
      .select(col("id"), col("nm"),
        explode(expr(
          "concat(array(nm), transform(sequence(1, length(nm)), i -> substr(nm, 1, i - 1) || substr(nm, i + 1)))")).as("k"))
      .dropDuplicates("id", "k")
    val a = keys.select(col("id").as("id_a"), col("nm").as("nm_a"), col("k"))
    val b = keys.select(col("id").as("id_b"), col("nm").as("nm_b"), col("k"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "nm_a", "nm_b")
      .distinct()
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast(LongType))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }

  /** End-to-end corpus cleaning: exact dedup, then near-dup pair removal
    * (shingle-join jaccard >= 0.6, drop the higher doc_id of every pair) —
    * the composite "give me the cleaned corpus" operation. The MinHash
    * variant of candidate generation is `dedup_minhash_lsh`; this one uses
    * the exact shingle join so DuckDB can replicate it verbatim.
    */
  private val pipelineE2e: Q = (s, d) => {
    // exactDeduped feeds BOTH the shingle pipeline and the final anti-join
    // branch; materialize it once (cheap: the deduped corpus) instead of
    // recomputing the scan+window on each branch
    val exactDeduped =
      Dedup.exactDedup(nearDupCorpus(s, d), Seq("t"), "doc_id").localCheckpoint(true)
    val sh = Dedup.wordShingles(exactDeduped, "doc_id", "t", 5)
    val drop = Dedup
      .jaccardPairs(sh, "doc_id", 0.6, ShingleDfCap)
      .select(col("id_b").as("doc_id"))
      .distinct()
    exactDeduped
      .join(drop, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").cast(LongType).as("id_sum"))
  }

  /** Duplicate clusters: near-dup pairs (same shingle-join as
    * `dedup_ngram_jaccard`) -> connected components -> one row per
    * cluster with its canonical representative (the minimum doc id) and
    * member stats. This is the operation a real dedup pass actually ends
    * with — "keep one doc per duplicate group", not a pair list. The
    * oracle replays the label propagation as a recursive transitive
    * closure, so the component labels are hash-checked, not just counted.
    */
  /** Keep-BEST-of-cluster dedup decision table — production dedup keeps
    * each duplicate cluster's highest-QUALITY member, not its smallest
    * id: per cluster, argmax on the integer stopword-density quality
    * (hits·1000 div ntok, ties to the smaller doc_id) via the native
    * bounded-heap [[org.apache.spark.sql.graftnative.TopK]] (k=1 heap
    * state per cluster — never a window over the cluster key). Clusters
    * are the same label-propagation transitive closure as
    * `dedup_clusters`, so the oracle reuses the recursive-CTE ground
    * truth with a per-cluster argmax on top.
    */
  private val keepBest: Q = (s, d) => {
    val corpus = nearDupCorpus(s, d).localCheckpoint(true) // shingles + quality
    val sh = Dedup.wordShingles(corpus, "doc_id", "t", 5)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.5, ShingleDfCap)
    val members = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .join(corpus.select(col("doc_id").as("node"),
        expr("""cast(size(filter(split(t, ' '), tk -> tk IN ('the','of','and','to','a','in'))) as bigint)
                * 1000 div greatest(cast(size(split(t, ' ')) as bigint), 1)""").as("q")),
        Seq("node"))
      .localCheckpoint(true) // argmax + member census
    val best = org.apache.spark.sql.graftnative.TopK.perKey(
      members.select(col("cluster"), col("node"), col("q")),
      Seq("cluster"), Seq(("q", true), ("node", false)), 1)
    best
      .join(members.groupBy("cluster")
        .agg(count(lit(1)).cast(LongType).as("n_members")), Seq("cluster"))
      .select(col("cluster").as("cluster_rep"), col("node").cast(LongType).as("kept_id"),
        col("q").as("kept_quality"), col("n_members"))
      .orderBy("cluster_rep")
  }

  /** Survivorship audit for keep-best dedup — the QA question after
    * [[keepBest]] runs: did preferring the highest-quality cluster member
    * actually SHIFT the kept distribution up, and by how much mass per
    * quality bucket? Same closure and quality score as keep_best (so the
    * oracle pins all three to one recursive-CTE ground truth), then every
    * cluster member is labeled kept (the TopK k=1 argmax) or dropped and
    * censused into quality deciles (q div 100 of the 0–1000 stopword-
    * ratio score). One equi-join of members to their cluster argmax (both
    * sides keyed by cluster — no broadcast needed at scale), one ≤11-row
    * hash agg. On the planted fixture the dropped mass concentrates in
    * the low buckets (the truncated/beheaded replicas lose stopwords),
    * which is exactly the shift the audit exists to show.
    */
  private val qualityShift: Q = (s, d) => {
    val corpus = nearDupCorpus(s, d).localCheckpoint(true) // shingles + quality
    val sh = Dedup.wordShingles(corpus, "doc_id", "t", 5)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.5, ShingleDfCap)
    val members = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .join(corpus.select(col("doc_id").as("node"),
        expr("""cast(size(filter(split(t, ' '), tk -> tk IN ('the','of','and','to','a','in'))) as bigint)
                * 1000 div greatest(cast(size(split(t, ' ')) as bigint), 1)""").as("q")),
        Seq("node"))
      .localCheckpoint(true) // argmax side + census side
    val best = org.apache.spark.sql.graftnative.TopK.perKey(
      members.select(col("cluster"), col("node"), col("q")),
      Seq("cluster"), Seq(("q", true), ("node", false)), 1)
      .select(col("cluster"), col("node").as("kept_node"))
    members.join(best, Seq("cluster"))
      .withColumn("kept", (col("node") === col("kept_node")).cast(LongType))
      .withColumn("bucket", expr("q div 100"))
      .groupBy("bucket")
      .agg(sum("kept").cast(LongType).as("kept_n"),
        sum(lit(1L) - col("kept")).cast(LongType).as("dropped_n"))
  }

  private val clusters: Q = (s, d) => {
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.5, ShingleDfCap)
    Dedup
      .duplicateClusters(pairs, "id_a", "id_b")
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max("node").cast(LongType).as("max_member"))
      .withColumnRenamed("cluster", "cluster_rep")
      .orderBy("cluster_rep")
  }

  /** The same candidate pairs clustered by large-star/small-star
    * contraction instead of label propagation — the O(log n)-round scale
    * path for long duplicate chains (a chain of k near-identical docs
    * takes ~k label-propagation rounds but ~log k star rounds). Both
    * routes are registered so the differential oracle pins them to the
    * SAME recursive-CTE transitive closure, making the equivalence a
    * per-round driver-checked fact rather than a one-time spec property.
    */
  private val clustersStar: Q = (s, d) => {
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.5, ShingleDfCap)
    Dedup
      .duplicateClustersStar(pairs, "id_a", "id_b")
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max("node").cast(LongType).as("max_member"))
      .withColumnRenamed("cluster", "cluster_rep")
      .orderBy("cluster_rep")
  }

  /** MinHash estimator-calibration audit: for every LSH candidate pair,
    * compare the signature-estimated Jaccard (matching components / 16,
    * i.e. matches·62500 micros) against the EXACT shingle Jaccard, and
    * census the error — the audit a production dedup pipeline runs
    * before trusting a sketch parameterization (k, band shape) at a new
    * corpus. Exact intersections are computed only for the LSH-bounded
    * candidate set (never all pairs): shingles semi-joined down to
    * candidate docs, one shingle equi-join, pair filter pushed before
    * the count. False-positive pairs with DISJOINT shingle sets must
    * still score exact=0, so the estimate side left-joins the exact
    * side. One census row; integer micros throughout.
    */
  private val minhashCalibration: Q = (s, d) => {
    val sh = Dedup.wordShingles(nearDupCorpus(s, d), "doc_id", "t", 5)
      .localCheckpoint(true) // signature, size, and intersection branches
    val sig = Dedup.minhashSignature(sh, "doc_id", 16, portable = true)
      .localCheckpoint(true) // band and per-pair match branches
    val cands = Dedup.lshCandidates(sig, "doc_id", 16, 2, portable = true)
      .localCheckpoint(true) // estimate join + intersection restriction
    val matches = (0 until 16)
      .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    // Everything below involves only CANDIDATE docs, so restrict the
    // signature and shingle tables to them FIRST (one semi-join each).
    // At sf1 AQE already broadcasts the bounded candidate frames, so the
    // measured win is small (331→328 MB, 14.4→13.3 s) — the restriction
    // is for the regime where candidates OUTGROW broadcast and the
    // unrestricted pair joins would shuffle the full corpus-wide tables.
    // The remaining shuffle is the candidate-doc shingle self-join
    // (exact intersections need the strings), linear in candidates —
    // the same accepted class as dedup_ngram_jaccard's equi-join.
    val candDocs = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
      .localCheckpoint(true) // sig + shingle restriction branches
    val sigc = sig.join(candDocs, Seq("doc_id"), "leftsemi")
    val est = cands
      .join(sigc.as("a"), col("id_a") === col("a.doc_id"))
      .join(sigc.as("b"), col("id_b") === col("b.doc_id"))
      .select(col("id_a"), col("id_b"), (matches * 62500L).as("est_micros"))
    val shc = sh.join(candDocs, Seq("doc_id"), "leftsemi")
      .localCheckpoint(true) // intersection + size branches
    val inter = shc.select(col("doc_id").as("id_a"), col("shingle"))
      .join(shc.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .join(cands, Seq("id_a", "id_b"), "leftsemi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).cast(LongType).as("i"))
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("sz"))
    est
      .join(inter, Seq("id_a", "id_b"), "left").na.fill(0L, Seq("i"))
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sa")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sb")), Seq("id_b"))
      .withColumn("exact_micros", expr("i * 1000000 div (sa + sb - i)"))
      .withColumn("err", col("est_micros") - col("exact_micros"))
      .agg(
        count(lit(1)).cast(LongType).as("n_pairs"),
        sum(abs(col("err"))).cast(LongType).as("sum_abs"),
        max(abs(col("err"))).cast(LongType).as("max_abs_err_micros"),
        sum("err").cast(LongType).as("sum_signed_err"))
      .withColumn("mean_abs_err_micros", expr("sum_abs div n_pairs"))
      .select("n_pairs", "mean_abs_err_micros", "max_abs_err_micros",
        "sum_signed_err")
  }

  /** Planted spans for `dedup_substrings`, inserted at DOC-VARYING token
    * offsets so nothing aligns to any fixed grid (the case `dedup_lines`'
    * 8-token segments cannot catch). Three families, mutually exclusive
    * by doc_id % 6:
    *   A (%6=0): exactly K=12 tokens — the boundary case; duplicated
    *     across ~n/6 docs, MUST be removed (one duplicated 12-gram per
    *     occurrence, covering exactly the span);
    *   B (%6=2): 11 tokens — one BELOW the window; repeated across docs
    *     but no 12-gram fits inside it, MUST survive (the off-by-one
    *     witness: a k−1 window or a slice off-by-one removes it → red).
    *     Bracketed by per-doc UNIQUE guard tokens ('uq'||doc_id): without
    *     them, a 12-gram straddling the span plus ONE natural neighbor
    *     word duplicates whenever two planted docs happen to share that
    *     neighbor — near-certain on this ~30-word vocabulary (measured:
    *     83/83 family-B docs extended-and-removed unguarded), which is
    *     correct Lee-et-al. semantics but kills the witness;
    *   C (%6=4): 20 tokens — a maximal span LONGER than the window,
    *     covered by the union of 9 overlapping duplicated 12-grams
    *     (exercises the coverage-union step, not just single grams).
    * Offsets doc_id % {17, 13, 11} clamp to the doc length.
    */
  private val SpanA =
    "shared disclaimer clause governs usage herein revocable license terms apply strictly worldwide"
  private val SpanB =
    "nearmiss notice sits just below removal threshold by exactly one token"
  private val SpanC =
    "standard boilerplate footer generated automatically please retain attribution and visit our " +
      "archive for complete revision history including prior amendments today"

  private def substringCorpus(s: SparkSession, d: String): DataFrame = {
    def insertAt(span: String, offMod: Int, guard: Boolean = false): Column = {
      val off = least(col("doc_id") % offMod, size(col("toks")).cast(LongType))
      val spanArr =
        if (guard) {
          val g = array(concat(lit("uq"), col("doc_id")))
          concat(g, split(lit(span), " "), g)
        } else split(lit(span), " ")
      array_join(
        concat(
          slice(col("toks"), lit(1), off),
          spanArr,
          slice(col("toks"), off + 1, size(col("toks")).cast(LongType) - off)),
        " ")
    }
    spread(documents(s, d), "doc_id")
      .select(col("doc_id"), TextStats.normText(col("text")).as("t"))
      .withColumn("toks", split(col("t"), " "))
      .withColumn(
        "txt",
        when(col("doc_id") % 6 === 0, insertAt(SpanA, 17))
          .when(col("doc_id") % 6 === 2, insertAt(SpanB, 13, guard = true))
          .when(col("doc_id") % 6 === 4, insertAt(SpanC, 11))
          .otherwise(col("t")))
      .select(col("doc_id"), col("txt"))
  }

  /** Exact repeated-substring (suffix-style) dedup — see
    * [[Dedup.repeatedSubstringRewrite]]. Output carries md5(cleaned) so
    * the reassembled text is hash-checked, like `dedup_lines`.
    */
  private val substringDedup: Q = (s, d) =>
    Dedup
      .repeatedSubstringRewrite(substringCorpus(s, d), "doc_id", "txt", 12)
      .select(
        col("doc_id"), col("n_tok"), col("n_dropped"),
        md5(col("cleaned")).as("cleaned_md5"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "dedup_substrings" -> substringDedup,
    "minhash_calibration" -> minhashCalibration,
    "dedup_pipeline_e2e" -> pipelineE2e,
    "dedup_keep_best" -> keepBest,
    "dedup_quality_shift" -> qualityShift,
    "dedup_clusters" -> clusters,
    "dedup_clusters_star" -> clustersStar,
    "dedup_exact" -> exact,
    "dedup_incremental" -> incrementalDedup,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_containment" -> containment,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_simhash" -> simhash,
    "dedup_embedding" -> embeddingNearDup,
    "dedup_semantic" -> semanticDedup,
    "dedup_lines" -> lineDedup,
    "fuzzy_match_suppliers" -> fuzzyMatch
  )

  /** DuckDB rendering of [[Dedup.portableHash64]]. */
  private def ph64(sqlExpr: String): String =
    s"CAST('0x' || substr(md5($sqlExpr), 1, 15) AS BIGINT)"

  /** Shared by `dedup_clusters` and `dedup_clusters_star`: the ground
    * truth is one recursive-CTE transitive closure, regardless of which
    * distributed algorithm produced the clustering.
    */
  private lazy val clustersOracle: String =
    s"""WITH RECURSIVE $corpusSql,
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairsj AS (SELECT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) p
      |  JOIN counts ca ON ca.doc_id = id_a
      |  JOIN counts cb ON cb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairsj
      |  UNION SELECT id_b, id_a FROM pairsj),
      |reach(node, r) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
      |lab AS (SELECT node, LEAST(node, MIN(r)) AS cluster_rep
      |  FROM reach GROUP BY node)
      |SELECT cluster_rep, COUNT(*) AS n_members,
      |  CAST(MAX(node) AS BIGINT) AS max_member
      |FROM lab GROUP BY cluster_rep ORDER BY cluster_rep""".stripMargin

  private val corpusSql =
    """base AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
      |corpus AS (SELECT doc_id, t FROM base
      |  UNION ALL
      |  SELECT doc_id + 200000, substr(t, strpos(t, ' ') + 1) FROM base WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000, array_to_string(
      |    string_split(t, ' ')[1:greatest((len(string_split(t, ' ')) * 6) // 10, 10)], ' ')
      |  FROM base WHERE doc_id % 11 = 3),
      |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM corpus),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4),
      |    i -> array_to_string(toks[i:i+4], ' '))) AS shingle
      |  FROM tk WHERE len(toks) >= 5)),
      |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256) kept
      |  USING (shingle))""".stripMargin

  /** 16 per-permutation MIN aggregates over md5-derived hashes — the exact
    * SQL image of `minhashSignature(..., portable = true)`.
    */
  private val minhashLshSql: String = {
    val p = Dedup.MinHashPrime
    val sigCols = (0 until 16)
      .map { i =>
        val (a, b) = Dedup.minhashPermCoeffs(i)
        s"  MIN(($a * hmod + $b) % $p) AS mh$i"
      }
      .mkString(",\n")
    val bandSelects = (0 until 8)
      .map(bi =>
        s"  SELECT doc_id, $bi AS band, md5(concat(mh${2 * bi}, ',', mh${2 * bi + 1})) AS bh FROM sig")
      .mkString("\n  UNION ALL\n")
    s"""WITH $corpusSql,
       |shh AS (SELECT doc_id, ${ph64("shingle")} % $p AS hmod FROM sh),
       |sig AS (SELECT doc_id,
       |$sigCols
       |FROM shh GROUP BY doc_id),
       |bands AS (
       |$bandSelects)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Signature + band + candidate CTEs shared with [[minhashLshSql]],
    * extended with per-pair component matches and the exact shingle
    * Jaccard — the SQL image of `minhashCalibration`.
    */
  private val minhashCalibrationSql: String = {
    val p = Dedup.MinHashPrime
    val sigCols = (0 until 16)
      .map { i =>
        val (a, b) = Dedup.minhashPermCoeffs(i)
        s"  MIN(($a * hmod + $b) % $p) AS mh$i"
      }
      .mkString(",\n")
    val bandSelects = (0 until 8)
      .map(bi =>
        s"  SELECT doc_id, $bi AS band, md5(concat(mh${2 * bi}, ',', mh${2 * bi + 1})) AS bh FROM sig")
      .mkString("\n  UNION ALL\n")
    val matchSum = (0 until 16)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $corpusSql,
       |shh AS (SELECT doc_id, ${ph64("shingle")} % $p AS hmod FROM sh),
       |sig AS (SELECT doc_id,
       |$sigCols
       |FROM shh GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |est AS (SELECT id_a, id_b, CAST(($matchSum) * 62500 AS BIGINT) AS est_micros
       |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM sh GROUP BY doc_id),
       |itr AS (SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS i
       |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle GROUP BY 1, 2),
       |per AS (SELECT est_micros,
       |    COALESCE(i, 0) * 1000000 // (za.s + zb.s - COALESCE(i, 0)) AS exact_micros
       |  FROM est LEFT JOIN itr USING (id_a, id_b)
       |  JOIN sz za ON za.doc_id = est.id_a JOIN sz zb ON zb.doc_id = est.id_b)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(ABS(est_micros - exact_micros)) // COUNT(*) AS BIGINT) AS mean_abs_err_micros,
       |  CAST(MAX(ABS(est_micros - exact_micros)) AS BIGINT) AS max_abs_err_micros,
       |  CAST(SUM(est_micros - exact_micros) AS BIGINT) AS sum_signed_err
       |FROM per""".stripMargin
  }

  /** 60 per-bit vote sums + bit reassembly + 4x15-bit banding — the exact
    * SQL image of `simhashPortable(..., 60)` + `simhashPairs(..., 3, 15)`.
    */
  private val simhashSql: String = {
    val votes = (0 until 60)
      .map(b => s"  SUM(((h >> $b) & 1) * 2 - 1) AS v$b")
      .mkString(",\n")
    val bits = (0 until 60)
      .map(b => s"(CASE WHEN v$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val bandSelects = (0 until 4)
      .map(k => s"  SELECT doc_id, simhash, $k AS band, (simhash >> ${15 * k}) & 32767 AS bh FROM sh2")
      .mkString("\n  UNION ALL\n")
    // reuses the SHARED corpusSql fixture (tk/sh/shc ride along unreferenced
    // and unevaluated) — an inlined copy here drifted from the shared one
    // when the borderline family landed, and the 85-vs-83 row mismatch that
    // followed is exactly the bug class sharing prevents
    s"""WITH $corpusSql,
       |tok AS (SELECT doc_id, ${ph64("tok")} AS h FROM (
       |  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM corpus)),
       |v AS (SELECT doc_id,
       |$votes
       |FROM tok GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, $bits AS simhash FROM v),
       |bands AS (
       |$bandSelects)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |WHERE hamming <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dedup_minhash_lsh" -> minhashLshSql,
    "minhash_calibration" -> minhashCalibrationSql,
    "dedup_simhash" -> simhashSql,
    "dedup_pipeline_e2e" ->
      s"""WITH $corpusSql,
        |exact_d AS (SELECT doc_id, t FROM (
        |  SELECT doc_id, t, ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn FROM corpus)
        |  WHERE rn = 1),
        |tk2 AS (SELECT doc_id, string_split(t, ' ') AS toks FROM exact_d),
        |sh2 AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> array_to_string(toks[i:i+4], ' '))) AS shingle
        |  FROM tk2 WHERE len(toks) >= 5)),
        |shc2 AS (SELECT sh2.doc_id, sh2.shingle FROM sh2 JOIN (
        |  SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 256) kept2
        |  USING (shingle)),
        |counts2 AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
        |pairs2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM shc2 a JOIN shc2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |drop2 AS (SELECT DISTINCT id_b AS doc_id FROM pairs2
        |  JOIN counts2 ca ON ca.doc_id = id_a
        |  JOIN counts2 cb ON cb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.6)
        |SELECT COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM exact_d WHERE doc_id NOT IN (SELECT doc_id FROM drop2)""".stripMargin,
    "dedup_incremental" ->
      """WITH n AS (SELECT doc_id,
        |    coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '') AS t
        |  FROM documents),
        |inc AS (SELECT doc_id, t FROM n WHERE doc_id % 3 = 0),
        |st AS (SELECT DISTINCT t FROM n WHERE doc_id % 3 <> 0),
        |fib AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, t, ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
        |    FROM inc) x WHERE rn = 1),
        |acc AS (SELECT doc_id FROM fib
        |  WHERE NOT EXISTS (SELECT 1 FROM st WHERE st.t = fib.t))
        |SELECT (SELECT COUNT(*) FROM inc) AS n_incoming,
        |  (SELECT COUNT(*) FROM fib) AS n_first_in_batch,
        |  (SELECT COUNT(*) FROM acc) AS n_accepted,
        |  (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM acc) AS accepted_id_sum""".stripMargin,
    "dedup_exact" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |    UNION ALL
        |    SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
        |  d AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM all_docs)
        |SELECT COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM d WHERE rn = 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $corpusSql,
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) AS jaccard
        |FROM pairs
        |  JOIN counts ca ON ca.doc_id = id_a
        |  JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_containment" ->
      s"""WITH $corpusSql,
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  CAST(ca.n_sh AS BIGINT) AS na, CAST(cb.n_sh AS BIGINT) AS nb,
        |  CAST(common * 1000000 // LEAST(ca.n_sh, cb.n_sh) AS BIGINT) AS contain_micros
        |FROM pairs
        |  JOIN counts ca ON ca.doc_id = id_a
        |  JOIN counts cb ON cb.doc_id = id_b
        |WHERE common * 1000000 // LEAST(ca.n_sh, cb.n_sh) >= 900000
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $corpusSql,
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairsj AS (SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) p
        |  JOIN counts ca ON ca.doc_id = id_a
        |  JOIN counts cb ON cb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairsj
        |  UNION SELECT id_b, id_a FROM pairsj),
        |reach(node, r) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |lab AS (SELECT node, LEAST(node, MIN(r)) AS cluster_rep
        |  FROM reach GROUP BY node),
        |q AS (SELECT doc_id AS node,
        |    CAST(len(list_filter(string_split(t, ' '), tk -> tk IN ('the','of','and','to','a','in'))) AS BIGINT)
        |      * 1000 // greatest(CAST(len(string_split(t, ' ')) AS BIGINT), 1) AS q
        |  FROM corpus),
        |mem AS (SELECT lab.node, cluster_rep, q FROM lab JOIN q USING (node)),
        |best AS (SELECT cluster_rep, node AS kept_id, q AS kept_quality,
        |    ROW_NUMBER() OVER (PARTITION BY cluster_rep ORDER BY q DESC, node) AS rn FROM mem),
        |cnt AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_members FROM mem GROUP BY 1)
        |SELECT best.cluster_rep, CAST(kept_id AS BIGINT) AS kept_id, kept_quality, n_members
        |FROM best JOIN cnt USING (cluster_rep) WHERE rn = 1 ORDER BY cluster_rep""".stripMargin,
    "dedup_quality_shift" ->
      s"""WITH RECURSIVE $corpusSql,
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairsj AS (SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) p
        |  JOIN counts ca ON ca.doc_id = id_a
        |  JOIN counts cb ON cb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairsj
        |  UNION SELECT id_b, id_a FROM pairsj),
        |reach(node, r) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |lab AS (SELECT node, LEAST(node, MIN(r)) AS cluster_rep
        |  FROM reach GROUP BY node),
        |q AS (SELECT doc_id AS node,
        |    CAST(len(list_filter(string_split(t, ' '), tk -> tk IN ('the','of','and','to','a','in'))) AS BIGINT)
        |      * 1000 // greatest(CAST(len(string_split(t, ' ')) AS BIGINT), 1) AS q
        |  FROM corpus),
        |mem AS (SELECT lab.node, cluster_rep, q FROM lab JOIN q USING (node)),
        |best AS (SELECT cluster_rep, node AS kept_node,
        |    ROW_NUMBER() OVER (PARTITION BY cluster_rep ORDER BY q DESC, node) AS rn FROM mem),
        |lbl AS (SELECT mem.node, mem.q,
        |    CASE WHEN mem.node = b.kept_node THEN 1 ELSE 0 END AS kept
        |  FROM mem JOIN (SELECT cluster_rep, kept_node FROM best WHERE rn = 1) b
        |  USING (cluster_rep))
        |SELECT q // 100 AS bucket, CAST(SUM(kept) AS BIGINT) AS kept_n,
        |  CAST(SUM(1 - kept) AS BIGINT) AS dropped_n
        |FROM lbl GROUP BY 1""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    // the star-contraction route must land on the SAME transitive closure
    "dedup_clusters_star" -> clustersOracle,
    // ground-truth formulation: plain sliding 12-grams grouped by their
    // TEXT (no digest — the engine's md5-grain shuffle is an internal
    // narrowing the oracle deliberately does NOT mirror, so the 128-bit
    // equality assumption is audited against raw text at every SF)
    "dedup_substrings" ->
      s"""WITH base AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
        |tk0 AS (SELECT doc_id, t, string_split(t, ' ') AS tk,
        |    CAST(len(string_split(t, ' ')) AS BIGINT) AS n0 FROM base),
        |ins AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN array_to_string(list_concat(list_concat(
        |        tk[1:least(doc_id % 17, n0)], string_split('$SpanA', ' ')),
        |        tk[least(doc_id % 17, n0) + 1:]), ' ')
        |      WHEN doc_id % 6 = 2 THEN array_to_string(list_concat(list_concat(
        |        tk[1:least(doc_id % 13, n0)],
        |        string_split('uq' || doc_id || ' $SpanB uq' || doc_id, ' ')),
        |        tk[least(doc_id % 13, n0) + 1:]), ' ')
        |      WHEN doc_id % 6 = 4 THEN array_to_string(list_concat(list_concat(
        |        tk[1:least(doc_id % 11, n0)], string_split('$SpanC', ' ')),
        |        tk[least(doc_id % 11, n0) + 1:]), ' ')
        |      ELSE t END AS txt
        |  FROM tk0),
        |tok AS (SELECT doc_id, string_split(txt, ' ') AS toks FROM ins),
        |grams AS (SELECT doc_id, p, array_to_string(toks[p + 1:p + 12], ' ') AS gram
        |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 11)) AS p
        |        FROM tok WHERE len(toks) >= 12)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
        |starts AS (SELECT doc_id, p FROM grams JOIN dup USING (gram)),
        |cov AS (SELECT DISTINCT doc_id, ti
        |  FROM (SELECT doc_id, unnest(range(p, p + 12)) AS ti FROM starts)),
        |tokrow AS (SELECT doc_id, ti, toks[CAST(ti + 1 AS INT)] AS w
        |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS ti FROM tok)),
        |kept AS (SELECT k.doc_id, k.ti, k.w FROM tokrow k
        |  ANTI JOIN cov c ON k.doc_id = c.doc_id AND k.ti = c.ti),
        |reasm AS (SELECT doc_id, COUNT(*) AS n_kept,
        |    string_agg(w, ' ' ORDER BY ti) AS cleaned
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        |  CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
        |  md5(COALESCE(r.cleaned, '')) AS cleaned_md5
        |FROM tok t LEFT JOIN reasm r ON t.doc_id = r.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "dedup_lines" ->
      """WITH corpus AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'copyright header all terms of use apply here ' || text
        |         ELSE text END AS txt
        |  FROM documents),
        |tk AS (SELECT doc_id, string_split(txt, ' ') AS toks FROM corpus),
        |segs AS (SELECT doc_id, pos,
        |    array_to_string(toks[pos * 8 + 1 : pos * 8 + 8], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(0, (len(toks) + 7) // 8 - 1)) AS pos FROM tk)),
        |hot AS (SELECT seg FROM segs GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 3),
        |kept AS (SELECT s.* FROM segs s ANTI JOIN hot h ON s.seg = h.seg),
        |reasm AS (SELECT doc_id, COUNT(*) AS n_kept,
        |    string_agg(seg, ' ' ORDER BY pos) AS cleaned
        |  FROM kept GROUP BY doc_id),
        |nsg AS (SELECT doc_id, COUNT(*) AS n_seg FROM segs GROUP BY doc_id)
        |SELECT c.doc_id, n.n_seg,
        |  CAST(n.n_seg - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
        |  md5(COALESCE(r.cleaned, '')) AS cleaned_md5
        |FROM corpus c JOIN nsg n ON c.doc_id = n.doc_id
        |LEFT JOIN reasm r ON c.doc_id = r.doc_id
        |ORDER BY c.doc_id""".stripMargin,
    "fuzzy_match_suppliers" ->
      """WITH base AS (SELECT s_suppkey AS id, s_name AS nm FROM supplier),
        |planted AS (SELECT s_suppkey + 500000 AS id,
        |    substr(s_name, 1, CAST(s_suppkey % 18 AS INT)) || substr(s_name, CAST(s_suppkey % 18 AS INT) + 2) AS nm
        |  FROM supplier WHERE s_suppkey % 7 = 0),
        |names AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |keys0 AS (SELECT id, nm, unnest(list_prepend(nm,
        |    list_transform(generate_series(1, len(nm)), i -> substr(nm, 1, i - 1) || substr(nm, i + 1)))) AS k
        |  FROM names),
        |keys AS (SELECT DISTINCT id, nm, k FROM keys0),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS nm_a, b.nm AS nm_b
        |  FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id)
        |SELECT id_a, id_b, CAST(levenshtein(nm_a, nm_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(nm_a, nm_b) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_semantic" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
        |    UNION ALL
        |    SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 9 = 0),
        |  m0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM corpus),
        |  m AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM m0),
        |  ${graft.ext.IvfIndex.oracleCtes(64, 2, 1)},
        |  p AS (SELECT a.vec_id AS kept_id, b.vec_id AS dropped_id,
        |      list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
        |    FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.9),
        |  r AS (SELECT dropped_id, kept_id, cos,
        |      ROW_NUMBER() OVER (PARTITION BY dropped_id ORDER BY kept_id) AS rk FROM p)
        |SELECT dropped_id, kept_id, cos FROM r WHERE rk = 1 ORDER BY dropped_id""".stripMargin,
    "dedup_embedding" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
        |    UNION ALL
        |    SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 9 = 0),
        |  bitsv AS (SELECT ${Vectors.signBucketBitsSql("COUNT(*)")} AS bits FROM corpus),
        |  base AS (SELECT vec_id,
        |    array_to_string(list_transform(generate_series(1, (SELECT bits FROM bitsv)),
        |      i -> CASE WHEN embedding[i] > 0 THEN '1' ELSE '0' END), '') AS bucket,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM corpus),
        |  n AS (SELECT vec_id, bucket, v, sqrt(list_dot_product(v, v)) AS nrm FROM base)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
        |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
  )
}
