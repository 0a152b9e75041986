package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM-data pipelines (SURVEY.md §2B X1/X2):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
  * near-dup. All shuffle-conscious: candidate generation is a key-join
  * (shingle / band / bucket), never an O(n^2) cross join.
  */
object Dedup {

  /** 60-bit hash with a bit-identical DuckDB equivalent:
    * Spark `conv(substr(md5(x),1,15),16,10)::bigint` ==
    * DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    * 15 hex digits keep the value positive in a signed 64-bit, so casts,
    * comparisons, shifts and string rendering agree across engines. Used
    * wherever a hash must be oracle-checkable (MinHash, SimHash votes,
    * winnowing grams, KMV sketches); xxhash64 stays the fast in-engine
    * default where no oracle applies.
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** X1 — exact dedup keeping the smallest tieBreak value per key group.
    * `row_number` over (key, tieBreak) — one shuffle on the key; at scale
    * this is the standard "keep first version of each content hash" pass.
    * The window key is the SHA-256 of the key columns, not the columns
    * themselves: partitioning by raw document text would ship every byte
    * of the corpus through the exchange as key material a second time.
    * 32-byte digests keep the shuffle width flat no matter how wide the
    * dedup key is (collision odds ~2^-128 — the standard content-hash
    * dedup contract).
    *
    * Grouping contract: keys are compared by their STRING RENDERING.
    * For the string/text keys this op exists for, that is value
    * equality; for floating-point keys it differs from raw column
    * partitioning at exactly the IEEE aliases ("-0.0" != "0.0",
    * NaN payloads collapse) — normalize such keys before deduping. The
    * null sentinel contains a U+001F unit-separator byte, which cannot appear
    * in the engine's normalized text but is not a universal guarantee
    * for arbitrary binary-ish string columns.
    */
  def exactDedup(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    // unit-separator-joined with a sentinel for nulls so ("a", null) !=
    // ("a", "") and column boundaries cannot alias ("ab","c" vs "a","bc")
    val key = sha2(
      concat_ws(
        "\u001f",
        keyCols.map(c => coalesce(col(c).cast(StringType), lit("\u001f<null>"))): _*),
      256)
    val w = Window.partitionBy(key).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** RAW word n-gram shingle pairs per document: (idCol, shingle), a
    * shingle repeated within a doc appearing once per occurrence. Docs
    * shorter than n words are dropped. This is one tokenize pass and one
    * explode — no dedup work of any kind — for consumers whose
    * downstream AGGREGATION dedups anyway (`count_distinct`, a distinct
    * exchange, a groupBy on the shingle key). Round 5 measured the
    * per-row alternatives and both lose: `array_distinct` on string
    * arrays degrades to O(len²) semantic-equality scans (~80 s/query at
    * sf1 vs ~7 s), and a sort+neighbor-filter HOF chain gets its
    * intermediate inlined by projection collapse into per-element
    * re-evaluation (worse still). Hash aggregation dedups map-side at
    * O(len) — the engine already has the right tool; hand it the raw
    * stream.
    */
  def wordShinglesRaw(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(TextStats.normText(col(textCol)), " ")
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("shingle"))
  }

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    * Docs shorter than n words produce no shingles.
    *
    * The trailing `.distinct()` is DELIBERATE even though rows are
    * already unique (per-doc `array_distinct` + id in the key): its
    * exchange is the shared MATERIALIZATION point every multi-branch
    * consumer reuses. jaccard/MinHash/LSH plans reference the shingle
    * table 2–4 times (self-join sides, df-cap vocabulary, per-doc
    * counts); with the exchange, the tokenize+HOF chain runs ONCE and
    * every branch reads a ReusedExchange — without it, each branch
    * re-tokenizes the corpus (measured: corpus_build_e2e 14 s → 88 s at
    * sf1 when round 5 briefly dropped it). Single-pass consumers that
    * never re-branch should use [[wordShinglesRaw]] directly and skip
    * the exchange entirely (see `CorpusOps.contamination`). Raw
    * (possibly repeated) shingles feed the exchange directly — the hash
    * aggregate dedups map-side, so paying any per-row dedup first would
    * be doing the same work twice.
    */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    wordShinglesRaw(df, idCol, textCol, n).distinct()

  /** X2 — n-gram Jaccard near-dup pairs. Candidates = documents sharing at
    * least one shingle (equi-join on the shingle key, the scalable path);
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) from exact distinct counts.
    *
    * `dfCap` bounds the self-join blowup: a shingle appearing in d
    * documents contributes d^2 join rows, so one boilerplate header shared
    * by 10^6 docs would be a single-key cartesian at 100 TB. Shingles with
    * document frequency > dfCap are dropped from CANDIDATE GENERATION only
    * (standard MinHash-family practice — ubiquitous shingles carry no
    * discriminative signal); per-doc set sizes in the Jaccard denominator
    * still count every shingle, so scores for surviving pairs only shift
    * when a capped shingle was genuinely shared. Join work is then
    * <= dfCap * |distinct shingles| rows, hot keys bounded by dfCap^2.
    */
  def jaccardPairs(
      shingles: DataFrame,
      idCol: String,
      minJaccard: Double,
      dfCap: Int = 256): DataFrame = {
    val counts = shingles.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val kept = shingles.join(
      shingles
        .groupBy("shingle")
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= dfCap)
        .select("shingle"),
      Seq("shingle"))
    val a = kept.select(col(idCol).as("id_a"), col("shingle"))
    val b = kept.select(col(idCol).as("id_b"), col("shingle"))
    val common = a
      .join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col(idCol).as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn(
        "jaccard",
        col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** X2 — shingle-containment near-dup pairs: C(A,B) = |A∩B| / min(|A|,|B|)
    * in integer micros (one floor division — exact in both engines). The
    * asymmetric companion to [[jaccardPairs]]: a short document quoted or
    * truncated from a long one has containment ≈ 1 while its Jaccard is
    * only |short|/|long| — the subset/quotation duplicates every corpus
    * audit after Lee et al. looks for and symmetric Jaccard structurally
    * under-scores. Candidate generation and dfCap semantics are identical
    * to [[jaccardPairs]] (equi-join on the shingle key, document-frequency
    * cap on candidate generation ONLY — per-doc set sizes in the
    * denominator still count every shingle), so the scale shape is the
    * same accepted <= dfCap · |distinct shingles| join bound.
    */
  def containmentPairs(
      shingles: DataFrame,
      idCol: String,
      minContainMicros: Long,
      dfCap: Int = 256): DataFrame = {
    val counts = shingles.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val kept = shingles.join(
      shingles
        .groupBy("shingle")
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= dfCap)
        .select("shingle"),
      Seq("shingle"))
    val a = kept.select(col(idCol).as("id_a"), col("shingle"))
    val b = kept.select(col(idCol).as("id_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast(LongType).as("common"))
      .join(counts.select(col(idCol).as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("contain_micros",
        expr("common * 1000000 div least(na, nb)"))
      .filter(col("contain_micros") >= minContainMicros)
      .select(col("id_a"), col("id_b"), col("common"),
        col("na").cast(LongType).as("na"), col("nb").cast(LongType).as("nb"),
        col("contain_micros"))
  }

  /** Duplicate clusters from a near-dup pair list: connected components by
    * iterative min-label propagation. Each node's label converges to the
    * smallest id reachable through the undirected pair graph — the
    * canonical "keep this one" representative per duplicate cluster.
    *
    * Scale shape: every round is ONE shuffle keyed by node id (join labels
    * to edges + min-aggregate); rounds needed = component diameter.
    * Near-dup clusters are dense and shallow (a boilerplate template and
    * its variants all pair with each other), so a handful of rounds
    * suffices in practice — the same reasoning GraphFrames' connected
    * components relies on before switching to large-star/small-star,
    * which is the upgrade path if 100 TB corpora ever produce long chains.
    * Each round's labels are cut over via `localCheckpoint` — the label
    * plan references itself twice per round (neighbor join + union), so
    * without truncation the logical plan DOUBLES every iteration and
    * Catalyst analysis goes exponential long before the data does. On a
    * real cluster use reliable `checkpoint` (HDFS-backed) for the same
    * truncation plus executor-loss tolerance. The driver-side convergence
    * probe fetches ONE aggregate row per round (the decimal label-sum
    * signature below), never row data.
    *
    * Returns (node, cluster) — every endpoint of every pair, labeled by
    * its cluster's minimum id. Singleton documents (no pairs) are absent:
    * callers union them back as their own cluster if needed.
    */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    // seed with the 1-hop minimum (node vs its direct neighbors) — one
    // aggregation on the already-shuffled edge list, no join; for the
    // dense shallow clusters near-dup graphs produce this IS the fixpoint,
    // so the loop below typically runs a single confirming round
    var labels = edges
      .groupBy(col("src").as("node"))
      .agg(min("dst").as("__m"))
      .select(col("node"), least(col("node"), col("__m")).as("cluster"))
      .localCheckpoint(true)
    // Convergence probe: per-node labels are non-increasing, so the global
    // label sum strictly decreases until the fixpoint — one shuffle-free
    // partial aggregate over the just-checkpointed frame, instead of a
    // self-join diff (which costs an extra 2-stage shuffle per round).
    // decimal(38) sum: no wraparound aliasing even with 2^60-scale ids
    // over billions of nodes
    def signature(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast(DecimalType(38, 0)))).first().getDecimal(0)
    var converged = false
    var it = 0
    var prevSig = signature(labels)
    while (!converged && it < maxIter) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("cluster"))
      labels = viaNeighbor
        .union(labels)
        .groupBy("node")
        .agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      val sig = signature(labels)
      converged = sig == prevSig
      prevSig = sig
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — the
    * documented upgrade path from [[duplicateClusters]]' min-label
    * propagation. Label propagation needs O(component diameter) rounds;
    * star contraction converges in O(log n) rounds even on path graphs,
    * which is what matters if a 100 TB corpus ever produces long
    * duplicate chains (label propagation stays the default: near-dup
    * clusters are dense and shallow, and its per-round cost is lower).
    *
    * Each star op is one aggregation + one equi-join keyed by node id:
    *  - large-star: every neighbor v > u links to m = min(N(u) ∪ {u})
    *  - small-star: every neighbor v <= u (and u itself) links to m
    * Edges stay canonical (parent < child); per-round localCheckpoint
    * truncates the self-referencing lineage exactly as in
    * [[duplicateClusters]]. Returns (node, cluster) like its sibling —
    * DedupSpec and a scalacheck property pin the two implementations to
    * identical output on chains, stars, cliques and random graphs.
    */
  def duplicateClustersStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 40): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    var edges = canon(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))).localCheckpoint(true)
    // star op over the directed adjacency: emit (v, m) for neighbors on
    // the requested side of u, where m = min(N(u) ∪ {u})
    def star(large: Boolean): DataFrame = {
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val m = nbrs
        .groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val side =
        if (large) col("v") > col("u") else col("v") <= col("u")
      val joined = nbrs
        .join(m, Seq("u"))
        .filter(side)
        .select(col("v").as("u"), col("m").as("v"))
      canon(if (large) joined else joined.union(m.select(col("u"), col("m").as("v"))))
    }
    // EXACT convergence in ONE driver action per round: both frames are
    // distinct canonical sets, so tag each side +1/-1, sum per edge, and
    // the sets are equal iff no edge sums nonzero (symmetric difference
    // empty). `isEmpty` early-outs at the first changed edge, and the
    // single keyed agg shuffles the same |new|+|old| rows the old
    // count + union-distinct-count pair did — minus their two extra
    // jobs. A hashed signature would risk silent early stop on a
    // collision — unlike the sibling duplicateClusters, whose per-node
    // labels are monotone non-increasing (sum equal there PROVES nothing
    // changed), star rounds rewrite edges non-monotonically, so only a
    // set check is sound.
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prevEdges = edges
      edges = star(large = true).localCheckpoint(true)
      edges = star(large = false).localCheckpoint(true)
      converged = edges.select(col("u"), col("v"), lit(1).as("__side"))
        .union(prevEdges.select(col("u"), col("v"), lit(-1).as("__side")))
        .groupBy("u", "v")
        .agg(sum(col("__side")).as("__s"))
        .filter(col("__s") =!= 0)
        .isEmpty
      it += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // converged: every edge is (child, componentMin) with min < child
    edges
      .select(col("v").as("node"), col("u").as("cluster"))
      .union(edges.select(col("u").as("node"), col("u").as("cluster")))
      .distinct()
  }

  /** X2 — MinHash signatures: numHashes min-hash values per doc from one
    * pass over exploded shingles (a single aggregation job). Each "hash
    * permutation" is xxhash64 seeded by the permutation index hashed
    * together with the shingle — no wrapping long arithmetic, so it is
    * safe under ANSI mode (Spark 4's default) where `h * a + b` would
    * throw ARITHMETIC_OVERFLOW.
    *
    * SURVEY §4 named a typed `Aggregator[h, Array[Long], Array[Long]]`
    * as the other custom-agg candidate (b). REJECTED after its sibling
    * (a) shipped ([[graft.ops.ModeAggregator]]): this shape is already
    * ONE codegen'd hash-aggregate whose numHashes `min` columns partial-
    * aggregate map-side — the shuffle carries per-(partition, doc)
    * signatures either way, so an object-hash Aggregator would save no
    * bytes while evicting the whole pipeline from whole-stage codegen
    * (kryo buffer, per-row virtual calls). Mode was different: there the
    * Aggregator DELETES an Expand of ncols×rows. No Expand exists here.
    */
  def minhashSignature(
      shingles: DataFrame,
      idCol: String,
      numHashes: Int,
      portable: Boolean = false): DataFrame = {
    // hash the shingle string ONCE, then derive each permutation by
    // rehashing the (index, hash) pair — numHashes cheap fixed-width
    // hashes instead of numHashes string traversals.
    // portable=true derives every permutation from ONE md5 via an affine
    // map mod a 30-bit prime ((a_i*h + b_i) mod p) — pure BIGINT
    // arithmetic that cannot overflow in either engine (a_i < 2^17,
    // h mod p < 2^30), so the whole signature -> band -> candidate path
    // is DuckDB-checkable at the cost of a single md5 per shingle row
    // instead of numHashes+1 of them.
    val base =
      if (portable)
        shingles.withColumn("__h", portableHash64(col("shingle")) % MinHashPrime)
      else shingles.withColumn("__h", xxhash64(col("shingle")))
    val aggs = (0 until numHashes).map { i =>
      val perm =
        if (portable) {
          val (a, b) = minhashPermCoeffs(i)
          (lit(a) * col("__h") + lit(b)) % MinHashPrime
        } else xxhash64(lit(i), col("__h"))
      min(perm).as(s"mh$i")
    }
    base.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** 30-bit prime field for the portable MinHash permutation family. */
  val MinHashPrime = 1073741789L

  /** Affine permutation coefficients (a_i, b_i); a_i nonzero mod the
    * prime for every practical numHashes.
    */
  def minhashPermCoeffs(i: Int): (Long, Long) =
    ((4097L * (i + 1)) % MinHashPrime, (65537L * i) % MinHashPrime)

  /** LSH banding: hash each band of bandSize signature values; docs
    * sharing any (band index, band hash) are candidates. Equi-join on the
    * band key — shuffle scales with docs x bands, not docs^2.
    */
  def lshCandidates(
      sig: DataFrame,
      idCol: String,
      numHashes: Int,
      bandSize: Int,
      portable: Boolean = false): DataFrame = {
    val nBands = numHashes / bandSize
    val bands = (0 until nBands).map { bi =>
      val cols = (bi * bandSize until (bi + 1) * bandSize).map(i => col(s"mh$i"))
      // band key: hash of the comma-joined signature slice. md5-of-string
      // when portable (decimal renderings of positive bigints are engine-
      // identical), xxhash64 otherwise.
      val bh =
        if (portable) md5(concat_ws(",", cols: _*))
        else xxhash64(concat_ws(",", cols: _*)).cast(StringType)
      struct(lit(bi).as("band"), bh.as("bh"))
    }
    val exploded = sig
      .select(col(idCol), explode(array(bands: _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bh").as("bh"))
    exploded
      .select(col(idCol).as("id_a"), col("band"), col("bh"))
      .join(exploded.select(col(idCol).as("id_b"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** X2 — 64-bit SimHash per document from whitespace tokens, computed by
    * a native per-row expression ([[org.apache.spark.sql.graftnative.SimHash64]]).
    * Narrow projection — zero shuffle, tokens never leave the row. (The
    * first implementation exploded tokens into a 64-conditional-sum
    * aggregation: one shuffle + a giant codegen unit; the expression
    * removes both.)
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      org.apache.spark.sql.graftnative.TextExpressions
        .simhash64(split(TextStats.normText(col(textCol)), " "))
        .as("simhash"))

  /** SimHash near-dup candidates: band the 64 bits into 4 x 16-bit keys;
    * docs sharing any band are candidates (Hamming<=3 pairs must share one
    * of 4 bands by pigeonhole when distance spreads). Verify with
    * bit_count(xor) <= maxHamming.
    */
  def simhashPairs(
      sim: DataFrame,
      idCol: String,
      maxHamming: Int,
      bandBits: Int = 16): DataFrame = {
    val mask = (1L << bandBits) - 1
    val banded = sim.select(
      col(idCol),
      col("simhash"),
      explode(
        array((0 until 4).map(k =>
          struct(lit(k).as("band"), shiftrightunsigned(col("simhash"), k * bandBits).bitwiseAND(mask).as("bh"))): _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded
      .select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("band"), col("bh"))
      .join(
        banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** X2 — oracle-checkable SimHash: md5-derived per-token bit votes,
    * aggregated with `bits` conditional sums. Slower than the native
    * [[org.apache.spark.sql.graftnative.SimHash64]] expression (explodes
    * tokens through a shuffle and carries a wide aggregate), but every
    * step — token split, [[portableHash64]] bits, vote signs, bit
    * reassembly — is plain SQL on both engines, so the resulting hashes
    * (and the band-join pairs built on them) are bit-identical in DuckDB.
    * Use the native expression for 100 TB runs and this one wherever
    * cross-engine verifiability matters more than throughput.
    */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(TextStats.normText(col(textCol)), " ")).as("tok"))
      .withColumn("__h", portableHash64(col("tok")))
    // vote_b = #tokens with bit b set minus #tokens with it clear
    val votes = (0 until bits).map { b =>
      sum(shiftrightunsigned(col("__h"), b).bitwiseAND(1L) * 2 - 1).as(s"v$b")
    }
    val sh = (0 until bits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy(idCol).agg(votes.head, votes.tail: _*).select(col(idCol), sh.as("simhash"))
  }

  /** X2 — exact cross-document repeated-substring removal (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better"
    * substring-level pass, reference arXiv:2107.06499 §4): delete every
    * token covered by a token window of length `k` whose normalized text
    * occurs in ≥ 2 DISTINCT documents, and reassemble the surviving
    * tokens in order — the layer between doc-level dedup (exact/MinHash/
    * SimHash) and fixed-grid line dedup ([[graft.queries.DedupQueries]]
    * `dedup_lines`), catching repeated spans at ANY offset. A maximal
    * repeated span of length L ≥ k is exactly a maximal run of L−k+1
    * consecutive duplicated k-gram starts, so covering each duplicated
    * start's k tokens and unioning reproduces the suffix-array answer
    * without a suffix array.
    *
    * Distributed shape (all linear, no pair enumeration anywhere):
    *   1. sliding k-grams (doc, pos, gram) — O(tokens) rows;
    *   2. candidate HOT HASHES: count ≥ 2 on xxhash64(gram) — the df
    *      pass shuffles 8-byte keys, not ~k·word strings (engine-internal
    *      hash: the oracle checks the final rewrite, not this step);
    *   3. exact verify: only hash-candidate occurrences carry their gram
    *      STRING into a countDistinct(doc) ≥ 2 — a hash collision can
    *      only ADD a candidate to this exact stage, never flip a result;
    *   4. covered = explode each duplicated start into its k token
    *      indices, distinct — bounded by k × duplicated-gram occurrences
    *      (the duplicated mass only, not the corpus);
    *   5. anti-join token rows on (doc, index), per-doc array_sort
    *      reassembly exactly like `dedup_lines`.
    *
    * Returns one row per input doc: (idCol, n_tok, n_dropped, cleaned) —
    * cleaned is "" for a fully-covered doc (never null), so callers can
    * hash it directly. Docs shorter than k tokens pass through whole
    * (Spark's `sequence(0, negative)` would generate a DESCENDING range,
    * so the gram builder filters n ≥ k explicitly).
    */
  def repeatedSubstringRewrite(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val toks = df
      .select(col(idCol).as("__id"), split(TextStats.normText(col(textCol)), " ").as("toks"))
      .withColumn("__n", size(col("toks")).cast(LongType))
    // THE SHUFFLE GRAIN IS A 16-BYTE DIGEST, NEVER THE GRAM TEXT: a
    // 12-token gram is ~100 B, and the round-8 sf10 decade run measured
    // the text riding the candidate shuffles at 4.76 GB (59× the sf1
    // bytes) once the duplicated-gram side outgrew AQE's broadcast
    // threshold — which it legitimately does (it is O(duplicated mass),
    // the flip is load-bearing, not a planning miss). The md5 digest is
    // position-free and 6× narrower, and 128-bit equality is the same
    // exactness class the correctness gate itself rests on (the oracle
    // hash-compares rows; the oracle for THIS query deliberately stays at
    // raw gram-text grain, so the digest is audited against ground truth
    // at every SF, not assumed). One narrow hash-aggregation replaces the
    // old three-pass hot-superset/verify dance.
    val grams = toks
      .filter(col("__n") >= k)
      .select(
        col("__id"),
        posexplode(expr(
          s"transform(sequence(0, size(toks) - $k), p -> array_join(slice(toks, p + 1, $k), ' '))")))
      .select(col("__id"), col("pos").as("__p"), unhex(md5(col("col"))).as("__gm"))
    val dup = grams.groupBy("__gm")
      .agg(countDistinct("__id").as("__df"))
      .filter(col("__df") >= 2)
      .select("__gm")
    val starts = grams.join(dup, Seq("__gm"), "left_semi").select("__id", "__p")
    val covered = starts
      .select(col("__id"), explode(expr(s"sequence(__p, __p + ${k - 1})")).as("__ti"))
      .distinct()
    val tokenRows = toks
      .select(col("__id"), posexplode(col("toks")))
      .select(col("__id"), col("pos").as("__ti"), col("col").as("__w"))
    val kept = tokenRows.join(covered, Seq("__id", "__ti"), "left_anti")
    val reasm = kept
      .groupBy("__id")
      .agg(
        count(lit(1)).as("__n_kept"),
        array_join(
          expr("transform(array_sort(collect_list(struct(__ti, __w))), x -> x.__w)"),
          " ").as("__cleaned"))
    toks
      .join(reasm, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        col("__n").as("n_tok"),
        (col("__n") - coalesce(col("__n_kept"), lit(0L))).cast(LongType).as("n_dropped"),
        coalesce(col("__cleaned"), lit("")).as("cleaned"))
  }
}
