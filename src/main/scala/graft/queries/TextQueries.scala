package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ext.TextStats
import graft.ext.TextStats._

/** Text-analysis queries (X4) over `documents`, all DuckDB-mirrored. */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val tokenStats: Q = (s, d) =>
    documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).cast(LongType).as("sum_tokens"),
        sum(regexTokenCount(col("text"))).cast(LongType).as("sum_rtokens"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .orderBy("lang")

  private val quality: Q = (s, d) =>
    documents(s, d)
      .select(floor(qualityScore(col("text")) * 10).cast(LongType).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  private val langId: Q = (s, d) =>
    documents(s, d)
      .select(col("lang"), langPred(col("text")).as("pred"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")

  private val fingerprints: Q = (s, d) =>
    documents(s, d)
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_fp"),
        min("fp").as("min_fp"))
      .orderBy("source")

  /** Winnowing (rolling-hash) fingerprint stats over portable md5-derived
    * gram hashes — the window-minimum selection itself is hash-checked
    * against DuckDB; selection properties are additionally covered by
    * WinnowingSpec.
    */
  private val winnowing: Q = (s, d) =>
    spread(documents(s, d), "doc_id") // r10 guide §1.2: heavy per-doc HOF on a 1-split scan
      .withColumn("t", normText(col("text")))
      // explode_outer + count(fp): sources whose docs all fingerprint to
      // empty still appear with n_fp = 0 instead of vanishing
      .select(
        col("source"),
        explode_outer(TextStats.winnowingFingerprintsNative(col("t"), 8, 4)).as("fp"))
      .groupBy("source")
      .agg(countDistinct(col("fp")).as("n_fp"), count(col("fp")).as("n_total"))
      .orderBy("source")

  /** Top-3 discriminative terms per (sampled) document by (tf desc,
    * df asc, term) — the TF-IDF ranking with an integer-exact score so
    * the whole explode -> tf -> df -> join -> window pipeline
    * hash-checks. Sampling every 50th doc keeps output rows bounded while
    * still exercising the full corpus-wide df aggregation.
    */
  private val tfidfTop: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val scored = TextStats.tfDf(
      documents(s, d).filter(col("doc_id") % 50 === 0), "doc_id", "text")
    val w = Window.partitionBy("doc_id").orderBy(desc("tf"), asc("df"), asc("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn").cast(LongType).as("rn"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rn")
  }

  /** Corpus-wide bigram counts, top 20 — the n-gram census pretraining
    * pipelines run for contamination/boilerplate checks. Compiles to
    * partial/final hash agg + TakeOrderedAndProject: no global sort.
    */
  private val bigrams: Q = (s, d) =>
    documents(s, d)
      .select(split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)

  /** Vocabulary induction + OOV audit: terms with document frequency >= 3
    * form the vocabulary; per language, report corpus token counts and
    * how many token OCCURRENCES fall outside the vocabulary (the
    * out-of-vocabulary rate a tokenizer build reports). Two aggregations
    * over the exploded term table: one to build the vocab (broadcast-size
    * at any corpus — vocabularies grow sub-linearly), one per-lang rollup.
    */
  private val vocabOov: Q = (s, d) => {
    val docs = documents(s, d)
    val terms = TextStats.terms(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val vocab = TextStats
      .terms(docs, "doc_id", "text")
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 3)
      .select(col("term"), lit(1L).as("__in_vocab"))
    terms
      .join(vocab, Seq("term"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).cast(LongType).as("n_oov"),
        countDistinct(col("term")).as("n_types"))
      .orderBy("lang")
  }

  /** Bigram language-model scoring — the perplexity-proxy quality filter
    * a pretraining pipeline runs with a small LM, expressed entirely in
    * the engine: "train" the LM as a corpus-wide bigram-count aggregate
    * (p(t2|t1) in integer millionths — (c_pair * 1e6) div c_prefix, so
    * the model is exact and engine-portable), then score every document
    * by joining its bigram instances back against the model (average
    * conditional probability, integer div). High-scoring docs are
    * predictable/repetitive text, low-scoring docs are unusual — the
    * same decision axis as a real LM filter, with zero floating point.
    * Scale shape: the model is a bigram-keyed aggregate (vocabulary²
    * bound, sub-linear in corpus size); scoring is one equi-join on the
    * bigram key — no broadcast of unbounded state, no driver loops.
    */
  private val lmBigramScore: Q = (s, d) => {
    val docs = documents(s, d)
    val bi = docs
      .select(col("doc_id"), col("source"), split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        col("source"),
        explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
          .as("bigram"))
      // the exploded bigram relation feeds BOTH the model aggregate and
      // the scoring join; materialize it once instead of re-exploding
      // (the branches' differing aggregations defeat exchange reuse)
      .localCheckpoint(true)
    val counts = bi.groupBy("bigram").agg(count(lit(1)).as("c_pair"))
    val prefixCounts = counts
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
      .groupBy("prefix")
      .agg(sum("c_pair").cast(LongType).as("c_prefix"))
    val model = counts
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
      .join(prefixCounts, Seq("prefix"))
      .select(col("bigram"), expr("(c_pair * 1000000L) div c_prefix").as("p_u"))
    bi.join(model, Seq("bigram"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bi"), sum("p_u").cast(LongType).as("p_sum"))
      .withColumn("score_u", expr("p_sum div n_bi"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("score_u").cast(LongType).as("score_sum"),
        min("score_u").cast(LongType).as("score_min"),
        max("score_u").cast(LongType).as("score_max"))
      .orderBy("source")
  }

  /** Hash-feature linear classifier — the fastText-style quality-model
    * pass expressed model-free: each token's weight is a deterministic
    * signed integer derived from its portable md5 hash (a frozen random
    * projection), a doc's score is the weight sum, and `keep` is
    * score > 0. The exact plumbing of a real learned linear model —
    * featurize -> weight-lookup -> per-doc reduce -> threshold — with a
    * weight table that needs no broadcast at any corpus size because it
    * is computed from the hash inline. Zero floating point.
    */
  private val classifierScore: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .withColumn("w",
        pmod(graft.ext.Dedup.portableHash64(col("tok")), lit(2001L)) - lit(1000L))
      .groupBy("doc_id", "source")
      .agg(sum("w").cast(LongType).as("w_sum"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("w_sum") > 0, 1L).otherwise(0L)).cast(LongType).as("n_keep"),
        sum("w_sum").cast(LongType).as("w_total"),
        min("w_sum").cast(LongType).as("w_min"),
        max("w_sum").cast(LongType).as("w_max"))
      .orderBy("source")

  /** BPE merge-candidate census — the first step of byte-pair-encoding
    * vocabulary induction: count adjacent symbol pairs across the corpus,
    * weighted by word frequency. Computed the way BPE training actually
    * does it — on the TYPE table (distinct words + counts), not the raw
    * token stream — so the pair explosion is vocabulary-bounded
    * (sub-linear in corpus size) no matter how big the corpus grows.
    */
  private val bpePairs: Q = (s, d) =>
    documents(s, d)
      .select(explode(split(normText(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(length(col("tok")) >= 2)
      .select(col("cnt"),
        explode(expr(
          "transform(sequence(1, char_length(tok) - 1), i -> substr(tok, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(sum("cnt").cast(LongType).as("n_occ"), count(lit(1)).as("n_types"))
      .orderBy(desc("n_occ"), asc("pair"))
      .limit(20)

  /** Boilerplate n-gram detection — the C4/RefinedWeb "remove text that
    * repeats across many documents" pass: a trigram shingle appearing in
    * >= 3 distinct docs is boilerplate; a doc whose shingle instances are
    * >= 25% boilerplate gets flagged (integer cross-multiply, no
    * division). Scale shape: the document-frequency table is
    * vocabulary-bounded; membership is one equi-join on the shingle
    * (broadcastable when the hot set is small, AQE decides); nothing is
    * ever all-pairs.
    */
  private val boilerplateNgrams: Q = (s, d) => {
    val tri = documents(s, d)
      .select(col("doc_id"), col("source"), split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"),
        explode(expr(
          "transform(sequence(1, size(toks) - 2), i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))")).as("g"))
      // three consumers (df census, per-doc totals, boilerplate counts)
      // with incompatible aggregations defeat exchange reuse — materialize
      // the exploded relation once instead of re-exploding per branch
      // (same persist-the-tokenized-corpus move as text_lm_score)
      .localCheckpoint(true)
    val hot = tri.groupBy("g")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 3)
      .select("g")
    val per = tri.groupBy("doc_id", "source").agg(count(lit(1)).as("n_g"))
    val bp = tri.join(hot, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_bp"))
    per.join(bp, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_g").cast(LongType).as("total_g"),
        sum("n_bp").cast(LongType).as("bp_g"),
        sum(when(col("n_bp") * 4 >= col("n_g"), 1L).otherwise(0L))
          .cast(LongType).as("n_flagged"))
      .orderBy("source")
  }

  /** Decile lift table — the standard evaluation of a quality/relevance
    * scorer before it gates a corpus: rank docs by score, split into ten
    * exact-NTILE buckets, report each bucket's positive rate and lift
    * over the base rate. The scorer here is English stopword density
    * (hits per 1000 tokens, integer) against the `lang = 'en'` label, so
    * the curve is genuinely informative (top deciles enriched) rather
    * than a flat-lift placebo. Deciles come from [[Prefix.globalRank]]
    * with the exact ceil-first-groups NTILE arithmetic (`order_deciles`
    * pattern — no no-partition window); lift's pos·total product runs in
    * decimal(38,0)/HUGEINT with ONE double division to micros.
    */
  private val classifierLiftDeciles: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val scored = documents(s, d)
      .select(col("doc_id"), col("lang"),
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("lang"),
        expr("cast(size(filter(toks, t -> t IN ('the','of','and','to','a','in'))) as bigint)")
          .as("hits"),
        expr("cast(size(toks) as bigint)").as("ntok"))
      .withColumn("score", expr("hits * 1000 div greatest(ntok, 1)"))
      .localCheckpoint(true) // rank + totals branches
    val totals = scored.agg(
      count(lit(1)).cast(LongType).as("total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).cast(LongType).as("pos_total"))
    val ranked = graft.ext.Prefix
      .globalRank(scored, Seq(desc("score"), asc("doc_id")), "rnk")
      .crossJoin(broadcast(totals))
    val q = (col("total") / 10).cast(LongType)
    val r = col("total") % 10
    val bigSpan = (q + 1) * r
    ranked
      .withColumn(
        "decile",
        when(col("rnk") <= bigSpan, ((col("rnk") - 1) / (q + 1)).cast(LongType) + 1)
          .otherwise(r + ((col("rnk") - bigSpan - 1) / q).cast(LongType) + 1)
          .cast(LongType))
      .groupBy("decile")
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).cast(LongType).as("pos"),
        min("total").as("total"), min("pos_total").as("pos_total"))
      .withColumn("pos_rate_micros", expr("pos * 1000000 div n"))
      .withColumn(
        "lift_micros",
        floor((col("pos").cast(dec) * col("total").cast(dec)).cast(DoubleType) * lit(1e6) /
          (col("n").cast(dec) * col("pos_total").cast(dec)).cast(DoubleType)).cast(LongType))
      .select("decile", "n", "pos", "pos_rate_micros", "lift_micros")
  }

  /** Tie-aware exact ROC AUC of the en-stopword-density scorer against
    * the `lang = 'en'` label via the rank-sum (Mann–Whitney U) identity
    * AUC = U/(n₊n₋), U = Σ₊Σ₋([s₊>s₋] + ½[s₊=s₋]) — computed
    * AGGREGATE-FIRST: one hash agg to (score → n₊, n₋) bounds everything
    * downstream at the score cardinality (≤1001 for a permille density),
    * then ONE [[graft.ext.Prefix.runningSum]] of negatives in score order
    * gives 2U = Σ_s n₊(s)·(2·neg_below(s) + n₋(s)) exactly in integers
    * (doubled so ties need no halves); decimal38/HUGEINT products, one
    * integral division to micros. No per-document window and no corpus
    * sort — the textbook "sort all scores" formulation collapses to
    * O(|scores|) after the pre-agg. This is a SCORER AUDIT: on this
    * fixture the density scorer measures ≈ chance (auc_micros straddles
    * 500000 across SFs — 437157 / 529247 / 504912 — so BOTH verdict
    * directions are witnessed), which is the audit's finding to report,
    * exactly as minhash_calibration reports estimator error rather than
    * assuming it. u2 renders as int64 (exceeds it only past ~4e6 docs ×
    * balanced classes; the internal decimal38 sum is good to ~1e19 docs).
    */
  private val rocAucExact: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val g = documents(s, d)
      .select(col("lang"),
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"))
      .select(col("lang"),
        expr("cast(size(filter(toks, t -> t IN ('the','of','and','to','a','in'))) as bigint)")
          .as("hits"),
        expr("cast(size(toks) as bigint)").as("ntok"))
      .select(expr("hits * 1000 div greatest(ntok, 1)").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("score")
      .agg(sum("pos").cast(LongType).as("np"),
        (count(lit(1)) - sum("pos")).cast(LongType).as("nn"))
    graft.ext.Prefix
      .runningSum(g, lit(0L), Seq(col("score").asc), col("nn"), "cumneg")
      .agg(
        sum(col("np").cast(dec) *
          (lit(2L) * (col("cumneg") - col("nn")).cast(dec) + col("nn").cast(dec)))
          .cast(dec).as("u2"),
        sum("np").cast(LongType).as("pos_total"),
        sum("nn").cast(LongType).as("neg_total"))
      .select(col("pos_total"), col("neg_total"),
        col("u2").cast(LongType).as("u2"),
        expr("u2 * 1000000 div (cast(2 as decimal(38,0)) * pos_total * neg_total)")
          .as("auc_micros"))
  }

  /** Cohen's κ inter-annotator agreement between two INDEPENDENT
    * deterministic labelers of the corpus — annotator A: en-stopword
    * density ≥ 4% (the [[classifierLiftDeciles]] scorer thresholded),
    * annotator B: en marker count ≥ zh marker count (the en-vs-zh clause
    * of [[TextStats.langPred]]) — the reliability statistic a labeling
    * pipeline reports before trusting its labels. κ = (N·Σdiag −
    * Σ_c row_c·col_c) / (N² − Σ_c row_c·col_c): numerator and denominator
    * exact in decimal38/HUGEINT, ONE pinned double division to micros
    * (the assortativity render pattern — both engines floor the same
    * IEEE quotient; κ may be negative, and a truncating integral div
    * would round negatives differently). One corpus scan to a 4-cell
    * census; everything after is constant-size. All four cells live at
    * every SF (the thinnest, a=0∧b=1, probed 8/14/87).
    */
  private val annotatorKappa: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val m = documents(s, d)
      .select(
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"),
        lower(col("text")).as("lt"))
      .select(
        expr("cast(size(filter(toks, t -> t IN ('the','of','and','to','a','in'))) as bigint)")
          .as("hits"),
        expr("cast(size(toks) as bigint)").as("ntok"),
        regexp_count(col("lt"), lit("\\b(the|a|of)\\b")).cast(LongType).as("c_en"),
        regexp_count(col("lt"), lit("\\b(spark|hash|key)\\b")).cast(LongType).as("c_zh"))
      .select(
        when(expr("hits * 1000 div greatest(ntok, 1)") >= 40, 1L).otherwise(0L).as("a"),
        when(col("c_en") >= col("c_zh"), 1L).otherwise(0L).as("b"))
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(col("a") * col("b")).cast(LongType).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).cast(LongType).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).cast(LongType).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).cast(LongType).as("n00"))
    val pe = (col("n11") + col("n10")).cast(dec) * (col("n11") + col("n01")).cast(dec) +
      (col("n01") + col("n00")).cast(dec) * (col("n10") + col("n00")).cast(dec)
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      expr("(n11 + n00) * 1000000 div n").as("po_micros"),
      floor((col("n").cast(dec) * (col("n11") + col("n00")).cast(dec) - pe).cast(DoubleType) *
          lit(1e6) /
          (col("n").cast(dec) * col("n").cast(dec) - pe).cast(DoubleType))
        .cast(LongType).as("kappa_micros"))
  }

  /** Per-class precision / recall / F1 of the [[TextStats.langPred]]
    * marker language identifier against the `lang` ground truth — the
    * eval census behind every classifier gate. The confusion matrix is
    * ONE hash agg to ≤|lang|² cells; diagonal, row and column totals are
    * derivations of that constant-size frame (localCheckpointed once,
    * read three times), and every metric is a single integral division
    * in micros — F1 needs no harmonic-mean float: F1 = 2tp/(pred_n +
    * actual_n) exactly. Rows are keyed by ACTUAL class (all five live at
    * every SF); a class never predicted reports precision 0 via the
    * zero-guard rather than a NULL.
    */
  private val classifierPrf: Q = (s, d) => {
    val conf = documents(s, d)
      .select(col("lang"), langPred(col("text")).as("pred"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).cast(LongType).as("n"))
      .localCheckpoint(true) // three derivations of one ≤25-cell frame
    val diag = conf.filter(col("lang") === col("pred"))
      .select(col("lang").as("cls"), col("n").as("tp"))
    val act = conf.groupBy(col("lang").as("cls"))
      .agg(sum("n").cast(LongType).as("actual_n"))
    val prd = conf.groupBy(col("pred").as("cls"))
      .agg(sum("n").cast(LongType).as("pred_n"))
    act.join(diag, Seq("cls"), "left").join(prd, Seq("cls"), "left")
      .na.fill(0L, Seq("tp", "pred_n"))
      .select(col("cls"), col("tp"), col("pred_n"), col("actual_n"),
        expr("case when pred_n = 0 then 0L else tp * 1000000 div pred_n end")
          .as("precision_micros"),
        expr("tp * 1000000 div actual_n").as("recall_micros"),
        expr("2 * tp * 1000000 div (pred_n + actual_n)").as("f1_micros"))
  }

  /** Vocabulary growth curve — how many distinct terms the corpus has
    * introduced after its first 25/50/75/100 % of documents (doc_id
    * order): the Heaps-law diagnostic behind "will the vocabulary keep
    * exploding", kept TRANSCENDENTAL-FREE by reporting the exact curve
    * points instead of fitting K·n^β. Each term reduces to its FIRST
    * document rank (one agg over the term relation + one equi-join to
    * the [[graft.ext.Prefix.globalRank]]-ranked doc frame); the census is
    * one aggregate with ceil thresholds (N+3) div 4 etc. — integer-exact,
    * and the doc total rides as a broadcast 1-row frame.
    */
  private val vocabGrowthCurve: Q = (s, d) => {
    val ranked = graft.ext.Prefix.globalRank(
      documents(s, d).select(col("doc_id")), Seq(col("doc_id").asc), "r")
      .localCheckpoint(true) // join target + doc total
    val n = ranked.agg(count(lit(1)).cast(LongType).as("n"))
    val firstRank = TextStats.terms(documents(s, d), "doc_id", "text")
      .join(ranked, Seq("doc_id"))
      .groupBy("term").agg(min("r").cast(LongType).as("minr"))
    firstRank.crossJoin(broadcast(n))
      .agg(
        min("n").as("n_docs"),
        count(lit(1)).cast(LongType).as("vocab_total"),
        sum(when(col("minr") <= expr("(n + 3) div 4"), 1L).otherwise(0L))
          .cast(LongType).as("v25"),
        sum(when(col("minr") <= expr("(n + 1) div 2"), 1L).otherwise(0L))
          .cast(LongType).as("v50"),
        sum(when(col("minr") <= expr("(3 * n + 3) div 4"), 1L).otherwise(0L))
          .cast(LongType).as("v75"))
  }

  /** Burstiness (Fano factor) of the top-20 terms — variance-to-mean
    * ratio of per-document occurrence counts over ALL documents
    * (zero-count docs included via the broadcast doc total; they add
    * nothing to Σx or Σx², only to n): VMR = (N·Σx² − (Σx)²)/(N·Σx),
    * exact in decimal38/HUGEINT with one integral division to micros.
    * VMR ≈ 1e6 is Poisson scatter; bursty content words run higher,
    * boilerplate lower — the term-level quality signal. One term-doc
    * count agg; everything after runs on the 20-row vocabulary frame.
    */
  private val termBurstiness: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val td = TextStats.terms(documents(s, d), "doc_id", "text")
      .groupBy("term", "doc_id").agg(count(lit(1)).cast(LongType).as("x"))
    val stats = td.groupBy("term").agg(
      count(lit(1)).cast(LongType).as("df"),
      sum("x").cast(LongType).as("tf"),
      sum((col("x") * col("x")).cast(dec)).cast(dec).as("sxx"))
    val top = stats.orderBy(desc("tf"), asc("term")).limit(20)
    val n = documents(s, d).agg(count(lit(1)).cast(LongType).as("n"))
    top.crossJoin(broadcast(n))
      .select(col("term"), col("df"), col("tf"),
        expr("""(cast(n as decimal(38,0)) * sxx - cast(tf as decimal(38,0)) * tf)
                * 1000000 div (cast(n as decimal(38,0)) * tf)""").as("vmr_micros"))
  }

  /** McNemar's paired test between the two deterministic annotators of
    * [[annotatorKappa]], each scored against the `lang = 'en'` truth —
    * the right test for "is classifier A better than B on the SAME
    * examples" (two independent proportions would ignore the pairing).
    * Only the discordant cells matter: statistic (b−c)²/(b+c) exact to
    * integer micros, verdict against the baked χ²(1df, α=0.05) critical
    * value 3.841459 (the standard table constant, like Benford's baked
    * log10 table — no query-time transcendental). BOTH verdict branches
    * are witnessed across the driver SFs (stat ≈ 16.9 / 0.8 / 40.8 at
    * sf0.001/0.01/0.1).
    */
  private val mcnemarTest: Q = (s, d) => {
    val m = documents(s, d)
      .select(
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"),
        lower(col("text")).as("lt"),
        when(col("lang") === "en", 1L).otherwise(0L).as("t"))
      .select(col("t"),
        when(expr(
          """cast(size(filter(toks, tk -> tk IN ('the','of','and','to','a','in'))) as bigint)
             * 1000 div greatest(cast(size(toks) as bigint), 1)""") >= 40, 1L)
          .otherwise(0L).as("a"),
        when(regexp_count(col("lt"), lit("\\b(the|a|of)\\b")) >=
          regexp_count(col("lt"), lit("\\b(spark|hash|key)\\b")), 1L)
          .otherwise(0L).as("b"))
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(when(col("a") === col("t") && col("b") =!= col("t"), 1L).otherwise(0L))
          .cast(LongType).as("only_a"),
        sum(when(col("a") =!= col("t") && col("b") === col("t"), 1L).otherwise(0L))
          .cast(LongType).as("only_b"))
    m.select(col("n"), col("only_a"), col("only_b"),
      expr("""case when only_a + only_b = 0 then 0L
              else cast(only_a - only_b as decimal(38,0)) * (only_a - only_b)
                   * 1000000 div (only_a + only_b) end""").as("stat_micros"))
      .withColumn("significant",
        (col("stat_micros") > 3841459L).cast(LongType).as("significant"))
  }

  /** Quantile normalization of per-source quality scores onto the pooled
    * distribution — the calibration step before a single global quality
    * threshold can be fair across sources whose scorers drift (source A's
    * "40" must mean the same percentile as source B's "40"). Exact and
    * rank-based: each doc's within-source rank r of n_s (a SOURCE-sharded
    * [[graft.ext.Prefix.runningSum]] — never a per-source window sort)
    * maps to pooled rank ceil(r·N/n_s) in integers, and one equi-join
    * against the pooled rank frame ([[graft.ext.Prefix.globalRank]])
    * reads off the normalized score. The census reports the per-source
    * shift mass — exact ints end to end.
    */
  private val quantileNormalize: Q = (s, d) => {
    val scored = documents(s, d)
      .select(col("doc_id"), col("source"),
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("source"),
        expr("""cast(size(filter(toks, t -> t IN ('the','of','and','to','a','in'))) as bigint)
                * 1000 div greatest(cast(size(toks) as bigint), 1)""").as("sc"))
      .localCheckpoint(true) // sharded rank + pooled rank + sizes
    val ord = Seq(col("sc").asc, col("doc_id").asc)
    val ranked = graft.ext.Prefix
      .runningSum(scored, col("source"), ord, lit(1L), "r")
    val sizes = scored.groupBy("source").agg(count(lit(1)).cast(LongType).as("ns"))
    val pooled = graft.ext.Prefix
      .globalRank(scored, Seq(col("sc").asc, col("source").asc, col("doc_id").asc), "pr")
      .select(col("pr"), col("sc").as("norm_sc"))
    val n = scored.agg(count(lit(1)).cast(LongType).as("n"))
    ranked.join(sizes, Seq("source")).crossJoin(broadcast(n))
      .withColumn("pr", expr("(r * n + ns - 1) div ns"))
      .join(pooled, Seq("pr"))
      .groupBy("source")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(abs(col("norm_sc") - col("sc"))).cast(LongType).as("sum_abs_shift"),
        max(abs(col("norm_sc") - col("sc"))).cast(LongType).as("max_shift"))
      .withColumn("mean_shift_micros", expr("sum_abs_shift * 1000000 div n_docs"))
  }

  /** Quality-threshold sweep — the retained-mass curve a curation gate
    * reads before picking its cutoff: for thresholds 0/20/40/60/80 on
    * the integer density score, how many docs and how much token mass
    * survive. One scan, thresholds exploded from a 5-element literal
    * array (never five scans), integer micros shares against per-sweep
    * totals carried by the same aggregate.
    */
  private val qualityThresholdSweep: Q = (s, d) => {
    documents(s, d)
      .select(
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"))
      .select(
        expr("""cast(size(filter(toks, t -> t IN ('the','of','and','to','a','in'))) as bigint)
                * 1000 div greatest(cast(size(toks) as bigint), 1)""").as("sc"),
        expr("cast(size(toks) as bigint)").as("ntok"))
      .withColumn("thr", explode(array(lit(0L), lit(20L), lit(40L), lit(60L), lit(80L))))
      .groupBy("thr")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(when(col("sc") >= col("thr"), 1L).otherwise(0L)).cast(LongType).as("n_retained"),
        sum(when(col("sc") >= col("thr"), col("ntok")).otherwise(0L))
          .cast(LongType).as("tokens_retained"))
      .withColumn("retain_micros", expr("n_retained * 1000000 div n_docs"))
  }

  /** Brier score of the density scorer read as a probability of
    * `lang = 'en'` — the PROPER scoring rule that punishes both
    * miscalibration and indiscrimination, complementing
    * [[rocAucExact]] (pure ranking) and [[classifierPrf]] (thresholded):
    * prediction = permille density clamped to [0, 1000] scaled to
    * micros, label ∈ {0, 1e6}, and the mean squared error is EXACT —
    * per-doc (pred−t)² ≤ 1e12 summed in decimal38 (good past 1e25
    * docs), one integral division renders the e-12-scaled mean. The
    * all-zero predictor would score ~en-share·1e12; the audit reports
    * where this scorer actually lands.
    */
  private val brierScore: Q = (s, d) => {
    documents(s, d)
      .select(col("lang"),
        split(coalesce(normText(col("text")), lit("")), " ").as("toks"))
      .select(
        expr("""least(cast(size(filter(toks, tk -> tk IN ('the','of','and','to','a','in'))) as bigint)
                * 1000 div greatest(cast(size(toks) as bigint), 1), 1000) * 1000""").as("pred"),
        when(col("lang") === "en", 1000000L).otherwise(0L).as("t"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(((col("pred") - col("t")) * (col("pred") - col("t")))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("ss"))
      .select(col("n"), expr("ss div n").as("brier_e12"))
  }

  /** N-gram novelty census — the curation signal SlimPajama-style
    * pipelines rank sources by: per document, the share of its distinct
    * 8-gram shingles whose FIRST occurrence (minimum doc_id — ingestion
    * order in this corpus) is this document. Boilerplate-heavy or
    * templated docs score near 0, genuinely fresh text near 1e6; the
    * output is the bounded decile census of that per-doc score plus the
    * corpus gram totals per decile. Scale shape: one shingle explode
    * (linear in corpus tokens), one min hash agg keyed by gram, one
    * equi-join back, one per-doc agg, one ≤10-row census — no window,
    * no self-join; the gram→min(doc) frame is the same key-join bound
    * every dedup lane rides. Docs shorter than 8 tokens carry no
    * shingles and are absent by construction (documented; they have no
    * novelty to measure).
    */
  private val ngramNovelty: Q = (s, d) => {
    val docs = spread(documents(s, d), "doc_id").select( // r10: 8-gram explode on a 1-split scan
      col("doc_id"),
      coalesce(TextStats.normText(col("text")), lit("")).as("t"))
    val sh = graft.ext.Dedup.wordShingles(docs, "doc_id", "t", 8)
    val firstDoc = sh.groupBy("shingle")
      .agg(min("doc_id").cast(LongType).as("first_doc"))
    sh.join(firstDoc, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .cast(LongType).as("n_novel"))
      .withColumn("novelty_micros", expr("n_novel * 1000000 div n_grams"))
      .withColumn("decile", least(expr("novelty_micros div 100000"), lit(9L)))
      .groupBy("decile")
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum("n_grams").cast(LongType).as("sum_grams"),
        sum("n_novel").cast(LongType).as("sum_novel"))
      .orderBy("decile")
  }

  val queries: Map[String, Q] = Map(
    "ngram_novelty" -> ngramNovelty,
    "brier_score" -> brierScore,
    "quantile_normalize" -> quantileNormalize,
    "quality_threshold_sweep" -> qualityThresholdSweep,
    "vocab_growth_curve" -> vocabGrowthCurve,
    "term_burstiness" -> termBurstiness,
    "mcnemar_test" -> mcnemarTest,
    "roc_auc_exact" -> rocAucExact,
    "annotator_kappa" -> annotatorKappa,
    "classifier_prf" -> classifierPrf,
    "classifier_lift_deciles" -> classifierLiftDeciles,
    "text_lm_score" -> lmBigramScore,
    "text_classifier_score" -> classifierScore,
    "text_bpe_pairs" -> bpePairs,
    "text_boilerplate_ngrams" -> boilerplateNgrams,
    "text_vocab_oov" -> vocabOov,
    "text_tfidf_top" -> tfidfTop,
    "text_bigram_top" -> bigrams,
    "text_winnowing" -> winnowing,
    "text_token_stats" -> tokenStats,
    "text_quality_hist" -> quality,
    "text_langid_confusion" -> langId,
    "text_fingerprints" -> fingerprints
  )

  val oracle: Map[String, String] = Map(
    "ngram_novelty" ->
      """WITH base AS (SELECT doc_id,
        |    string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 7),
        |    i -> array_to_string(toks[i:i+7], ' '))) AS shingle
        |  FROM base WHERE len(toks) >= 8)),
        |fd AS (SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY 1),
        |per AS (SELECT sh.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_grams,
        |    CAST(SUM(CASE WHEN sh.doc_id = fd.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM sh JOIN fd USING (shingle) GROUP BY 1),
        |sc AS (SELECT n_grams, n_novel,
        |    CAST(least((n_novel * 1000000 // n_grams) // 100000, 9) AS BIGINT) AS decile
        |  FROM per)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
        |  CAST(SUM(n_novel) AS BIGINT) AS sum_novel
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "brier_score" ->
      """WITH sc AS (SELECT
        |    least(CAST(len(list_filter(toks, tk -> tk IN ('the','of','and','to','a','in'))) AS BIGINT)
        |      * 1000 // greatest(CAST(len(toks) AS BIGINT), 1), 1000) * 1000 AS pred,
        |    CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS t
        |  FROM (SELECT lang,
        |          string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks
        |        FROM documents))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(pred - t AS HUGEINT) * (pred - t)) // COUNT(*) AS BIGINT) AS brier_e12
        |FROM sc""".stripMargin,
    "quantile_normalize" ->
      """WITH sc AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' '),
        |      t -> t IN ('the','of','and','to','a','in'))) AS BIGINT) * 1000
        |      // greatest(CAST(len(string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ')) AS BIGINT), 1) AS sc
        |  FROM documents),
        |rk AS (SELECT source, sc,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY sc, doc_id) AS BIGINT) AS r
        |  FROM sc),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM sc GROUP BY 1),
        |pooled AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sc, source, doc_id) AS BIGINT) AS pr,
        |    sc AS norm_sc FROM sc),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc),
        |j AS (SELECT rk.source, rk.sc, pooled.norm_sc
        |  FROM rk JOIN sz USING (source) CROSS JOIN nn
        |  JOIN pooled ON pooled.pr = (rk.r * n + ns - 1) // ns)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(abs(norm_sc - sc)) AS BIGINT) AS sum_abs_shift,
        |  CAST(MAX(abs(norm_sc - sc)) AS BIGINT) AS max_shift,
        |  CAST(SUM(abs(norm_sc - sc)) AS BIGINT) * 1000000 // COUNT(*) AS mean_shift_micros
        |FROM j GROUP BY source""".stripMargin,
    "quality_threshold_sweep" ->
      """WITH sc AS (SELECT
        |    CAST(len(list_filter(toks, t -> t IN ('the','of','and','to','a','in'))) AS BIGINT) * 1000
        |      // greatest(CAST(len(toks) AS BIGINT), 1) AS sc,
        |    CAST(len(toks) AS BIGINT) AS ntok
        |  FROM (SELECT string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks
        |        FROM documents)),
        |th AS (SELECT CAST(unnest([0, 20, 40, 60, 80]) AS BIGINT) AS thr)
        |SELECT thr, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN sc >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN sc >= thr THEN ntok ELSE 0 END) AS BIGINT) AS tokens_retained,
        |  CAST(SUM(CASE WHEN sc >= thr THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS retain_micros
        |FROM sc CROSS JOIN th GROUP BY thr""".stripMargin,
    "vocab_growth_curve" ->
      """WITH rk AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS r
        |  FROM documents),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |tk AS (SELECT doc_id,
        |    unnest(string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ')) AS term
        |  FROM documents),
        |fr AS (SELECT term, CAST(MIN(r) AS BIGINT) AS minr
        |  FROM tk JOIN rk USING (doc_id) WHERE length(term) > 0 GROUP BY term)
        |SELECT MIN(n) AS n_docs, CAST(COUNT(*) AS BIGINT) AS vocab_total,
        |  CAST(SUM(CASE WHEN minr <= (n + 3) // 4 THEN 1 ELSE 0 END) AS BIGINT) AS v25,
        |  CAST(SUM(CASE WHEN minr <= (n + 1) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS v50,
        |  CAST(SUM(CASE WHEN minr <= (3 * n + 3) // 4 THEN 1 ELSE 0 END) AS BIGINT) AS v75
        |FROM fr CROSS JOIN nn""".stripMargin,
    "term_burstiness" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ')) AS term
        |  FROM documents),
        |td AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS x FROM tk
        |       WHERE length(term) > 0 GROUP BY 1, 2),
        |st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(x) AS BIGINT) AS tf,
        |         SUM(CAST(x AS HUGEINT) * x) AS sxx FROM td GROUP BY term),
        |top AS (SELECT * FROM st ORDER BY tf DESC, term LIMIT 20),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
        |SELECT term, df, tf,
        |  CAST((CAST(n AS HUGEINT) * sxx - CAST(tf AS HUGEINT) * tf) * 1000000
        |       // (CAST(n AS HUGEINT) * tf) AS BIGINT) AS vmr_micros
        |FROM top CROSS JOIN nn""".stripMargin,
    "mcnemar_test" ->
      """WITH nm AS (SELECT lang,
        |    string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks,
        |    lower(text) AS lt FROM documents),
        |sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
        |    CASE WHEN CAST(len(list_filter(toks, tk -> tk IN ('the','of','and','to','a','in'))) AS BIGINT)
        |              * 1000 // greatest(CAST(len(toks) AS BIGINT), 1) >= 40
        |         THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(regexp_extract_all(lt, '\b(the|a|of)\b')) >=
        |              len(regexp_extract_all(lt, '\b(spark|hash|key)\b'))
        |         THEN 1 ELSE 0 END AS b
        |  FROM nm),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a = t AND b <> t THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
        |    CAST(SUM(CASE WHEN a <> t AND b = t THEN 1 ELSE 0 END) AS BIGINT) AS only_b
        |  FROM sc)
        |SELECT n, only_a, only_b,
        |  CASE WHEN only_a + only_b = 0 THEN 0
        |       ELSE CAST(CAST(only_a - only_b AS HUGEINT) * (only_a - only_b) * 1000000
        |            // (only_a + only_b) AS BIGINT) END AS stat_micros,
        |  CASE WHEN (CASE WHEN only_a + only_b = 0 THEN 0
        |       ELSE CAST(CAST(only_a - only_b AS HUGEINT) * (only_a - only_b) * 1000000
        |            // (only_a + only_b) AS BIGINT) END) > 3841459
        |       THEN 1 ELSE 0 END AS significant
        |FROM m""".stripMargin,
    "roc_auc_exact" ->
      """WITH nm AS (SELECT lang,
        |    string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks
        |  FROM documents),
        |sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    CAST(len(list_filter(toks, t -> t IN ('the','of','and','to','a','in'))) AS BIGINT) * 1000
        |      // greatest(CAST(len(toks) AS BIGINT), 1) AS score FROM nm),
        |g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np,
        |        CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn FROM sc GROUP BY score),
        |c AS (SELECT np, nn, CAST(SUM(nn) OVER (ORDER BY score
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumneg FROM g),
        |a AS (SELECT SUM(CAST(np AS HUGEINT) * (2 * (cumneg - nn) + nn)) AS u2,
        |       CAST(SUM(np) AS BIGINT) AS pos_total,
        |       CAST(SUM(nn) AS BIGINT) AS neg_total FROM c)
        |SELECT pos_total, neg_total, CAST(u2 AS BIGINT) AS u2,
        |  CAST(u2 * 1000000 // (2 * CAST(pos_total AS HUGEINT) * neg_total) AS BIGINT) AS auc_micros
        |FROM a""".stripMargin,
    "annotator_kappa" ->
      """WITH nm AS (SELECT
        |    string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks,
        |    lower(text) AS lt FROM documents),
        |sc AS (SELECT
        |    CAST(len(list_filter(toks, t -> t IN ('the','of','and','to','a','in'))) AS BIGINT) AS hits,
        |    CAST(len(toks) AS BIGINT) AS ntok,
        |    CAST(len(regexp_extract_all(lt, '\b(the|a|of)\b')) AS BIGINT) AS c_en,
        |    CAST(len(regexp_extract_all(lt, '\b(spark|hash|key)\b')) AS BIGINT) AS c_zh
        |  FROM nm),
        |ab AS (SELECT CASE WHEN hits * 1000 // greatest(ntok, 1) >= 40 THEN 1 ELSE 0 END AS a,
        |              CASE WHEN c_en >= c_zh THEN 1 ELSE 0 END AS b FROM sc),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a * b) AS BIGINT) AS n11, CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
        |    CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00 FROM ab)
        |SELECT n, n11, n10, n01, n00,
        |  (n11 + n00) * 1000000 // n AS po_micros,
        |  CAST(FLOOR(CAST(CAST(n AS HUGEINT) * (n11 + n00) -
        |      (CAST(n11 + n10 AS HUGEINT) * (n11 + n01) + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE) * 1e6 /
        |    CAST(CAST(n AS HUGEINT) * n -
        |      (CAST(n11 + n10 AS HUGEINT) * (n11 + n01) + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)) AS BIGINT) AS kappa_micros
        |FROM m""".stripMargin,
    "classifier_prf" ->
      """WITH c AS (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of)\b')) AS c_en,
        |    len(regexp_extract_all(lower(text), '\b(stream|batch|merge)\b')) AS c_de,
        |    len(regexp_extract_all(lower(text), '\b(data|table|row)\b')) AS c_es,
        |    len(regexp_extract_all(lower(text), '\b(join|filter|group)\b')) AS c_fr,
        |    len(regexp_extract_all(lower(text), '\b(spark|hash|key)\b')) AS c_zh
        |  FROM documents),
        |p AS (SELECT lang, CASE
        |    WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |    WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |    WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |    WHEN c_fr >= c_zh THEN 'fr'
        |    ELSE 'zh' END AS pred FROM c),
        |conf AS (SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |diag AS (SELECT lang AS cls, n AS tp FROM conf WHERE lang = pred),
        |act AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS actual_n FROM conf GROUP BY 1),
        |prd AS (SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS pred_n FROM conf GROUP BY 1)
        |SELECT act.cls, coalesce(tp, 0) AS tp, coalesce(pred_n, 0) AS pred_n, actual_n,
        |  CASE WHEN coalesce(pred_n, 0) = 0 THEN 0
        |       ELSE coalesce(tp, 0) * 1000000 // pred_n END AS precision_micros,
        |  coalesce(tp, 0) * 1000000 // actual_n AS recall_micros,
        |  2 * coalesce(tp, 0) * 1000000 // (coalesce(pred_n, 0) + actual_n) AS f1_micros
        |FROM act LEFT JOIN diag USING (cls) LEFT JOIN prd USING (cls)""".stripMargin,
    "classifier_lift_deciles" ->
      """WITH nm AS (SELECT doc_id, lang,
        |    string_split(coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), ' ') AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, t -> t IN ('the','of','and','to','a','in'))) AS BIGINT) AS hits,
        |    CAST(len(toks) AS BIGINT) AS ntok FROM nm),
        |s2 AS (SELECT doc_id, lang, hits * 1000 // greatest(ntok, 1) AS score FROM sc),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos_total
        |       FROM s2),
        |rk AS (SELECT lang, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM s2),
        |dc AS (SELECT lang,
        |    CASE WHEN rnk <= (total // 10 + 1) * (total % 10)
        |      THEN (rnk - 1) // (total // 10 + 1) + 1
        |      ELSE total % 10 + (rnk - (total // 10 + 1) * (total % 10) - 1) // (total // 10) + 1
        |    END AS decile, total, pos_total
        |  FROM rk CROSS JOIN tt),
        |ag AS (SELECT CAST(decile AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    MIN(total) AS total, MIN(pos_total) AS pos_total
        |  FROM dc GROUP BY 1)
        |SELECT decile, n, pos, pos * 1000000 // n AS pos_rate_micros,
        |  CAST(floor(CAST(CAST(pos AS HUGEINT) * total AS DOUBLE) * 1000000.0 /
        |       CAST(CAST(n AS HUGEINT) * pos_total AS DOUBLE)) AS BIGINT) AS lift_micros
        |FROM ag""".stripMargin,
    "text_classifier_score" ->
      """WITH n AS (SELECT doc_id, source,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        |tok AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS tok FROM n),
        |w AS (SELECT doc_id, source,
        |    (CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 2001) - 1000 AS w FROM tok),
        |ds AS (SELECT doc_id, source, CAST(SUM(w) AS BIGINT) AS w_sum
        |  FROM w GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN w_sum > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(SUM(w_sum) AS BIGINT) AS w_total,
        |  CAST(MIN(w_sum) AS BIGINT) AS w_min,
        |  CAST(MAX(w_sum) AS BIGINT) AS w_max
        |FROM ds GROUP BY source ORDER BY source""".stripMargin,
    "text_bpe_pairs" ->
      """WITH n AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |tok AS (SELECT unnest(string_split(t, ' ')) AS tok FROM n),
        |tc AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
        |pairs AS (SELECT cnt,
        |    unnest(list_transform(generate_series(1, len(tok) - 1),
        |      i -> substr(tok, i, 2))) AS pair
        |  FROM tc WHERE len(tok) >= 2)
        |SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_occ, COUNT(*) AS n_types
        |FROM pairs GROUP BY pair ORDER BY n_occ DESC, pair LIMIT 20""".stripMargin,
    "text_boilerplate_ngrams" ->
      """WITH n AS (SELECT doc_id, source,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        |tk AS (SELECT doc_id, source, string_split(t, ' ') AS toks FROM n
        |  WHERE len(string_split(t, ' ')) >= 3),
        |sh AS (SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
        |  FROM tk),
        |hot AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY g)
        |  WHERE df >= 3),
        |per AS (SELECT doc_id, source, COUNT(*) AS n_g,
        |    CAST(SUM(CASE WHEN g IN (SELECT g FROM hot) THEN 1 ELSE 0 END) AS BIGINT) AS n_bp
        |  FROM sh GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_g) AS BIGINT) AS total_g,
        |  CAST(SUM(n_bp) AS BIGINT) AS bp_g,
        |  CAST(SUM(CASE WHEN n_bp * 4 >= n_g THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    "text_lm_score" ->
      """WITH n AS (SELECT doc_id, source,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        |tk AS (SELECT doc_id, source, string_split(t, ' ') AS toks FROM n
        |  WHERE len(string_split(t, ' ')) >= 2),
        |b AS (SELECT doc_id, source, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM tk),
        |cnt AS (SELECT bigram, COUNT(*) AS c_pair FROM b GROUP BY bigram),
        |pre AS (SELECT split_part(bigram, ' ', 1) AS prefix,
        |    CAST(SUM(c_pair) AS BIGINT) AS c_prefix FROM cnt GROUP BY 1),
        |model AS (SELECT bigram, (c_pair * 1000000) // c_prefix AS p_u
        |  FROM cnt JOIN pre ON split_part(cnt.bigram, ' ', 1) = pre.prefix),
        |ds AS (SELECT doc_id, source, COUNT(*) AS n_bi, CAST(SUM(p_u) AS BIGINT) AS p_sum
        |  FROM b JOIN model USING (bigram) GROUP BY 1, 2),
        |sc AS (SELECT source, p_sum // n_bi AS score_u FROM ds)
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(score_u) AS BIGINT) AS score_sum,
        |  CAST(MIN(score_u) AS BIGINT) AS score_min,
        |  CAST(MAX(score_u) AS BIGINT) AS score_max
        |FROM sc GROUP BY source ORDER BY source""".stripMargin,
    "text_vocab_oov" ->
      """WITH n AS (SELECT doc_id, lang, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS term FROM n),
        |tk AS (SELECT * FROM tok WHERE length(term) > 0),
        |vocab AS (SELECT term FROM (
        |    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY term) v
        |  WHERE df >= 3)
        |SELECT lang, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  COUNT(DISTINCT tk.term) AS n_types
        |FROM tk LEFT JOIN vocab ON tk.term = vocab.term
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_tfidf_top" ->
      """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 50 = 0),
        |tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM n),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE length(term) > 0 GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |j AS (SELECT doc_id, term, tf, df, (tf * 1000000) // df AS score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rn
        |  FROM tf JOIN dfq USING (term))
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df, CAST(score AS BIGINT) AS score
        |FROM j WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "text_bigram_top" ->
      """WITH n AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        |tk AS (SELECT string_split(t, ' ') AS toks FROM n WHERE len(string_split(t, ' ')) >= 2),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM tk)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "text_winnowing" ->
      """WITH t AS (SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
        |g AS (SELECT source, CASE WHEN t IS NULL OR length(t) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, length(t) - 7),
        |    i -> CAST('0x' || substr(md5(substr(t, i, 8)), 1, 15) AS BIGINT)) END AS grams FROM t),
        |w AS (SELECT source, CASE WHEN len(grams) < 4 THEN CAST([] AS BIGINT[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(grams) - 3),
        |    j -> list_min(list_slice(grams, j, j + 3)))) END AS fps FROM g),
        |e AS (SELECT source, unnest(fps) AS fp FROM w),
        |a AS (SELECT source, COUNT(DISTINCT fp) AS n_fp, COUNT(fp) AS n_total FROM e GROUP BY source)
        |SELECT s.source, CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
        |  CAST(coalesce(a.n_total, 0) AS BIGINT) AS n_total
        |FROM (SELECT DISTINCT source FROM documents) s LEFT JOIN a USING (source)
        |ORDER BY source""".stripMargin,
    "text_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_rtokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_quality_hist" ->
      """WITH m AS (SELECT
        |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS chars,
        |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS toks,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to)\b')) AS DOUBLE) AS stop,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS punct
        |  FROM documents),
        |q AS (SELECT least(chars / 500.0, 1.0) * 0.4 + (1.0 - punct / chars) * 0.4
        |        + least(stop / toks * 5.0, 1.0) * 0.2 AS score FROM m)
        |SELECT CAST(floor(score * 10) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM q GROUP BY bucket ORDER BY bucket""".stripMargin,
    "text_langid_confusion" ->
      """WITH c AS (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of)\b')) AS c_en,
        |    len(regexp_extract_all(lower(text), '\b(stream|batch|merge)\b')) AS c_de,
        |    len(regexp_extract_all(lower(text), '\b(data|table|row)\b')) AS c_es,
        |    len(regexp_extract_all(lower(text), '\b(join|filter|group)\b')) AS c_fr,
        |    len(regexp_extract_all(lower(text), '\b(spark|hash|key)\b')) AS c_zh
        |  FROM documents),
        |p AS (SELECT lang, CASE
        |    WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |    WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |    WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |    WHEN c_fr >= c_zh THEN 'fr'
        |    ELSE 'zh' END AS pred FROM c)
        |SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,
    "text_fingerprints" ->
      """WITH f AS (SELECT source,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_fp, MIN(fp) AS min_fp
        |FROM f GROUP BY source ORDER BY source""".stripMargin
  )
}
