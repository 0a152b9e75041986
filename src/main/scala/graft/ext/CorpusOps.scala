package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: rule-based quality filtering, deterministic
  * stratified sampling, and concat-and-chunk sequence packing.
  *
  * All three are pure Column expressions / window functions over built-ins
  * — no UDFs, no driver state — so they stay inside whole-stage codegen,
  * push work to the scan stage, and are SQL-expressible for the DuckDB
  * oracle. Threshold comparisons use INTEGER cross-multiplication
  * (`punct*10 > chars` instead of `punct/chars > 0.1`): no floating point
  * ever enters a keep/drop decision, so results are bit-stable across
  * engines, partitionings and scale factors.
  */
object CorpusOps {

  /** Gopher-shaped composite quality rules over a pre-normalized text
    * column (see [[TextStats.normText]]: lower, single spaces, trimmed).
    * Returns the FIRST failing rule name, or "keep". Rule order is part of
    * the contract (mirrored in the oracle SQL):
    *
    *  1. too_short     — fewer than minTokens words
    *  2. too_long      — more than maxTokens words
    *  3. short_words   — mean word length < 3 chars (gibberish/symbol soup)
    *  4. long_words    — mean word length > 10 chars (code, URLs, hashes)
    *  5. symbol_heavy  — punctuation > 10% of characters
    *  6. no_stopwords  — zero common-word hits (non-language content)
    *
    * On normalized text, non-space chars = length - (tokens-1), so mean
    * word length bounds become integer comparisons.
    *
    * NULL text coalesces to the empty string FIRST, so null docs get a
    * deterministic "too_short" — without this, non-ANSI Spark's
    * `size(split(null)) = -1` silently hits the same branch while a SQL
    * CASE's NULL comparisons fall through to 'keep' (a cross-engine
    * divergence); oracles must apply the same coalesce.
    */
  def qualityReason(t0: Column, minTokens: Int = 5, maxTokens: Int = 5000): Column = {
    val t = coalesce(t0, lit(""))
    val nTok = size(split(t, " ")).cast(LongType)
    val chars = length(t).cast(LongType)
    val nonSpace = chars - (nTok - 1)
    val punct = TextStats.punctCount(t).cast(LongType)
    val stop = TextStats.stopwordCount(t).cast(LongType)
    when(nTok < minTokens, "too_short")
      .when(nTok > maxTokens, "too_long")
      .when(nonSpace < nTok * 3, "short_words")
      .when(nonSpace > nTok * 10, "long_words")
      .when(punct * 10 > chars, "symbol_heavy")
      .when(stop === 0, "no_stopwords")
      .otherwise("keep")
  }

  /** Deterministic stratified sampling: keep a row iff
    * `portableHash64(stratum || ':' || key) % 1e6 < rate(stratum) * 1e6`.
    *
    * Scale properties: a pure filter at the scan stage — no shuffle, no
    * RNG state, no driver coordination; any executor count or retry
    * produces the identical sample (unlike `df.sample`, whose
    * partition-seeded RNG changes with the split layout). Rates are exact
    * millionths, so the acceptance predicate is integer-only. Unlisted
    * strata fall back to defaultRate.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    def ppm(r: Double): Long = math.round(r * 1e6)
    val threshold = rates.foldLeft(lit(ppm(defaultRate))) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(ppm(r))).otherwise(acc)
    }
    val h = Dedup.portableHash64(
      concat(col(strataCol).cast(StringType), lit(":"), col(keyCol).cast(StringType)))
    df.filter(pmod(h, lit(1000000L)) < threshold)
  }

  /** Benchmark-contamination counts: for each scored document, how many
    * of its distinct word shingles appear in the reference shingle set.
    * Returns per-scored-doc (idCol, n_shingles, n_contaminated).
    *
    * Shape: both sides are per-doc DISTINCT pair streams
    * ([[Dedup.wordShingles]]) — when both derive from one corpus-wide
    * shingle table, its distinct exchange is computed once and reused
    * (tokenize runs once). Pass `broadcastRef = true` when the
    * reference is an eval benchmark (the decontamination direction —
    * eval sets are bounded by construction): the reference vocabulary
    * rides as a broadcast, so the corpus side joins at the exchange
    * read and only the narrow (id, hit) rows shuffle into the per-doc
    * aggregation. With a corpus-sized reference (the audit direction,
    * scoring a small eval split against the full train vocabulary),
    * leave it false.
    *
    * Round 5 measured two "clever" alternatives and both lose at sf1:
    * a one-pass raw-stream form with `count_distinct` dedup in the
    * aggregation (Expand doubles the shuffled rows: decontaminate_drop
    * 12 s → 21 s), and per-row array dedup (`array_distinct` is
    * O(len²) on strings: ~80 s). The boring shape — one shared distinct
    * exchange, one left join, one narrow count/sum aggregate — wins.
    */
  def contamination(
      scored: DataFrame,
      refShingles: DataFrame,
      idCol: String,
      broadcastRef: Boolean): DataFrame = {
    val refSet0 = refShingles.select("shingle").distinct()
    val refSet = if (broadcastRef) broadcast(refSet0) else refSet0
    scored
      .select(col(idCol), col("shingle"))
      .join(refSet.withColumn("__hit", lit(1L)), Seq("shingle"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).cast(LongType).as("n_contaminated"))
  }

  /** PII-shaped redaction: emails and long digit runs replaced with
    * fixed tags, plus per-doc match counts. The regexes stay inside the
    * cross-engine-portable dialect (no lookarounds), and redaction is a
    * pure projection — scan-speed at any corpus size.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberRe = "[0-9]{7,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongNumberRe,
      "<NUM>")

  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailRe)), regexp_count(text, lit(LongNumberRe)))

  /** Repetition score: distinct-to-total word-trigram ratio per doc as
    * exact integers (boilerplate/template text scores low). No floats —
    * callers compare `distinct * K` vs `total * threshold_num`.
    *
    * `toks` MUST be a materialized token-array COLUMN, not a `split(...)`
    * expression: HOF lambdas run interpreted and do not hoist
    * loop-invariant subtrees, so an expression argument is re-evaluated
    * on every element access (measured: 36s with the expression vs ~1s
    * materialized over the 5k-doc corpus — the winnowing lesson again).
    */
  def trigramGrams(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - 2),
          i =>
            concat(
              element_at(toks, i), lit(" "),
              element_at(toks, i + 1), lit(" "),
              element_at(toks, i + 2))))

  def trigramRepetition(toks: Column): (Column, Column) = {
    val grams = trigramGrams(toks)
    (size(array_distinct(grams)).cast(LongType), size(grams).cast(LongType))
  }

  /** Concat-and-chunk sequence packing: documents are laid end-to-end in
    * (shard, id) order and cut into fixed token-budget training sequences;
    * each doc is assigned the sequence its FIRST token lands in —
    * `floor(prefix_tokens / budget)` where prefix_tokens is the running
    * token count BEFORE the doc. This is exactly the packing LLM
    * pretraining uses (concat + chunk), and unlike greedy first-fit it is
    * a single window expression: one shuffle on the shard key, no
    * recursion, no driver loop. The running sum stays within one shard's
    * partition, so shards parallelize independently at any corpus size —
    * shard by file/day/source so no single ordering window spans the
    * whole 100 TB corpus.
    *
    * Returns the input plus `seq_id` (per-shard chunk ordinal) and
    * `straddles` (doc crosses a chunk boundary — its tail spills into the
    * next sequence).
    */
  def packSequences(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      tokCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col(shardCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokCol)).over(w)
    chunkByCum(df, tokCol, cum, budget)
  }

  /** [[packSequences]] with the shard-size contract ENFORCED instead of
    * documented: the per-shard running token sum comes from
    * [[Prefix.runningSum]] (range-partition + local window + prefix-offset
    * join), so no window partition ever spans more than one range split —
    * a single giant shard (or a corpus packed as one global shard) cannot
    * serialize into one task. Output is bit-identical to [[packSequences]]
    * (same fold order), so callers and oracles are unchanged.
    */
  def packSequencesScalable(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      tokCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    val cum = Prefix.runningSum(
      df, col(shardCol), Seq(col(idCol)), col(tokCol), "__cum", numPartitions)
    chunkByCum(cum, tokCol, col("__cum"), budget).drop("__cum")
  }

  /** Chunk assignment from an inclusive running token sum: the doc's
    * sequence is where its FIRST token lands; it straddles when its last
    * token lands in a later chunk. Pure integer `div` end-to-end (the
    * operands are non-negative longs, so truncating div == floor
    * division == DuckDB `//`): no floating point anywhere in the chunk
    * math, at any token count a 100-TB corpus can reach.
    */
  private def chunkByCum(df: DataFrame, tokCol: String, cum: Column, budget: Long): DataFrame =
    df.withColumn("__pk_cum", cum)
      .withColumn("__pk_before", col("__pk_cum") - col(tokCol))
      .withColumn("seq_id", expr(s"__pk_before div ${budget}L"))
      .withColumn("straddles", expr(s"(__pk_cum - 1L) div ${budget}L") > col("seq_id"))
      .drop("__pk_cum", "__pk_before")
}
