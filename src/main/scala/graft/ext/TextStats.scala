package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2B X4):
  * token counting (whitespace + BPE-ish regex), quality scoring,
  * n-gram-marker language ID, and normalized-md5 fingerprinting.
  *
  * Everything here is a pure Column expression built from codegen'd
  * built-ins — no UDFs — so whole-stage codegen keeps the scan→score
  * pipeline in one stage at any scale, and every op is SQL-expressible
  * for the DuckDB oracle (winnowing included, via the portable md5-derived
  * gram hashes — though its HOF lambdas run interpreted, not codegen'd).
  */
object TextStats {

  /** lower + collapse whitespace + trim; the canonical form for
    * fingerprints and shingles.
    */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, single symbols. */
  def regexTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  def stopwordCount(c: Column): Column =
    regexp_count(lower(c), lit("\\b(the|a|of|and|to)\\b"))

  def punctCount(c: Column): Column = regexp_count(c, lit("[^A-Za-z0-9\\s]"))

  /** Heuristic document quality in [0,1]: length saturation + low punct
    * density + stopword presence. Plain IEEE double arithmetic, ordered
    * identically in the oracle SQL so results are bit-identical.
    */
  def qualityScore(c: Column): Column = {
    // greatest(_,1) guards the zero-length/zero-token divisions: empty
    // docs score deterministically instead of null (non-ANSI) / error
    // (ANSI) / NaN (DuckDB) — the oracle SQL carries the same guard
    val chars = greatest(length(c).cast(DoubleType), lit(1.0))
    val toks = greatest(tokenCount(c).cast(DoubleType), lit(1.0))
    val stop = stopwordCount(c).cast(DoubleType)
    val punct = punctCount(c).cast(DoubleType)
    least(chars / lit(500.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - punct / chars) * lit(0.4) +
      least(stop / toks * lit(5.0), lit(1.0)) * lit(0.2)
  }

  /** Marker-word sets per language (n-gram-frequency heuristic shape; the
    * marker lists are tuned to the synthetic corpus vocabulary so counts
    * actually vary).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of)\\b",
    "de" -> "\\b(stream|batch|merge)\\b",
    "es" -> "\\b(data|table|row)\\b",
    "fr" -> "\\b(join|filter|group)\\b",
    "zh" -> "\\b(spark|hash|key)\\b")

  /** argmax over marker counts with a fixed priority order on ties
    * (en > de > es > fr > zh) — mirrored as a CASE chain in SQL.
    */
  def langPred(c: Column): Column = {
    val m = langMarkers.map { case (l, re) => l -> regexp_count(lower(c), lit(re)) }.toMap
    when(m("en") >= m("de") && m("en") >= m("es") && m("en") >= m("fr") && m("en") >= m("zh"), "en")
      .when(m("de") >= m("es") && m("de") >= m("fr") && m("de") >= m("zh"), "de")
      .when(m("es") >= m("fr") && m("es") >= m("zh"), "es")
      .when(m("fr") >= m("zh"), "fr")
      .otherwise("zh")
  }

  /** Content fingerprint: md5 of the normalized text (md5 hex is identical
    * across engines, unlike xxhash64).
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** (id, term) rows from normalized text — the explode that TF/DF/IDF
    * builds on. One narrow pass; the term column is the shuffle key for
    * everything downstream.
    */
  def terms(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(split(normText(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)

  /** Per-document term frequencies joined with corpus document
    * frequencies, plus an integer-exact discriminativeness score
    * `tf * 1e6 / df` (floor). Rank by (tf desc, df asc, term) for
    * deterministic cross-engine top-k — no transcendental idf enters the
    * comparison, so results hash-check exactly; callers wanting classic
    * `tf * ln(N/df)` can compute it from the returned tf/df.
    * Two shuffles total: one on (id, term), one on term; the df side
    * aggregates to |vocabulary| rows, broadcastable at any corpus size.
    */
  def tfDf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = terms(df, idCol, textCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(docFreq, Seq("term"))
      .withColumn("score", (col("tf") * lit(1000000L) / col("df")).cast(LongType))
  }

  /** Winnowing fingerprints (MOSS-style rolling selection), as TWO
    * composable steps the caller materializes as separate columns:
    *
    * {{{
    * df.withColumn("t", TextStats.normText($"text"))
    *   .withColumn("grams", TextStats.kgramHashes($"t", 8))
    *   .select(TextStats.winnow($"grams", 4).as("fps"))
    * }}}
    *
    * The split matters: Spark HOF lambdas are interpreted and loop-
    * invariant subtrees are NOT hoisted, so nesting the gram-hash
    * expression inside the window lambda would recompute the whole gram
    * array (and the normalization regex) once per window — O(n^3) per
    * row. Referencing a materialized column from the lambda is O(1).
    */

  /** Hashes of every character k-gram; `c` must be pre-normalized (a
    * materialized column, not an expression). Null/short input => empty.
    * portable=true derives the hash from md5 ([[Dedup.portableHash64]])
    * so DuckDB reproduces the gram values (and the winnowed minima)
    * bit-for-bit; the xxhash64 default is the faster in-engine path.
    */
  def kgramHashes(c: Column, k: Int, portable: Boolean = false): Column = {
    val hash: Column => Column =
      if (portable) Dedup.portableHash64 else xxhash64(_)
    when(c.isNull || length(c) < k, array().cast("array<bigint>"))
      .otherwise(
        transform(sequence(lit(1), length(c) - (k - 1)), i => hash(c.substr(i, lit(k)))))
  }

  /** One-pass native winnowing (kgram + window-min + distinct fused into
    * a single imperative row expression) — exact value parity with
    * `winnow(kgramHashes(c, k, portable=true), w)`, at scan speed (the
    * HOF pair walks an interpreted tree per gram; see
    * [[org.apache.spark.sql.graftnative.WinnowFingerprints]]).
    */
  def winnowingFingerprintsNative(c: Column, k: Int, w: Int): Column =
    when(c.isNull, array().cast("array<bigint>"))
      .otherwise(
        org.apache.spark.sql.graftnative.TextExpressions.winnowFingerprints(c, k, w))

  /** Distinct window-of-w minima over a materialized gram-hash column.
    * sequence(1, n) counts DOWN for n < 1, so short inputs short-circuit.
    */
  def winnow(grams: Column, w: Int): Column =
    when(grams.isNull || size(grams) < w, array().cast("array<bigint>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(1), size(grams) - (w - 1)),
            j => array_min(slice(grams, j, lit(w))))))
}
