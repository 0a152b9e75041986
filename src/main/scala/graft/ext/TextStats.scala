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
  * for the DuckDB oracle.
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

  /** Winnowing fingerprints (MOSS-style rolling selection): hash every
    * character k-gram of the normalized text, slide a window of w hashes,
    * keep each window's minimum — a position-robust fingerprint SET whose
    * overlap survives local edits. Pure HOFs over the row (no explode, no
    * shuffle); dedup via array_distinct.
    */
  def winnowingFingerprints(c: Column, k: Int, w: Int): Column = {
    val t = normText(c)
    val gramHashes = transform(
      sequence(lit(1), length(t) - (k - 1)),
      i => xxhash64(t.substr(i, lit(k))))
    val mins = transform(
      sequence(lit(1), size(gramHashes) - (w - 1)),
      j => array_min(slice(gramHashes, j, lit(w))))
    // sequence(1, n) counts DOWN for n < 1, so short docs must short-circuit
    // to an empty set before either sequence is built
    when(length(t) < k + w - 1, array().cast("array<bigint>"))
      .otherwise(array_distinct(mins))
  }
}
