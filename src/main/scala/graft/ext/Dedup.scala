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

  /** X1 — exact dedup keeping the smallest tieBreak value per key group.
    * `row_number` over (key, tieBreak) — one shuffle on the key; at scale
    * this is the standard "keep first version of each content hash" pass.
    */
  def exactDedup(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    * Docs shorter than n words produce no shingles.
    */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(TextStats.normText(col(textCol)), " ")
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("shingle"))
      .distinct()
  }

  /** X2 — n-gram Jaccard near-dup pairs. Candidates = documents sharing at
    * least one shingle (equi-join on the shingle key, the scalable path);
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) from exact distinct counts.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    val counts = shingles.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val a = shingles.select(col(idCol).as("id_a"), col("shingle"))
    val b = shingles.select(col(idCol).as("id_b"), col("shingle"))
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

  /** X2 — MinHash signatures: numHashes min-hash values per doc from one
    * pass over exploded shingles (a single aggregation job). Each "hash
    * permutation" is xxhash64 seeded by the permutation index hashed
    * together with the shingle — no wrapping long arithmetic, so it is
    * safe under ANSI mode (Spark 4's default) where `h * a + b` would
    * throw ARITHMETIC_OVERFLOW.
    */
  def minhashSignature(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    // hash the shingle string ONCE, then derive each permutation by
    // rehashing the (index, hash) pair — numHashes cheap fixed-width
    // hashes instead of numHashes string traversals
    val base = shingles.withColumn("__h", xxhash64(col("shingle")))
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("__h"))).as(s"mh$i")
    }
    base.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: hash each band of bandSize signature values; docs
    * sharing any (band index, band hash) are candidates. Equi-join on the
    * band key — shuffle scales with docs x bands, not docs^2.
    */
  def lshCandidates(sig: DataFrame, idCol: String, numHashes: Int, bandSize: Int): DataFrame = {
    val nBands = numHashes / bandSize
    val bands = (0 until nBands).map { bi =>
      val cols = (bi * bandSize until (bi + 1) * bandSize).map(i => col(s"mh$i"))
      struct(lit(bi).as("band"), xxhash64(concat_ws(",", cols: _*)).as("bh"))
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
  def simhashPairs(sim: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val banded = sim.select(
      col(idCol),
      col("simhash"),
      explode(
        array((0 until 4).map(k =>
          struct(lit(k).as("band"), shiftrightunsigned(col("simhash"), k * 16).bitwiseAND(0xFFFFL).as("bh"))): _*)).as("b"))
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
}
