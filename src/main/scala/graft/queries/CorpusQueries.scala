package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ext.{CorpusOps, TextStats}

/** Corpus-curation queries (quality filtering, stratified sampling,
  * sequence packing — see [[graft.ext.CorpusOps]]). Keep/drop decisions
  * and chunk assignment are integer-only, so every query is hash-checked
  * against DuckDB with no floating-point caveats.
  */
object CorpusQueries {
  type Q = (SparkSession, String) => DataFrame

  // NULL text -> '' so token counts are 0-ish on BOTH engines (Spark's
  // non-ANSI size(null) is -1; DuckDB's len(NULL) is NULL — neither is
  // what an aggregate should absorb)
  private def withTok(df: DataFrame): DataFrame =
    df.withColumn("t", coalesce(TextStats.normText(col("text")), lit("")))
      .withColumn("n_tok", size(split(col("t"), " ")).cast(LongType))

  /** Rule-based quality filter: docs bucketed by the first failing Gopher
    * rule (or "keep"), with doc/token tallies per bucket — the
    * go/no-go census a curation run reports before dropping data.
    */
  private val qualityFilter: Q = (s, d) =>
    withTok(documents(s, d))
      .withColumn("reason", CorpusOps.qualityReason(col("t")))
      .groupBy("reason")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        sum("doc_id").cast(LongType).as("id_sum"))
      .orderBy("reason")

  /** Deterministic per-language downsampling (the "rebalance sources"
    * step): en 25%, de 50%, es 75%, fr 100%, default 10%. The sample is a
    * pure hash filter — identical membership on any cluster layout.
    */
  private val sampleStratified: Q = (s, d) =>
    CorpusOps
      .stratifiedSample(
        documents(s, d),
        "doc_id",
        "lang",
        Map("en" -> 0.25, "de" -> 0.5, "es" -> 0.75, "fr" -> 1.0),
        defaultRate = 0.1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").cast(LongType).as("id_sum"))
      .orderBy("lang")

  /** Concat-and-chunk packing into fixed-budget training sequences,
    * sharded by source; per-sequence doc/token counts and boundary
    * straddles. Budget is 256 here (the op default is 2048) so the sf0.01
    * fixture — ~1.3–1.6k tokens per source — actually crosses chunk
    * boundaries: every source yields multiple seq_ids and straddles, and
    * the oracle exercises the boundary math, not just token sums. Runs
    * the contract-enforcing scalable variant (distributed prefix sum);
    * output is bit-identical to the single-window form the oracle uses.
    */
  private val packSequences: Q = (s, d) =>
    CorpusOps
      .packSequencesScalable(withTok(documents(s, d)), "source", "doc_id", "n_tok", 256L)
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        sum(when(col("straddles"), 1L).otherwise(0L)).cast(LongType).as("n_straddle"))
      // Canonical per-row digest over every other cell: if the driver
      // reports hash-red while every digest VALUE matches, the divergence
      // is in the harness's hashing of these frames, not in the data.
      .withColumn(
        "row_digest",
        digest9(concat(col("source"), lit(":"), col("seq_id").cast(StringType),
          lit(":"), col("n_docs").cast(StringType), lit(":"),
          col("tok_sum").cast(StringType), lit(":"),
          col("n_straddle").cast(StringType))).cast(LongType))
      .orderBy("source", "seq_id")

  /** Length-bucketed batching audit: bucket docs by token count (64-token
    * buckets — the bucketed-batching pass that minimizes padding waste in
    * fixed-shape training batches) and report per-bucket doc/token
    * tallies plus the padding overhead batching this bucket to its max
    * length would cost. Pure integer math at scan speed; one aggregate.
    */
  private val lengthBuckets: Q = (s, d) =>
    withTok(documents(s, d))
      .withColumn("bucket", expr("n_tok div 64L"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        max("n_tok").cast(LongType).as("max_tok"))
      .withColumn(
        "padded_tokens",
        (col("n_docs") * col("max_tok") - col("tok_sum")).cast(LongType))
      .orderBy("bucket")

  /** The full curation funnel in one plan: quality-filter -> exact dedup
    * (by normalized text) -> stratified downsample -> pack into 2048-token
    * sequences, reporting the per-stage survivor counts plus final packed
    * stats — the end-to-end "raw corpus in, training sequences out"
    * composition every piece above feeds. One aggregation over a linear
    * pipeline of narrow ops + two keyed shuffles (dedup window, pack
    * rank). The pack running sum is [[graft.ext.Prefix.runningSum]]
    * sharded by source, NOT a `PARTITION BY source` window: source has
    * single-digit cardinality, so the window form sorts the whole corpus
    * on |sources| tasks at any cluster size (the class PlanHealthSpec
    * bans); the range-partitioned prefix keys on (source, doc_id) and
    * scales with the partition count.
    */
  private val curationFunnel: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // Single-pass funnel: every stage is a FLAG, not a filter, so all
    // survivor counts come from one aggregate over one plan — no driver
    // count() per stage (which re-ran the pipeline prefix 4x). Dedup rank
    // counts only quality rows inside each content group (keyed by
    // sha2(t), not raw text, to keep the shuffle key narrow); the pack
    // window adds 0 tokens for non-sampled rows, so sampled rows see
    // exactly the sampled-only running sum. Two window shuffles + one
    // aggregate, one action.
    val raw = withTok(documents(s, d))
      .withColumn("q", CorpusOps.qualityReason(col("t")) === "keep")
      .withColumn("tkey", sha2(col("t"), 256))
      .drop("t")
    val wDedup = Window
      .partitionBy("tkey")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = when(col("lang") === "en", 500000L).otherwise(800000L)
    val h = pmod(
      graft.ext.Dedup.portableHash64(
        concat(col("lang"), lit(":"), col("doc_id").cast(StringType))),
      lit(1000000L))
    val flagged = raw
      .withColumn("keep_d",
        col("q") && sum(when(col("q"), 1L).otherwise(0L)).over(wDedup) === 1L)
      .withColumn("sampled", col("keep_d") && h < thr)
    val packed = graft.ext.Prefix
      .runningSum(
        flagged,
        col("source"),
        Seq(col("doc_id")),
        when(col("sampled"), col("n_tok")).otherwise(0L),
        "cum")
      .withColumn("seq_id", floor((col("cum") - col("n_tok")) / 2048L))
      .withColumn(
        "straddle",
        col("sampled") &&
          floor((col("cum") - 1) / 2048d) > floor((col("cum") - col("n_tok")) / 2048d))
    packed.agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("q"), 1L).otherwise(0L)).cast(LongType).as("n_quality"),
      sum(when(col("keep_d"), 1L).otherwise(0L)).cast(LongType).as("n_deduped"),
      sum(when(col("sampled"), 1L).otherwise(0L)).cast(LongType).as("n_sampled"),
      sum(when(col("sampled"), col("n_tok")).otherwise(0L)).cast(LongType).as("tok_total"),
      countDistinct(when(col("sampled"), concat_ws("#", col("source"), col("seq_id"))))
        .as("n_sequences"),
      sum(when(col("straddle"), 1L).otherwise(0L)).cast(LongType).as("n_straddle"))
  }

  /** Benchmark-contamination audit: every 97th doc plays the eval set;
    * count how many of each eval doc's 5-gram shingles exist anywhere in
    * the train split. Both sides read the ONE reused shingle-table
    * exchange (tokenize runs once); the train vocabulary reduces to
    * distinct shingles before the join, so join input is the
    * vocabulary, never the corpus.
    */
  private val contaminationAudit: Q = (s, d) => {
    val sh = graft.ext.Dedup.wordShingles(
      spread(documents(s, d), "doc_id") // r10 guide §1.2: shingle explode on a 1-split scan
        .select(col("doc_id"), TextStats.normText(col("text")).as("t")),
      "doc_id", "t", 5)
    CorpusOps
      .contamination(
        sh.filter(col("doc_id") % 97 === 0),
        sh.filter(col("doc_id") % 97 =!= 0),
        "doc_id",
        broadcastRef = false)
      .orderBy("doc_id")
  }

  /** PII redaction round-trip: deterministic synthetic PII (an email and
    * a long account number derived from doc_id, injected identically in
    * the oracle) is appended to each doc, then redacted; the query proves
    * the scrub by hashing the redacted text and counting matches.
    */
  private val piiRedaction: Q = (s, d) => {
    val dirty = spread(documents(s, d), "doc_id") // r10: regex redaction on a 1-split scan
      .withColumn(
        "dirty",
        concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com acct "),
          (col("doc_id") + 1) * 1234567L))
    val (emails, nums) = CorpusOps.piiCounts(col("dirty"))
    dirty
      .select(
        col("source"),
        emails.cast(LongType).as("n_email"),
        nums.cast(LongType).as("n_num"),
        md5(CorpusOps.redactPii(col("dirty"))).as("clean_fp"),
        CorpusOps.piiCounts(CorpusOps.redactPii(col("dirty")))._1.cast(LongType).as("left_email"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_email").cast(LongType).as("emails_found"),
        sum("n_num").cast(LongType).as("nums_found"),
        sum("left_email").cast(LongType).as("emails_left"),
        countDistinct(col("clean_fp")).as("n_clean_fp"),
        min("clean_fp").as("min_clean_fp"))
      .orderBy("source")
  }

  /** Repetition census: distinct-to-total trigram ratio per doc in exact
    * integer deciles — template/boilerplate text lands in low buckets.
    */
  private val repetitionScore: Q = (s, d) =>
    documents(s, d)
      // materialize tokens AND grams as columns, and filter on the cheap
      // token count BEFORE gram construction: a filter on the gram count
      // would be pushed below the projection with the whole interpreted
      // HOF re-inlined over raw split(text) (measured 12s vs ~1s)
      .withColumn("toks", split(TextStats.normText(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams", CorpusOps.trigramGrams(col("toks")))
      .select(
        ((size(array_distinct(col("grams"))).cast(LongType) * 10) /
          size(col("grams")).cast(LongType)).cast(LongType).as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("decile")

  /** End-to-end DEcontamination (the drop step the audit feeds): train
    * docs sharing at least half their 5-gram shingles with the eval set
    * are removed. Roles swapped vs the audit: the eval vocabulary is
    * bounded, so it rides as a BROADCAST — the train corpus joins it at
    * the shingle-exchange read, and only narrow (id, hit) rows shuffle
    * into the per-doc aggregation. Docs too short to shingle are kept.
    * Integer cross-multiplied threshold — no ratio floats.
    */
  private val decontaminateDrop: Q = (s, d) => {
    val sh = graft.ext.Dedup.wordShingles(
      spread(documents(s, d), "doc_id") // r10: shingle explode on a 1-split scan
        .select(col("doc_id"), TextStats.normText(col("text")).as("t")),
      "doc_id", "t", 5)
    val hits = CorpusOps.contamination(
      sh.filter(col("doc_id") % 97 =!= 0),
      sh.filter(col("doc_id") % 97 === 0),
      "doc_id",
      broadcastRef = true)
    documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .join(hits, Seq("doc_id"), "left")
      .withColumn(
        "dropped",
        coalesce(col("n_contaminated") * 2 >= col("n_shingles"), lit(false)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_train"),
        sum(when(col("dropped"), 1L).otherwise(0L)).cast(LongType).as("n_dropped"),
        sum(when(!col("dropped"), col("doc_id")).otherwise(0L)).cast(LongType).as("kept_id_sum"))
      .orderBy("source")
  }

  /** Temperature-balanced source mixing (the multilingual-rebalance move:
    * keep-rate_s = sqrt(min_tokens / tokens_s), so token-rich sources are
    * downsampled toward the alpha=0.5 temperature mix and the smallest
    * source keeps everything). sqrt and double division are
    * correctly-rounded IEEE ops, bit-identical across engines, and the
    * acceptance test is an integer millionths threshold on the portable
    * hash — one stats aggregate + one scan-stage filter, no shuffle of
    * the corpus itself.
    */
  private val sampleTemperature: Q = (s, d) => {
    val tok = withTok(documents(s, d))
    val per = tok.groupBy("source").agg(sum("n_tok").cast(LongType).as("tok_s"))
    val mn = per.agg(min("tok_s").as("tok_min"))
    val rates = per
      .crossJoin(broadcast(mn))
      .withColumn(
        "thr",
        floor(sqrt(col("tok_min").cast(DoubleType) / col("tok_s").cast(DoubleType)) * 1e6)
          .cast(LongType))
    val h = pmod(
      graft.ext.Dedup.portableHash64(
        concat(col("source"), lit("@"), col("doc_id").cast(StringType))),
      lit(1000000L))
    tok
      .join(broadcast(rates.select("source", "thr")), Seq("source"))
      .withColumn("kept", h < col("thr"))
      .groupBy("source", "thr")
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).cast(LongType).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).cast(LongType).as("tok_kept"))
      .orderBy("source")
  }

  /** Deterministic train/val/test assignment (98/1/1 by portable hash):
    * the split is a pure per-row projection — disjoint and exhaustive by
    * construction, stable under any partitioning, no RNG state. The same
    * doc always lands in the same split on every cluster and every rerun,
    * which is the property that matters when the corpus is rebuilt
    * incrementally.
    */
  private val splitAssign: Q = (s, d) => {
    val h = pmod(
      graft.ext.Dedup.portableHash64(
        concat(lit("split:"), col("doc_id").cast(StringType))),
      lit(1000000L))
    withTok(documents(s, d))
      .withColumn(
        "split",
        when(h < 980000L, "train").when(h < 990000L, "val").otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        sum("doc_id").cast(LongType).as("id_sum"))
      .orderBy("split")
  }

  /** Deterministic global interleave of packed training sequences: order
    * every (source, seq_id) sequence by a portable hash and assign its
    * shuffled position with the distributed exact rank
    * ([[graft.ext.Prefix.globalRank]]) — the "shuffle the corpus before
    * epoch 0" step, without a single-reducer sort and without RNG. Output
    * samples every 11th position to stay bounded.
    */
  private val shuffleInterleave: Q = (s, d) => {
    val seqs = CorpusOps
      .packSequencesScalable(withTok(documents(s, d)), "source", "doc_id", "n_tok", 256L)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast(LongType).as("tok_sum"))
      .withColumn(
        "h",
        graft.ext.Dedup.portableHash64(
          concat(col("source"), lit("#"), col("seq_id").cast(StringType))))
    graft.ext.Prefix
      .globalRank(seqs, Seq(col("h"), col("source"), col("seq_id")), "pos")
      .filter(col("pos") % 11 === 0)
      .select("pos", "source", "seq_id", "n_docs", "tok_sum")
      // Same canonical-digest instrumentation as pack_sequences: a
      // hash-red row with value-green digests indicts the harness hash.
      .withColumn(
        "row_digest",
        digest9(concat(col("pos").cast(StringType), lit(":"), col("source"),
          lit(":"), col("seq_id").cast(StringType), lit(":"),
          col("n_docs").cast(StringType), lit(":"),
          col("tok_sum").cast(StringType))).cast(LongType))
      .orderBy("pos")
  }

  // ------------------------------------------------------------------
  // Packing-pipeline PROBES. `pack_sequences`/`shuffle_interleave` have
  // been rows-green/schema-green/hash-RED in the driver for two rounds
  // while every local falsification (full DuckDB re-run, cpus=3 vs 8
  // bit-identity, key-uniqueness, all-integer outputs) says green — a
  // divergence only the driver's environment can see. These probes
  // decompose the pipeline into separately-oracled stages so the
  // driver's own green/red pattern localizes the diverging stage:
  //   tok  — per-doc token counts            (pins withTok)
  //   cum  — per-doc running sums            (pins Prefix.runningSum)
  //   seq  — per-doc chunk assignment        (pins chunkByCum)
  //   group— the grouped (source,seq_id) rows (pins the aggregation)
  //   rank — the interleave position of every sequence (pins globalRank)
  // Each emits a per-source sum of 30-bit row digests (portable md5
  // hash of the stage's per-row values), so ANY single-cell divergence
  // at that stage flips that probe red. All integers; sums stay far
  // below 2^63.
  // ------------------------------------------------------------------
  private def digest9(c: org.apache.spark.sql.Column) =
    pmod(graft.ext.Dedup.portableHash64(c), lit(1000000000L))

  private def packedDocs(s: SparkSession, d: String): DataFrame =
    CorpusOps
      .packSequencesScalable(withTok(documents(s, d)), "source", "doc_id", "n_tok", 256L)
      .withColumn("st", when(col("straddles"), 1L).otherwise(0L))

  private val packProbeTok: Q = (s, d) =>
    withTok(documents(s, d))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        sum(digest9(concat(col("doc_id").cast(StringType), lit(":"),
          col("n_tok").cast(StringType)))).cast(LongType).as("tok_digest"))
      .orderBy("source")

  private val packProbeCum: Q = (s, d) =>
    graft.ext.Prefix
      .runningSum(withTok(documents(s, d)), col("source"), Seq(col("doc_id")),
        col("n_tok"), "cum")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        max("cum").cast(LongType).as("cum_max"),
        sum(digest9(concat(col("doc_id").cast(StringType), lit(":"),
          col("cum").cast(StringType)))).cast(LongType).as("cum_digest"))
      .orderBy("source")

  private val packProbeSeq: Q = (s, d) =>
    packedDocs(s, d)
      .groupBy("source")
      .agg(
        max("seq_id").cast(LongType).as("max_seq"),
        countDistinct("seq_id").as("n_seqs"),
        sum("st").cast(LongType).as("n_straddle"),
        sum(digest9(concat(col("doc_id").cast(StringType), lit(":"),
          col("seq_id").cast(StringType), lit(":"),
          col("st").cast(StringType)))).cast(LongType).as("seq_digest"))
      .orderBy("source")

  private val packProbeGroup: Q = (s, d) =>
    packedDocs(s, d)
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        sum("st").cast(LongType).as("n_straddle"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_groups"),
        sum(digest9(concat(col("seq_id").cast(StringType), lit(":"),
          col("n_docs").cast(StringType), lit(":"),
          col("tok_sum").cast(StringType), lit(":"),
          col("n_straddle").cast(StringType)))).cast(LongType).as("grp_digest"))
      .orderBy("source")

  private val packProbeRank: Q = (s, d) => {
    val seqs = packedDocs(s, d)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn(
        "h",
        graft.ext.Dedup.portableHash64(
          concat(col("source"), lit("#"), col("seq_id").cast(StringType))))
    graft.ext.Prefix
      .globalRank(seqs, Seq(col("h"), col("source"), col("seq_id")), "pos")
      .agg(
        count(lit(1)).as("n_seqs"),
        max("pos").cast(LongType).as("max_pos"),
        sum(digest9(concat(col("pos").cast(StringType), lit(":"), col("source"),
          lit("#"), col("seq_id").cast(StringType)))).cast(LongType).as("rank_digest"))
  }

  /** Sliding-window chunking WITH OVERLAP (64-token windows, stride 48):
    * the intra-document chunker a RAG index or long-doc pretraining run
    * uses, distinct from [[CorpusOps.packSequences]]' inter-document
    * concat-and-chunk. Chunk count is exact integer math
    * (1 + ceil((n-size)/step) for n > size); chunk membership is a pure
    * projection (explode over a computed index range + O(size) slice per
    * chunk), so the op runs at scan speed and never shuffles the corpus.
    * Per-source digest: chunk/token tallies (overlap tokens counted per
    * chunk — the tok_sum > corpus tokens gap IS the overlap cost) and a
    * min chunk fingerprint to pin exact chunk text.
    */
  private val chunkSlidingWindow: Q = (s, d) => {
    val size = 64
    val step = 48
    val docs = documents(s, d)
      .withColumn("toks", split(coalesce(TextStats.normText(col("text")), lit("")), " "))
      .withColumn("n", size2(col("toks")))
      .withColumn(
        "n_chunks",
        when(col("n") <= size, 1L)
          .otherwise(lit(1L) + ((col("n") - size + (step - 1)) / step).cast(LongType)))
    docs
      .select(
        col("source"),
        col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("ci"))
      .withColumn("chunk", slice(col("toks"), (col("ci") * step + 1).cast(IntegerType), lit(size)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(size2(col("chunk"))).cast(LongType).as("tok_sum"),
        min(md5(concat_ws(" ", col("chunk")))).as("min_fp"))
      .orderBy("source")
  }

  private def size2(c: org.apache.spark.sql.Column) = size(c).cast(LongType)

  /** The WHOLE corpus build as one plan: quality filter -> exact dedup ->
    * decontamination against the eval split -> stratified downsample ->
    * train/val/test assignment, reported as one summary row of per-stage
    * survivors and per-split token budgets. Every stage is a FLAG (the
    * funnel pattern — no driver count() per stage); the only joins are
    * the per-doc contamination hits and the one dedup window. This is
    * the "raw crawl in, training manifest out" composition a data team
    * actually ships; packing/chunking consume its output downstream
    * (`pack_sequences`, `chunk_sliding_window`).
    */
  private val corpusBuildE2e: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val sh = graft.ext.Dedup.wordShingles(
      spread(documents(s, d), "doc_id") // r10: shingle explode on a 1-split scan
        .select(col("doc_id"), TextStats.normText(col("text")).as("t")),
      "doc_id", "t", 5)
    val hits = CorpusOps.contamination(
      sh.filter(col("doc_id") % 97 =!= 0),
      sh.filter(col("doc_id") % 97 === 0),
      "doc_id",
      broadcastRef = true)
    val raw = withTok(documents(s, d))
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn("q", CorpusOps.qualityReason(col("t")) === "keep")
      .withColumn("tkey", sha2(col("t"), 256))
      .drop("t")
      .join(hits, Seq("doc_id"), "left")
    val wD = Window
      .partitionBy("tkey")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = when(col("lang") === "en", 500000L).otherwise(800000L)
    val h = pmod(
      graft.ext.Dedup.portableHash64(
        concat(col("lang"), lit(":"), col("doc_id").cast(StringType))),
      lit(1000000L))
    val hs = pmod(
      graft.ext.Dedup.portableHash64(
        concat(lit("split:"), col("doc_id").cast(StringType))),
      lit(1000000L))
    raw
      .withColumn("keep_d",
        col("q") && sum(when(col("q"), 1L).otherwise(0L)).over(wD) === 1L)
      .withColumn("clean",
        col("keep_d") &&
          !coalesce(col("n_contaminated") * 2 >= col("n_shingles"), lit(false)))
      .withColumn("sampled", col("clean") && h < thr)
      .withColumn("split",
        when(hs < 980000L, "train").when(hs < 990000L, "val").otherwise("test"))
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(when(col("q"), 1L).otherwise(0L)).cast(LongType).as("n_quality"),
        sum(when(col("keep_d"), 1L).otherwise(0L)).cast(LongType).as("n_deduped"),
        sum(when(col("clean"), 1L).otherwise(0L)).cast(LongType).as("n_clean"),
        sum(when(col("sampled"), 1L).otherwise(0L)).cast(LongType).as("n_sampled"),
        sum(when(col("sampled") && col("split") === "train", col("n_tok")).otherwise(0L))
          .cast(LongType).as("tok_train"),
        sum(when(col("sampled") && col("split") === "val", col("n_tok")).otherwise(0L))
          .cast(LongType).as("tok_val"),
        sum(when(col("sampled") && col("split") === "test", col("n_tok")).otherwise(0L))
          .cast(LongType).as("tok_test"))
  }

  /** T5/UL2-style span corruption — the denoising-objective data prep
    * that turns raw text into (input, target) pairs: fixed 3-token spans
    * on a 20-token period (~15% corruption) with a per-doc hash-derived
    * phase, masked spans replaced by `<extra_id_k>` sentinels in the
    * input and emitted after their sentinels in the target. Pure
    * projection: the whole rewrite is one transform/filter/join HOF chain
    * over the materialized token array — no explode, no shuffle, scan
    * speed at any corpus size — and span placement is integer-only, so
    * both rendered strings are md5-checked cross-engine. Only FULL spans
    * corrupt (a tail shorter than the span stays in the input), matching
    * the real objective's behavior.
    */
  private val spanCorruption: Q = (s, d) =>
    withTok(documents(s, d))
      .withColumn("off",
        pmod(
          graft.ext.Dedup.portableHash64(concat(lit("span:"), col("doc_id").cast("string"))),
          lit(20L)))
      .withColumn("toks", split(col("t"), " "))
      .withColumn("n_spans", expr(
        "CASE WHEN n_tok >= off + 3 THEN (n_tok - off - 3) div 20 + 1 ELSE 0 END"))
      .withColumn("input_txt", expr(
        """array_join(filter(transform(sequence(0, int(n_tok) - 1), i ->
          |  CASE WHEN i >= off AND ((i - off) % 20) < 3 AND (off + ((i - off) div 20) * 20 + 3) <= n_tok
          |    THEN (CASE WHEN ((i - off) % 20) = 0
          |          THEN concat('<extra_id_', cast((i - off) div 20 as string), '>')
          |          ELSE NULL END)
          |    ELSE toks[i] END),
          |  x -> x IS NOT NULL), ' ')""".stripMargin))
      .withColumn("target_txt", expr(
        """array_join(filter(transform(sequence(0, int(n_tok) - 1), i ->
          |  CASE WHEN i >= off AND ((i - off) % 20) < 3 AND (off + ((i - off) div 20) * 20 + 3) <= n_tok
          |    THEN (CASE WHEN ((i - off) % 20) = 0
          |          THEN concat('<extra_id_', cast((i - off) div 20 as string), '> ', toks[i])
          |          ELSE toks[i] END)
          |    ELSE NULL END),
          |  x -> x IS NOT NULL), ' ')""".stripMargin))
      .select(
        col("doc_id"), col("n_tok"), col("off"),
        col("n_spans").cast(LongType).as("n_spans"),
        md5(col("input_txt")).as("input_md5"),
        md5(col("target_txt")).as("target_md5"))
      .orderBy("doc_id")

  /** Preference-pair mining (reward-model data prep): score every doc on
    * an integer quality axis (average chars-per-token in milli-units —
    * any integer scorer slots in), rank docs within each source, and pair
    * each doc with its quality-adjacent neighbor when the margin is
    * large enough — (chosen, rejected) pairs with a controlled score
    * gap, the standard way preference data is mined from scored corpora
    * when explicit labels are scarce. The adjacency is NOT a
    * `LEAD() OVER (PARTITION BY source)` window — source has single-digit
    * cardinality, so that window sorts the whole corpus on |sources|
    * tasks at any cluster size (the class PlanHealthSpec bans). Instead:
    * a per-source rank from [[graft.ext.Prefix.runningSum]] (range-
    * partitioned, parallelism = partition count) and a self-equi-join on
    * (source, rank+1) — "next row in order" as a keyed hash join, the
    * same shape a sort-merge adjacency takes at 100 TB. Integer-only
    * decisions.
    */
  private val preferencePairs: Q = (s, d) => {
    val scored = withTok(documents(s, d))
      .withColumn("score", expr("n_chars * 1000 div n_tok"))
    // desc score with doc_id tiebreak expressed as ascending sort exprs
    val ranked = graft.ext.Prefix.runningSum(
      scored,
      col("source"),
      Seq(col("score").desc, col("doc_id").asc),
      lit(1L),
      "rn")
    val nxt = ranked.select(
      col("source").as("n_source"),
      (col("rn") - 1).as("n_rn"),
      col("doc_id").as("nxt_id"),
      col("score").as("nxt_score"))
    ranked
      .join(
        nxt,
        col("source") === col("n_source") && col("rn") === col("n_rn"))
      .filter((col("score") - col("nxt_score")) >= 10)
      .select(
        col("source"),
        col("doc_id").as("chosen_id"),
        col("nxt_id").as("rejected_id"),
        (col("score") - col("nxt_score")).as("margin"))
      .orderBy("source", "chosen_id")
  }

  /** Generator null-preservation semantics (`explode_outer`): exploding a
    * per-doc match list must KEEP docs with zero matches as a null row —
    * the difference between "docs joined to their hits" and "hits only",
    * and the easy silent-row-loss bug in any flatten step (a plain
    * explode drops empty docs from downstream counts). Grouped audit
    * keeps the output bounded; the oracle mirrors explode_outer by
    * substituting [NULL] for empty lists before unnesting.
    */
  private val explodeOuterAudit: Q = (s, d) =>
    withTok(documents(s, d))
      .select(
        col("source"),
        explode_outer(expr("filter(split(t, ' '), x -> x = 'spark')")).as("hit"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("hit")).as("n_hits"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).cast(LongType).as("n_docs_without"))
      .orderBy("source")

  /** Fill-in-the-middle transform (PSM rendering): each doc's token array
    * splits at two hash-derived points into prefix/middle/suffix and is
    * re-rendered as `<fim_prefix> P <fim_suffix> S <fim_middle> M` — the
    * infilling objective's data prep (span_corruption's sibling). Split
    * points are integer-only (portable md5 hash mod n_tok+1, so every
    * cut position including the degenerate empty pieces is reachable),
    * docs under 10 tokens pass through untouched, and the full rendered
    * string is md5-checked cross-engine. One projection, no shuffle —
    * scan speed at any corpus size.
    */
  private val fimTransform: Q = (s, d) =>
    withTok(documents(s, d))
      .withColumn("toks", split(col("t"), " "))
      .withColumn("h1", pmod(
        graft.ext.Dedup.portableHash64(concat(lit("fimA:"), col("doc_id").cast(StringType))),
        col("n_tok") + lit(1L)))
      .withColumn("h2", pmod(
        graft.ext.Dedup.portableHash64(concat(lit("fimB:"), col("doc_id").cast(StringType))),
        col("n_tok") + lit(1L)))
      .withColumn("p1", least(col("h1"), col("h2")))
      .withColumn("p2", greatest(col("h1"), col("h2")))
      .withColumn("fim_applied", (col("n_tok") >= 10).cast(LongType))
      .withColumn("psm", when(col("fim_applied") === 1L,
        concat(
          lit("<fim_prefix> "),
          expr("array_join(slice(toks, 1, int(p1)), ' ')"),
          lit(" <fim_suffix> "),
          expr("array_join(slice(toks, int(p2) + 1, int(n_tok - p2)), ' ')"),
          lit(" <fim_middle> "),
          expr("array_join(slice(toks, int(p1) + 1, int(p2 - p1)), ' ')")))
        .otherwise(col("t")))
      .select(
        col("doc_id"), col("n_tok"), col("p1"), col("p2"), col("fim_applied"),
        md5(col("psm")).as("psm_md5"))
      .orderBy("doc_id")

  /** Integer token-budget apportionment (largest-remainder method): turn
    * per-source token masses into EXACT per-source quotas summing to the
    * budget — the step that converts mix weights into the token counts a
    * training run actually draws. base = floor(budget*tok/total); the
    * leftover budget-sum(base) units go to the largest remainders (source
    * tiebreak). All long-integer math; the remainder ranking runs on
    * [[graft.ext.Prefix.globalRank]] (distributed rank, no single-reducer
    * window) and the two global scalars ride in as broadcast 1-row frames.
    */
  private val tokenBudgetApportion: Q = (s, d) => {
    val perSrc = withTok(documents(s, d))
      .groupBy("source").agg(sum("n_tok").cast(LongType).as("tok"))
    val tot = perSrc.agg(sum("tok").cast(LongType).as("tot"))
    val based = perSrc.crossJoin(broadcast(tot))
      .withColumn("base", expr("1000000 * tok div tot"))
      .withColumn("rem", expr("(1000000 * tok) % tot"))
      .withColumn("neg_rem", -col("rem"))
    val baseSum = based.agg(sum("base").cast(LongType).as("base_sum"))
    graft.ext.Prefix.globalRank(based, Seq(col("neg_rem"), col("source")), "rnk")
      .crossJoin(broadcast(baseSum))
      .withColumn("extra",
        when(col("rnk") <= lit(1000000L) - col("base_sum"), 1L).otherwise(0L))
      .select(
        col("source"), col("tok"),
        col("base").cast(LongType).as("base"),
        col("extra").cast(LongType).as("extra"),
        (col("base") + col("extra")).cast(LongType).as("quota"))
      .orderBy("source")
  }

  /** Epoch up/down-sampling — the mixing step that materializes per-source
    * epoch factors into physical row multiplicity (factor 1.52 ⇒ every doc
    * once plus a hash-chosen 52% twice; factor 0.50 ⇒ a hash-chosen half
    * once, the rest dropped). The fractional part is decided by a portable
    * doc hash, never RNG, so the draw is reproducible and shard-stable;
    * replication is `explode(sequence(1, copies))` — scan-speed row
    * generation, no join, no shuffle before the audit aggregate. Factors
    * derive from the source index (CASE-free integer math) and cover both
    * directions; the per-source audit pins exact multiplicity cross-engine
    * via a doc_id×copy checksum.
    */
  private val mixEpochUpsample: Q = (s, d) => {
    val docs = documents(s, d).select(
      col("doc_id"),
      col("source"),
      (lit(50) + (substring(col("source"), 4, 10).cast(IntegerType) % 7) * 17)
        .as("fx100"))
    docs
      .withColumn(
        "copies",
        (expr("fx100 div 100") +
          when(
            graft.ext.Dedup.portableHash64(col("doc_id").cast(StringType)) % 100
              < col("fx100") % 100,
            1).otherwise(0)).cast(IntegerType))
      .filter(col("copies") > 0)
      .withColumn("copy", explode(sequence(lit(1), col("copies"))))
      .groupBy("source")
      .agg(
        count(lit(1)).as("rows_out"),
        countDistinct(col("doc_id")).as("docs_out"),
        sum(col("doc_id") * col("copy")).cast(LongType).as("checksum"),
        max("fx100").as("fx100"))
      .orderBy("source")
  }

  /** Balanced shard assignment (snake draft): docs ranked by token count
    * descending (doc_id tiebreak) take shard = serpentine(rank−1, N) —
    * the zero-coordination greedy that keeps per-shard token mass within
    * one max-document of even. The rank is [[graft.ext.Prefix.globalRank]]
    * (distributed two-phase prefix rank — no single-reducer window), the
    * assignment pure integer math, so the whole layout is deterministic
    * under any partitioning; this is the writer-side step that makes N
    * output shards finish together instead of one straggling on the fat
    * docs. Audit: per-shard doc/token tallies plus the first (heaviest)
    * rank landing in each shard.
    */
  private val shardBalanced: Q = (s, d) => {
    val n = 8
    val docs = withTok(documents(s, d))
      .select(col("doc_id"), col("n_tok"))
      .withColumn("neg_tok", -col("n_tok"))
    graft.ext.Prefix
      .globalRank(docs, Seq(col("neg_tok"), col("doc_id")), "rnk")
      .withColumn("r0", col("rnk") - 1)
      .withColumn("pos", expr(s"r0 % $n"))
      .withColumn(
        "shard",
        when(expr(s"(r0 div $n) % 2") === 0, col("pos"))
          .otherwise(lit(n - 1) - col("pos")))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast(LongType).as("tok_sum"),
        min("rnk").cast(LongType).as("first_rank"))
      .orderBy("shard")
  }

  /** Hierarchical dataset fingerprint (the Merkle-style provenance root a
    * training run records next to its data mix): leaf = md5(text), leaves
    * hashed into buckets sized to the corpus (the signBucketBits ladder —
    * ~1024 leaves per bucket at any SF, so per-group state is bounded the
    * same way LSH bucket work is), per-(source, bucket) shard hash =
    * md5(sorted leaf hashes), per-source root = md5(sorted shard hashes).
    * Two keyed aggregations; the only ordered state is within one bucket.
    * A single changed/reordered/duplicated document flips its shard hash
    * and the root — the equality check that makes "same dataset?"
    * answerable without re-reading either corpus. At corpora where even
    * the per-source shard LIST outgrows one aggregation row, the same
    * construction nests one more level (bucket-of-buckets) — the k-level
    * generalization is mechanical and noted here rather than built.
    */
  private val datasetMerkle: Q = (s, d) => {
    val docs = documents(s, d)
    val bits = graft.ext.Vectors.signBucketBits(docs.count(), target = 1024, minBits = 4)
    val leaves = docs.select(
      col("source"),
      md5(col("text")).as("h"),
      pmod(graft.ext.Dedup.portableHash64(col("text")), lit(1L << bits)).as("bucket"))
    val shards = leaves
      .groupBy("source", "bucket")
      .agg(count(lit(1)).cast(LongType).as("nd"),
        md5(concat_ws("", sort_array(collect_list(col("h"))))).as("shash"))
    shards
      .groupBy("source")
      .agg(
        sum("nd").cast(LongType).as("n_docs"),
        count(lit(1)).cast(LongType).as("n_shards"),
        md5(concat_ws("", sort_array(collect_list(col("shash"))))).as("root"),
        min("shash").as("min_shard"),
        max("shash").as("max_shard"))
      .orderBy("source")
  }

  /** DSIR-shaped importance reweighting (Xie et al. 2023's hashed-n-gram
    * importance resampling, with the log-likelihood ratio replaced by the
    * integer RATIO in micros — the house log-free surrogate, documented
    * rather than silently approximated): features are unigrams hashed to
    * 256 buckets; the TARGET distribution is the English slice (the
    * high-resource target a mixer upsamples toward), the SOURCE
    * distribution is the whole corpus; per-feature weight is the
    * add-one-smoothed probability ratio in micros (decimal38/HUGEINT
    * cross-multiplication — no division until the final floor), and a
    * doc's weight is its mean token ratio (integral div). Per-lang
    * census + the n_select(w > 1e6) cut verifies the expected signal:
    * target-language docs score above parity, others below. Scale shape:
    * the feature table is 256 rows broadcast onto the exploded terms;
    * two hash aggregations + 1-row totals — nothing grows with the
    * corpus except the linear term pass.
    */
  private val dsirReweight: Q = (s, d) => {
    val docs = documents(s, d)
    val terms = TextStats.terms(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("f", pmod(graft.ext.Dedup.portableHash64(col("term")), lit(256L)))
      .localCheckpoint(true) // feature-model aggregations + scoring pass
    val tgt = terms.filter(col("lang") === "en")
      .groupBy("f").agg(count(lit(1)).cast(LongType).as("ct"))
    val src = terms.groupBy("f").agg(count(lit(1)).cast(LongType).as("cs"))
    val totals = terms.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).cast(LongType).as("tt"),
      count(lit(1)).cast(LongType).as("ts"))
    val ratio = src.join(tgt, Seq("f"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("f"), expr(
        """((cast(ct as decimal(38,0)) + 1) * (ts + 256) * 1000000)
           div ((cast(cs as decimal(38,0)) + 1) * (tt + 256))""").cast(LongType).as("r_u"))
    val w = terms
      .join(broadcast(ratio), Seq("f"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).cast(LongType).as("n_tok"),
        sum("r_u").cast(LongType).as("r_sum"))
      .withColumn("w_u", expr("r_sum div n_tok"))
    w.groupBy("lang")
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum("w_u").cast(LongType).as("w_sum"),
        sum(when(col("w_u") > 1000000L, 1L).otherwise(0L)).cast(LongType).as("n_select"),
        min("w_u").cast(LongType).as("w_min"),
        max("w_u").cast(LongType).as("w_max"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "dataset_merkle" -> datasetMerkle,
    "dsir_reweight" -> dsirReweight,
    "shard_balanced" -> shardBalanced,
    "mix_epoch_upsample" -> mixEpochUpsample,
    "token_budget_apportion" -> tokenBudgetApportion,
    "fim_transform" -> fimTransform,
    "explode_outer_audit" -> explodeOuterAudit,
    "preference_pairs" -> preferencePairs,
    "span_corruption" -> spanCorruption,
    "corpus_build_e2e" -> corpusBuildE2e,
    "chunk_sliding_window" -> chunkSlidingWindow,
    "decontaminate_drop" -> decontaminateDrop,
    "sample_temperature" -> sampleTemperature,
    "split_assign" -> splitAssign,
    "shuffle_interleave" -> shuffleInterleave,
    "contamination_audit" -> contaminationAudit,
    "pii_redaction" -> piiRedaction,
    "repetition_score" -> repetitionScore,
    "quality_filter" -> qualityFilter,
    "sample_stratified" -> sampleStratified,
    "pack_sequences" -> packSequences,
    "length_buckets" -> lengthBuckets,
    "pack_probe_tok" -> packProbeTok,
    "pack_probe_cum" -> packProbeCum,
    "pack_probe_seq" -> packProbeSeq,
    "pack_probe_group" -> packProbeGroup,
    "pack_probe_rank" -> packProbeRank,
    "corpus_curation_funnel" -> curationFunnel
  )

  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** DuckDB twin of [[digest9]]: 60-bit portable md5 hash mod 1e9. */
  private def digSql(x: String) =
    s"(CAST('0x' || substr(md5($x), 1, 15) AS BIGINT) % 1000000000)"

  /** Shared probe prefix: per-doc token counts, running sums, and chunk
    * assignment at budget 256 — the exact stages of `pack_sequences`.
    */
  private val probeBase =
    s"""WITH n AS (SELECT source, doc_id,
      |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT source, doc_id, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM n),
      |b AS (SELECT source, doc_id, n_tok, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id,
      |    CASE WHEN (cum - 1) // 256 > (cum - n_tok) // 256 THEN 1 ELSE 0 END AS st
      |  FROM c)""".stripMargin

  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  val oracle: Map[String, String] = Map(
    "dataset_merkle" -> {
      val ladder = graft.ext.Vectors
        .signBucketBitsSql("(SELECT COUNT(*) FROM documents)", target = 1024, minBits = 4)
      s"""WITH bitsv AS (SELECT $ladder AS bits),
        |lv AS (SELECT source, md5(text) AS h,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
        |      % (1::BIGINT << (SELECT bits FROM bitsv)) AS bucket
        |  FROM documents),
        |sh AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS nd,
        |    md5(string_agg(h, '' ORDER BY h)) AS shash
        |  FROM lv GROUP BY 1, 2)
        |SELECT source, CAST(SUM(nd) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_shards,
        |  md5(string_agg(shash, '' ORDER BY shash)) AS root,
        |  MIN(shash) AS min_shard, MAX(shash) AS max_shard
        |FROM sh GROUP BY source ORDER BY source""".stripMargin
    },
    "dsir_reweight" ->
      """WITH n AS (SELECT doc_id, lang, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |tok0 AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS term FROM n),
        |tk AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 256 AS f
        |  FROM tok0 WHERE length(term) > 0),
        |tgt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ct FROM tk WHERE lang = 'en' GROUP BY f),
        |src AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cs FROM tk GROUP BY f),
        |tot AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt,
        |    CAST(COUNT(*) AS BIGINT) AS ts FROM tk),
        |ratio AS (SELECT src.f,
        |    CAST(((CAST(coalesce(tgt.ct, 0) AS HUGEINT) + 1) * (ts + 256) * 1000000)
        |      // ((CAST(cs AS HUGEINT) + 1) * (tt + 256)) AS BIGINT) AS r_u
        |  FROM src LEFT JOIN tgt ON tgt.f = src.f CROSS JOIN tot),
        |w AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(SUM(r_u) AS BIGINT) AS r_sum
        |  FROM tk JOIN ratio ON ratio.f = tk.f GROUP BY 1, 2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(r_sum // n_tok) AS BIGINT) AS w_sum,
        |  CAST(SUM(CASE WHEN r_sum // n_tok > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_select,
        |  CAST(MIN(r_sum // n_tok) AS BIGINT) AS w_min,
        |  CAST(MAX(r_sum // n_tok) AS BIGINT) AS w_max
        |FROM w GROUP BY lang ORDER BY lang""".stripMargin,
    "shard_balanced" ->
      s"""WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |    ROW_NUMBER() OVER (ORDER BY -n_tok, doc_id) - 1 AS r0 FROM d),
        |a AS (SELECT doc_id, n_tok, r0,
        |    CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8 ELSE 7 - (r0 % 8) END AS shard
        |  FROM r)
        |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(MIN(r0 + 1) AS BIGINT) AS first_rank
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "mix_epoch_upsample" ->
      """WITH d AS (SELECT doc_id, source,
        |    50 + (TRY_CAST(substr(source, 4, 10) AS INT) % 7) * 17 AS fx100
        |  FROM documents),
        |c AS (SELECT doc_id, source, fx100,
        |    fx100 // 100 + CASE
        |      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < fx100 % 100
        |      THEN 1 ELSE 0 END AS copies
        |  FROM d),
        |x AS (SELECT doc_id, source, fx100, unnest(range(1, copies + 1)) AS copy FROM c)
        |SELECT source, COUNT(*) AS rows_out, COUNT(DISTINCT doc_id) AS docs_out,
        |  CAST(SUM(doc_id * copy) AS BIGINT) AS checksum, MAX(fx100) AS fx100
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    "explode_outer_audit" ->
      s"""WITH base AS (SELECT source, coalesce($normSql, '') AS t FROM documents),
        |hits AS (SELECT source,
        |    list_filter(string_split(t, ' '), x -> x = 'spark') AS arr
        |  FROM base),
        |outered AS (SELECT source,
        |    unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS hit
        |  FROM hits)
        |SELECT source, COUNT(*) AS n_rows, COUNT(hit) AS n_hits,
        |  CAST(SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_without
        |FROM outered GROUP BY source ORDER BY source""".stripMargin,
    "preference_pairs" ->
      s"""WITH base AS (SELECT doc_id, source, n_chars,
        |    len(string_split(coalesce($normSql, ''), ' ')) AS n_tok
        |  FROM documents),
        |scored AS (SELECT doc_id, source, (n_chars * 1000) // n_tok AS score FROM base),
        |ranked AS (SELECT source, doc_id, score,
        |    LEAD(doc_id) OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS nxt_id,
        |    LEAD(score) OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS nxt_score
        |  FROM scored)
        |SELECT source, doc_id AS chosen_id, nxt_id AS rejected_id,
        |  CAST(score - nxt_score AS BIGINT) AS margin
        |FROM ranked
        |WHERE nxt_id IS NOT NULL AND score - nxt_score >= 10
        |ORDER BY source, chosen_id""".stripMargin,
    "span_corruption" ->
      s"""WITH base AS (SELECT doc_id, coalesce($normSql, '') AS t FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS toks,
        |    CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tok,
        |    CAST('0x' || substr(md5('span:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 20 AS off
        |  FROM base),
        |pieces AS (SELECT doc_id, n_tok, off,
        |    CASE WHEN n_tok >= off + 3 THEN (n_tok - off - 3) // 20 + 1 ELSE 0 END AS n_spans,
        |    array_to_string(list_filter(list_transform(generate_series(0, CAST(n_tok AS INT) - 1), i ->
        |      CASE WHEN i >= off AND ((i - off) % 20) < 3 AND (off + ((i - off) // 20) * 20 + 3) <= n_tok
        |        THEN (CASE WHEN ((i - off) % 20) = 0
        |              THEN '<extra_id_' || CAST((i - off) // 20 AS VARCHAR) || '>'
        |              ELSE NULL END)
        |        ELSE toks[i + 1] END),
        |      x -> x IS NOT NULL), ' ') AS input_txt,
        |    array_to_string(list_filter(list_transform(generate_series(0, CAST(n_tok AS INT) - 1), i ->
        |      CASE WHEN i >= off AND ((i - off) % 20) < 3 AND (off + ((i - off) // 20) * 20 + 3) <= n_tok
        |        THEN (CASE WHEN ((i - off) % 20) = 0
        |              THEN '<extra_id_' || CAST((i - off) // 20 AS VARCHAR) || '> ' || toks[i + 1]
        |              ELSE toks[i + 1] END)
        |        ELSE NULL END),
        |      x -> x IS NOT NULL), ' ') AS target_txt
        |  FROM tk)
        |SELECT doc_id, n_tok, off, CAST(n_spans AS BIGINT) AS n_spans,
        |  md5(COALESCE(input_txt, '')) AS input_md5,
        |  md5(COALESCE(target_txt, '')) AS target_md5
        |FROM pieces ORDER BY doc_id""".stripMargin,
    "token_budget_apportion" ->
      s"""WITH n AS (SELECT source,
        |    CAST(SUM(len(string_split(coalesce($normSql, ''), ' '))) AS BIGINT) AS tok
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(tok) AS BIGINT) AS tot FROM n),
        |b AS (SELECT source, tok, 1000000 * tok // tot AS base,
        |    (1000000 * tok) % tot AS rem FROM n, t),
        |s AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM b),
        |r AS (SELECT b.*, ROW_NUMBER() OVER (ORDER BY -rem, source) AS rnk FROM b)
        |SELECT r.source, r.tok, CAST(r.base AS BIGINT) AS base,
        |  CAST(CASE WHEN rnk <= 1000000 - base_sum THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(r.base + CASE WHEN rnk <= 1000000 - base_sum THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r, s ORDER BY source""".stripMargin,
    "fim_transform" ->
      s"""WITH base AS (SELECT doc_id, coalesce($normSql, '') AS t FROM documents),
        |tk AS (SELECT doc_id, t, string_split(t, ' ') AS toks,
        |    CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tok
        |  FROM base),
        |hp AS (SELECT doc_id, t, toks, n_tok,
        |    CAST('0x' || substr(md5('fimA:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % (n_tok + 1) AS h1,
        |    CAST('0x' || substr(md5('fimB:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % (n_tok + 1) AS h2
        |  FROM tk),
        |sp AS (SELECT doc_id, t, toks, n_tok,
        |    LEAST(h1, h2) AS p1, GREATEST(h1, h2) AS p2,
        |    CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END AS applied
        |  FROM hp)
        |SELECT doc_id, n_tok, p1, p2, CAST(applied AS BIGINT) AS fim_applied,
        |  md5(CASE WHEN applied = 1 THEN
        |      '<fim_prefix> ' ||
        |      COALESCE(array_to_string(list_slice(toks, 1, CAST(p1 AS INT)), ' '), '') ||
        |      ' <fim_suffix> ' ||
        |      COALESCE(array_to_string(list_slice(toks, CAST(p2 + 1 AS INT), CAST(n_tok AS INT)), ' '), '') ||
        |      ' <fim_middle> ' ||
        |      COALESCE(array_to_string(list_slice(toks, CAST(p1 + 1 AS INT), CAST(p2 AS INT)), ' '), '')
        |    ELSE t END) AS psm_md5
        |FROM sp ORDER BY doc_id""".stripMargin,
    "corpus_build_e2e" ->
      s"""WITH nn AS (SELECT doc_id, $normSql AS t FROM documents),
        |tkq AS (SELECT doc_id, string_split(t, ' ') AS toks FROM nn),
        |shq AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> array_to_string(toks[i:i+4], ' '))) AS shingle
        |  FROM tkq WHERE len(toks) >= 5) z),
        |ev AS (SELECT DISTINCT shingle FROM shq WHERE doc_id % 97 = 0),
        |trn AS (SELECT doc_id, shingle FROM shq WHERE doc_id % 97 <> 0),
        |hits AS (SELECT trn.doc_id, COUNT(*) AS n_sh,
        |    SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_cont
        |  FROM trn LEFT JOIN ev ON trn.shingle = ev.shingle GROUP BY trn.doc_id),
        |m AS (SELECT d.doc_id, d.lang, coalesce($normSql, '') AS t,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(coalesce($normSql, '')) AS BIGINT) AS chars,
        |    CAST(len(regexp_extract_all(coalesce($normSql, ''), '[^A-Za-z0-9\\s]')) AS BIGINT) AS punct,
        |    CAST(len(regexp_extract_all(coalesce($normSql, ''), '\\b(the|a|of|and|to)\\b')) AS BIGINT) AS stop
        |  FROM documents d WHERE d.doc_id % 97 <> 0),
        |kept AS (SELECT * FROM m
        |  WHERE n_tok >= 5 AND n_tok <= 5000
        |    AND chars - (n_tok - 1) >= n_tok * 3 AND chars - (n_tok - 1) <= n_tok * 10
        |    AND punct * 10 <= chars AND stop > 0),
        |ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
        |    FROM kept) x WHERE rn = 1),
        |cln AS (SELECT ded.* FROM ded LEFT JOIN hits ON ded.doc_id = hits.doc_id
        |  WHERE NOT COALESCE(hits.n_cont * 2 >= hits.n_sh, FALSE)),
        |samp AS (SELECT * FROM cln WHERE
        |  CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 1000000 < CASE lang WHEN 'en' THEN 500000 ELSE 800000 END),
        |spl AS (SELECT n_tok,
        |    CASE WHEN h < 980000 THEN 'train' WHEN h < 990000 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT *,
        |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000 AS h FROM samp) y)
        |SELECT (SELECT COUNT(*) FROM m) AS n_train_docs,
        |  (SELECT COUNT(*) FROM kept) AS n_quality,
        |  (SELECT COUNT(*) FROM ded) AS n_deduped,
        |  (SELECT COUNT(*) FROM cln) AS n_clean,
        |  COUNT(*) AS n_sampled,
        |  CAST(SUM(CASE WHEN split = 'train' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_train,
        |  CAST(SUM(CASE WHEN split = 'val' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_val,
        |  CAST(SUM(CASE WHEN split = 'test' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_test
        |FROM spl""".stripMargin,
    "chunk_sliding_window" ->
      s"""WITH n0 AS (SELECT source, string_split(coalesce($normSql, ''), ' ') AS toks
        |  FROM documents),
        |n1 AS (SELECT source, toks, CAST(len(toks) AS BIGINT) AS n FROM n0),
        |c AS (SELECT source, toks, unnest(generate_series(0,
        |    CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END)) AS ci FROM n1),
        |ch AS (SELECT source, toks[ci * 48 + 1 : ci * 48 + 64] AS chunk FROM c)
        |SELECT source, COUNT(*) AS n_chunks, CAST(SUM(len(chunk)) AS BIGINT) AS tok_sum,
        |  MIN(md5(array_to_string(chunk, ' '))) AS min_fp
        |FROM ch GROUP BY source ORDER BY source""".stripMargin,
    "decontaminate_drop" ->
      s"""WITH nn AS (SELECT doc_id, $normSql AS t FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM nn),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> array_to_string(toks[i:i+4], ' '))) AS shingle
        |  FROM tk WHERE len(toks) >= 5) q),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
        |hits AS (SELECT tr.doc_id, COUNT(*) AS n_shingles,
        |    SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
        |  FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle GROUP BY tr.doc_id),
        |base AS (SELECT d.source, d.doc_id,
        |    COALESCE(h.n_contaminated * 2 >= h.n_shingles, FALSE) AS dropped
        |  FROM documents d LEFT JOIN hits h USING (doc_id) WHERE d.doc_id % 97 <> 0)
        |SELECT source, COUNT(*) AS n_train,
        |  CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN NOT dropped THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
        |FROM base GROUP BY source ORDER BY source""".stripMargin,
    "sample_temperature" ->
      s"""WITH n AS (SELECT source, doc_id,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |per AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tok_s FROM n GROUP BY source),
        |mn AS (SELECT MIN(tok_s) AS tok_min FROM per),
        |r AS (SELECT source,
        |    CAST(FLOOR(sqrt(CAST(tok_min AS DOUBLE) / CAST(tok_s AS DOUBLE)) * 1000000) AS BIGINT) AS thr
        |  FROM per, mn),
        |k AS (SELECT n.source, r.thr, n.n_tok,
        |    CAST('0x' || substr(md5(n.source || '@' || CAST(n.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000 AS h
        |  FROM n JOIN r ON n.source = r.source)
        |SELECT source, thr,
        |  CAST(SUM(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN h < thr THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept
        |FROM k GROUP BY source, thr ORDER BY source""".stripMargin,
    "split_assign" ->
      s"""WITH n AS (SELECT doc_id,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT doc_id, n_tok,
        |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000 AS h
        |  FROM n)
        |SELECT CASE WHEN h < 980000 THEN 'train' WHEN h < 990000 THEN 'val'
        |    ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "shuffle_interleave" ->
      s"""WITH n AS (SELECT doc_id, source,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM n),
        |b AS (SELECT source, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id, n_tok FROM c),
        |q AS (SELECT source, seq_id, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tok_sum
        |  FROM b GROUP BY source, seq_id),
        |hh AS (SELECT *, CAST('0x' || substr(md5(source || '#' || CAST(seq_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM q),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY h, source, seq_id) AS pos FROM hh)
        |SELECT pos, source, seq_id, n_docs, tok_sum,
        |  CAST(${digSql("CAST(pos AS VARCHAR) || ':' || source || ':' || CAST(seq_id AS VARCHAR) || ':' || CAST(n_docs AS VARCHAR) || ':' || CAST(tok_sum AS VARCHAR)")} AS BIGINT) AS row_digest
        |FROM r WHERE pos % 11 = 0
        |ORDER BY pos""".stripMargin,
    "contamination_audit" ->
      s"""WITH nn AS (SELECT doc_id, $normSql AS t FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM nn),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> array_to_string(toks[i:i+4], ' '))) AS shingle
        |  FROM tk WHERE len(toks) >= 5) q),
        |train AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 <> 0),
        |ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 = 0)
        |SELECT ev.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |FROM ev LEFT JOIN train t ON ev.shingle = t.shingle
        |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin,
    "pii_redaction" ->
      s"""WITH dirty AS (SELECT source,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com acct '
        |      || CAST((doc_id + 1) * 1234567 AS VARCHAR) AS dirty
        |  FROM documents),
        |r AS (SELECT source,
        |    len(regexp_extract_all(dirty, '$emailRe')) AS n_email,
        |    len(regexp_extract_all(dirty, '[0-9]{7,}')) AS n_num,
        |    regexp_replace(regexp_replace(dirty, '$emailRe', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g') AS clean
        |  FROM dirty)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_email) AS BIGINT) AS emails_found,
        |  CAST(SUM(n_num) AS BIGINT) AS nums_found,
        |  CAST(SUM(len(regexp_extract_all(clean, '$emailRe'))) AS BIGINT) AS emails_left,
        |  COUNT(DISTINCT md5(clean)) AS n_clean_fp,
        |  MIN(md5(clean)) AS min_clean_fp
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "repetition_score" ->
      s"""WITH nn AS (SELECT $normSql AS t FROM documents),
        |tk AS (SELECT string_split(t, ' ') AS toks FROM nn
        |  WHERE len(string_split(t, ' ')) >= 3),
        |g AS (SELECT list_transform(generate_series(1, len(toks) - 2),
        |    i -> array_to_string(toks[i:i+2], ' ')) AS grams FROM tk),
        |r AS (SELECT CAST(len(list_distinct(grams)) AS BIGINT) AS d,
        |    CAST(len(grams) AS BIGINT) AS n FROM g)
        |SELECT (d * 10) // n AS decile, COUNT(*) AS n_docs
        |FROM r WHERE n > 0 GROUP BY decile ORDER BY decile""".stripMargin,
    "quality_filter" ->
      s"""WITH n AS (SELECT doc_id, coalesce($normSql, '') AS t FROM documents),
        |m AS (SELECT doc_id, t,
        |    CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(t) AS BIGINT) AS chars,
        |    CAST(len(regexp_extract_all(t, '[^A-Za-z0-9\\s]')) AS BIGINT) AS punct,
        |    CAST(len(regexp_extract_all(t, '\\b(the|a|of|and|to)\\b')) AS BIGINT) AS stop
        |  FROM n),
        |r AS (SELECT doc_id, n_tok, CASE
        |    WHEN n_tok < 5 THEN 'too_short'
        |    WHEN n_tok > 5000 THEN 'too_long'
        |    WHEN chars - (n_tok - 1) < n_tok * 3 THEN 'short_words'
        |    WHEN chars - (n_tok - 1) > n_tok * 10 THEN 'long_words'
        |    WHEN punct * 10 > chars THEN 'symbol_heavy'
        |    WHEN stop = 0 THEN 'no_stopwords'
        |    ELSE 'keep' END AS reason FROM m)
        |SELECT reason, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM r GROUP BY reason ORDER BY reason""".stripMargin,
    "sample_stratified" ->
      """WITH k AS (SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000 AS h,
        |    CASE lang WHEN 'en' THEN 250000 WHEN 'de' THEN 500000
        |      WHEN 'es' THEN 750000 WHEN 'fr' THEN 1000000
        |      ELSE 100000 END AS thr
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM k WHERE h < thr GROUP BY lang ORDER BY lang""".stripMargin,
    "corpus_curation_funnel" ->
      s"""WITH n AS (SELECT doc_id, lang, source, coalesce($normSql, '') AS t FROM documents),
        |m AS (SELECT *, CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(t) AS BIGINT) AS chars,
        |    CAST(len(regexp_extract_all(t, '[^A-Za-z0-9\\s]')) AS BIGINT) AS punct,
        |    CAST(len(regexp_extract_all(t, '\\b(the|a|of|and|to)\\b')) AS BIGINT) AS stop
        |  FROM n),
        |kept AS (SELECT doc_id, lang, source, t, n_tok FROM m
        |  WHERE n_tok >= 5 AND n_tok <= 5000
        |    AND chars - (n_tok - 1) >= n_tok * 3 AND chars - (n_tok - 1) <= n_tok * 10
        |    AND punct * 10 <= chars AND stop > 0),
        |ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t ORDER BY doc_id) AS rn
        |    FROM kept) x WHERE rn = 1),
        |samp AS (SELECT * FROM ded WHERE
        |  CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |    % 1000000 < CASE lang WHEN 'en' THEN 500000 ELSE 800000 END),
        |packed AS (SELECT source, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM samp),
        |pb AS (SELECT source, n_tok, (cum - n_tok) // 2048 AS seq_id,
        |    CASE WHEN (cum - 1) // 2048 > (cum - n_tok) // 2048 THEN 1 ELSE 0 END AS straddle
        |  FROM packed)
        |SELECT (SELECT COUNT(*) FROM m) AS n_raw,
        |  (SELECT COUNT(*) FROM kept) AS n_quality,
        |  (SELECT COUNT(*) FROM ded) AS n_deduped,
        |  COUNT(*) AS n_sampled,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_total,
        |  COUNT(DISTINCT source || '#' || CAST(seq_id AS VARCHAR)) AS n_sequences,
        |  CAST(SUM(straddle) AS BIGINT) AS n_straddle
        |FROM pb""".stripMargin,
    "length_buckets" ->
      s"""WITH n AS (SELECT CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (SELECT n_tok, n_tok // 64 AS bucket FROM n)
        |SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(MAX(n_tok) AS BIGINT) AS max_tok,
        |  CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS padded_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "pack_probe_tok" ->
      s"""$probeBase
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(SUM(${digSql("CAST(doc_id AS VARCHAR) || ':' || CAST(n_tok AS VARCHAR)")}) AS BIGINT) AS tok_digest
        |FROM n GROUP BY source ORDER BY source""".stripMargin,
    "pack_probe_cum" ->
      s"""$probeBase
        |SELECT source, COUNT(*) AS n_docs, CAST(MAX(cum) AS BIGINT) AS cum_max,
        |  CAST(SUM(${digSql("CAST(doc_id AS VARCHAR) || ':' || CAST(cum AS VARCHAR)")}) AS BIGINT) AS cum_digest
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "pack_probe_seq" ->
      s"""$probeBase
        |SELECT source, CAST(MAX(seq_id) AS BIGINT) AS max_seq,
        |  COUNT(DISTINCT seq_id) AS n_seqs,
        |  CAST(SUM(st) AS BIGINT) AS n_straddle,
        |  CAST(SUM(${digSql("CAST(doc_id AS VARCHAR) || ':' || CAST(seq_id AS VARCHAR) || ':' || CAST(st AS VARCHAR)")}) AS BIGINT) AS seq_digest
        |FROM b GROUP BY source ORDER BY source""".stripMargin,
    "pack_probe_group" ->
      s"""$probeBase,
        |g AS (SELECT source, seq_id, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tok_sum, CAST(SUM(st) AS BIGINT) AS n_straddle
        |  FROM b GROUP BY source, seq_id)
        |SELECT source, COUNT(*) AS n_groups,
        |  CAST(SUM(${digSql("CAST(seq_id AS VARCHAR) || ':' || CAST(n_docs AS VARCHAR) || ':' || CAST(tok_sum AS VARCHAR) || ':' || CAST(n_straddle AS VARCHAR)")}) AS BIGINT) AS grp_digest
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "pack_probe_rank" ->
      s"""$probeBase,
        |q AS (SELECT source, seq_id FROM b GROUP BY source, seq_id),
        |hh AS (SELECT *,
        |    CAST('0x' || substr(md5(source || '#' || CAST(seq_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM q),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY h, source, seq_id) AS pos FROM hh)
        |SELECT COUNT(*) AS n_seqs, CAST(MAX(pos) AS BIGINT) AS max_pos,
        |  CAST(SUM(${digSql("CAST(pos AS VARCHAR) || ':' || source || '#' || CAST(seq_id AS VARCHAR)")}) AS BIGINT) AS rank_digest
        |FROM r""".stripMargin,
    "pack_sequences" ->
      s"""WITH n AS (SELECT doc_id, source,
        |    CAST(len(string_split(coalesce($normSql, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM n),
        |b AS (SELECT source, n_tok, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id,
        |    CASE WHEN (cum - 1) // 256 > (cum - n_tok) // 256 THEN 1 ELSE 0 END AS straddle
        |  FROM c),
        |g AS (SELECT source, seq_id, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |    CAST(SUM(straddle) AS BIGINT) AS n_straddle
        |  FROM b GROUP BY source, seq_id)
        |SELECT source, seq_id, n_docs, tok_sum, n_straddle,
        |  CAST(${digSql("source || ':' || CAST(seq_id AS VARCHAR) || ':' || CAST(n_docs AS VARCHAR) || ':' || CAST(tok_sum AS VARCHAR) || ':' || CAST(n_straddle AS VARCHAR)")} AS BIGINT) AS row_digest
        |FROM g ORDER BY source, seq_id""".stripMargin
  )
}
