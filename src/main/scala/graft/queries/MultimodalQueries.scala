package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ext.Multimodal

/** Multimodal/semi-structured queries (X5): JSON props extraction and
  * binary-payload metadata. The mapPartitions featurizer also surfaces
  * here (rows-only check — its checksum math is not SQL-portable).
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** events.props is a JSON string column; extract k with a regexp (same
    * dialect both engines; from_json -> MapType is the library-level op,
    * see EventProps below) and aggregate by k-bucket.
    */
  private val propsExtract: Q = (s, d) =>
    events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast(LongType))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("k_bucket")

  /** Spark 4 VariantType lane: `parse_json` turns the props string into
    * an open-schema variant (the modern semi-structured column type —
    * binary-encoded, shreddable, no schema declaration), `variant_get`
    * path-extracts with a target type, and `is_variant_null` guards
    * missing paths. This is the engine-native alternative to both the
    * regexp lane (propsExtract) and the fixed-schema from_json lane
    * (propsTypedMap): at 100 TB the variant encoding parses once at scan
    * and every downstream path access is a cheap binary probe, not a
    * re-parse. Aggregates stay integer/decimal-exact.
    */
  private val propsVariant: Q = (s, d) =>
    events(s, d)
      .withColumn("vp", parse_json(col("props")))
      .withColumn("k", expr("variant_get(vp, '$.k', 'long')"))
      .withColumn("missing", expr("variant_get(vp, '$.absent', 'long')"))
      .groupBy((col("k") % 7).as("k_mod7"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("missing").isNull, 1L).otherwise(0L)).cast(LongType).as("n_no_absent"),
        sum("k").cast(LongType).as("k_sum"),
        dsum(col("value")).as("value_sum"))
      .orderBy("k_mod7")

  /** Binary payload stats per source: byte totals + sha256 distincts. */
  private val binaryMeta: Q = (s, d) =>
    documents(s, d)
      .select(
        col("source"),
        encode(col("text"), "UTF-8").as("payload"),
        sha2(col("text"), 256).as("sha"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("payload"))).cast(LongType).as("total_bytes"),
        countDistinct(col("sha")).as("n_sha"),
        min("sha").as("min_sha"))
      .orderBy("source")

  /** Batch-shaped stub featurizer over binarized documents. The fake
    * decode is md5-portable (see [[Multimodal.decodeStub]]), so the whole
    * binarize -> mapPartitions-batch-decode -> join-back -> aggregate
    * pipeline is hash-checked against DuckDB: features cross the engine
    * boundary as exact integer millionths, never accumulated floats.
    */
  private val mediaFeatures: Q = (s, d) => {
    val docs = documents(s, d)
    Multimodal
      .extractFeatures(Multimodal.binarize(docs))
      .toDF()
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(
        col("source"),
        col("byte_len"),
        col("checksum"),
        round(col("features")(0) * 1e6).cast(LongType).as("f0_u"),
        round(col("features")(7) * 1e6).cast(LongType).as("f7_u"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("byte_len").cast(LongType).as("total_bytes"),
        sum("f0_u").cast(LongType).as("sum_f0_u"),
        sum("f7_u").cast(LongType).as("sum_f7_u"),
        countDistinct(col("checksum")).as("n_checksum"),
        min("checksum").as("min_checksum"))
      .orderBy("source")
  }

  /** Frame-sample plumbing over binary payloads: 64-byte frames, per-frame
    * md5 identity, per-source frame census. The corpus is ASCII so the
    * oracle replays byte frames as varchar substr frames; the Spark side
    * slices true bytes (substring on BinaryType).
    */
  private val mediaFrames: Q = (s, d) =>
    documents(s, d)
      // payload must be a MATERIALIZED column: the frame HOF runs
      // interpreted and would re-evaluate an encode() expression once per
      // frame — O(len^2/frameBytes) on megabyte payloads
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("source"),
        explode(Multimodal.frameHashes(col("payload"), 64)).as("fh"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("fh")).as("n_distinct"),
        min("fh").as("min_fh"))
      .orderBy("source")

  /** The TYPED semi-structured path: `from_json` -> MapType -> key access
    * ([[Multimodal.parseProps]], the library op behind the regexp-based
    * `props_extract`), oracle-checked against DuckDB's JSON extension —
    * so the schema-on-read JSON lane is hash-verified, not just the
    * regexp shortcut.
    */
  private val propsTypedMap: Q = (s, d) =>
    Multimodal
      .parseProps(events(s, d))
      .withColumn("k", element_at(col("props_map"), "k").cast(LongType))
      .groupBy((col("k") % 7).as("k_mod"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("k")).as("n_k"),
        dsum(col("value")).as("value_sum"))
      .orderBy("k_mod")

  /** Video featurizer over the text corpus: no document is an AVI, so
    * every row must take the flagged fallback lane (`n_decoded = 0` is
    * asserted by the oracle's literal) with the whole-payload portable
    * hash as its single frame hash — pinning the fallback contract and
    * the featurize -> join-back -> aggregate plumbing. The REAL RIFF/AVI
    * parse (header metadata, frame-chunk spans, even-padding walk) is
    * pinned by VideoCodecSpec on synthetic AVIs.
    */
  private val mediaVideoMeta: Q = (s, d) => {
    val docs = documents(s, d)
    Multimodal
      .extractVideoFeatures(Multimodal.binarize(docs))
      .toDF()
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(
        col("source"),
        col("byte_len"),
        (col("frame_hashes")(0) % 1000000L).as("h_u"),
        when(col("decoded"), 1L).otherwise(0L).as("dec"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("dec").cast(LongType).as("n_decoded"),
        sum("byte_len").cast(LongType).as("total_bytes"),
        sum("h_u").cast(LongType).as("sum_h_u"))
      .orderBy("source")
  }

  /** Video PIXEL decode, oracle-checked end-to-end: two-thirds of the
    * docs become REAL RIFF/AVI payloads (built row-side with
    * [[Multimodal.syntheticAvi]]) carrying two raw bottom-up BGR DIB
    * frames whose bytes follow a closed-form integer sequence
    * `((doc_id%256)*31 + frame*17 + i*7) % 256`; the featurizer walks the
    * container, DECODES the rasters pixel-by-pixel
    * ([[Multimodal.decodeVideoFrame]]) and sums per-channel intensity
    * bucket counts — exact integers the oracle recomputes ANALYTICALLY
    * from the same sequence (256 residue classes × 288 bytes, never
    * touching a blob), so a wrong stride, a missed bottom-up flip, or a
    * broken container walk all hash-mismatch. The remaining third are
    * text payloads pinning the md5 fallback lane. The MJPEG decode path
    * (ImageIO over `00dc` spans) shares decodeVideoFrame and is pinned
    * pixel-exactly by VideoCodecSpec — JPEG bytes cannot cross the
    * engine boundary.
    */
  private val mediaVideoFeatures: Q = (s, d) => {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id").cast(LongType), col("source"), col("text"))
    val binz = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload =
          if (id % 3 == 0) Option(text).getOrElse("").getBytes("UTF-8")
          else {
            val frames = (0 until 2).map { f =>
              Array.tabulate(8 * 6 * 3)(i =>
                (((id % 256) * 31 + f * 17 + i * 7) % 256).toByte)
            }
            Multimodal.syntheticAvi(8, 6, 40000L, frames)
          }
        (id, payload)
      }
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractVideoPixelFeatures(binz, bins = 4, maxFrames = 8).toDF()
    // hist indexes: 0..3 R, 4..7 G, 8..11 B (imageHistogramCounts layout)
    val histCols = (for ((name, base) <- Seq(("r", 0), ("g", 4), ("b", 8)); k <- 0 until 4)
      yield sum(element_at(col("hist"), base + k + 1)).cast(LongType).as(s"$name$k"))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(when(col("decoded"), 1L).otherwise(0L)).cast(LongType).as("n_avi"),
      sum(col("n_decoded_frames")).cast(LongType).as("frames_dec"),
      sum(when(col("decoded"), 0L)
        .otherwise(element_at(col("undecoded_hashes"), 1) % 1000000L))
        .cast(LongType).as("sum_h_u")) ++ histCols
    feats
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "media_video_features" -> mediaVideoFeatures,
    "props_typed_map" -> propsTypedMap,
    "props_variant" -> propsVariant,
    "props_extract" -> propsExtract,
    "binary_meta" -> binaryMeta,
    "media_features_stub" -> mediaFeatures,
    "media_frame_hashes" -> mediaFrames,
    "media_video_meta" -> mediaVideoMeta
  )

  val oracle: Map[String, String] = Map(
    "media_video_features" -> {
      // analytic per-channel bucket counts for one residue class: frame
      // bytes follow ((rm*31 + f*17 + i*7) % 256), component = i%3 in DIB
      // order (0=B, 1=G, 2=R), bucket = value // 64
      def cnt(comp: Int, k: Int) =
        s"CAST(SUM(CASE WHEN comp = $comp AND v // 64 = $k THEN 1 ELSE 0 END) AS BIGINT)"
      val rExprs = (0 until 4).map(k => s"${cnt(2, k)} AS r$k").mkString(", ")
      val gExprs = (0 until 4).map(k => s"${cnt(1, k)} AS g$k").mkString(", ")
      val bExprs = (0 until 4).map(k => s"${cnt(0, k)} AS b$k").mkString(", ")
      val sums = (for (n <- Seq("r", "g", "b"); k <- 0 until 4)
        yield s"CAST(coalesce(SUM(rh.$n$k), 0) AS BIGINT) AS $n$k").mkString(", ")
      s"""WITH px AS (SELECT rm.rm, ((rm.rm * 31 + ff.f * 17 + ii.i * 7) % 256) AS v,
        |    ii.i % 3 AS comp
        |  FROM generate_series(0, 255) rm(rm), generate_series(0, 1) ff(f),
        |       generate_series(0, 143) ii(i)),
        |rh AS (SELECT rm, $rExprs, $gExprs, $bExprs FROM px GROUP BY rm),
        |avid AS (SELECT doc_id, source, doc_id % 256 AS rm FROM documents
        |  WHERE doc_id % 3 <> 0),
        |aa AS (SELECT a.source, COUNT(*) AS n_avi, $sums
        |  FROM avid a JOIN rh ON rh.rm = a.rm GROUP BY a.source),
        |fb AS (SELECT source, COUNT(*) AS n_fb,
        |    CAST(SUM(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000000) AS BIGINT) AS sum_h_u
        |  FROM documents WHERE doc_id % 3 = 0 GROUP BY source),
        |srcs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
        |SELECT s.source, s.n_docs,
        |  CAST(coalesce(aa.n_avi, 0) AS BIGINT) AS n_avi,
        |  CAST(coalesce(aa.n_avi, 0) * 2 AS BIGINT) AS frames_dec,
        |  CAST(coalesce(fb.sum_h_u, 0) AS BIGINT) AS sum_h_u,
        |  ${(for (n <- Seq("r", "g", "b"); k <- 0 until 4)
             yield s"coalesce(aa.$n$k, 0) AS $n$k").mkString(", ")}
        |FROM srcs s LEFT JOIN aa ON aa.source = s.source
        |LEFT JOIN fb ON fb.source = s.source
        |ORDER BY s.source""".stripMargin
    },
    "props_variant" ->
      """WITH x AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |    CAST(json_extract(props, '$.absent') AS BIGINT) AS missing, value
        |  FROM events)
        |SELECT k % 7 AS k_mod7, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_absent,
        |  CAST(SUM(k) AS BIGINT) AS k_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM x GROUP BY 1 ORDER BY k_mod7""".stripMargin,
    "props_typed_map" ->
      """WITH x AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
        |  FROM events)
        |SELECT k % 7 AS k_mod, COUNT(*) AS n, COUNT(DISTINCT k) AS n_k,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        |FROM x GROUP BY k % 7 ORDER BY k_mod""".stripMargin,
    "props_extract" ->
      """WITH x AS (SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k, value FROM events)
        |SELECT k % 10 AS k_bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM x GROUP BY k % 10 ORDER BY k_bucket""".stripMargin,
    "binary_meta" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT sha256(text)) AS n_sha, MIN(sha256(text)) AS min_sha
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "media_features_stub" ->
      """WITH f AS (
        |  SELECT source,
        |    octet_length(encode(text)) AS byte_len,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS checksum,
        |    CAST(('0x' || substr(md5(text || '#0'), 1, 15)) AS BIGINT) % 1000000 AS f0_u,
        |    CAST(('0x' || substr(md5(text || '#7'), 1, 15)) AS BIGINT) % 1000000 AS f7_u
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
        |  CAST(SUM(f0_u) AS BIGINT) AS sum_f0_u,
        |  CAST(SUM(f7_u) AS BIGINT) AS sum_f7_u,
        |  COUNT(DISTINCT checksum) AS n_checksum,
        |  MIN(checksum) AS min_checksum
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "media_frame_hashes" ->
      """WITH f AS (SELECT source,
        |    unnest(list_transform(
        |      generate_series(1, CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT)),
        |      j -> md5(substr(text, CAST((j - 1) * 64 + 1 AS BIGINT), 64)))) AS fh
        |  FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT source, COUNT(*) AS n_frames, COUNT(DISTINCT fh) AS n_distinct,
        |  MIN(fh) AS min_fh
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "media_video_meta" ->
      """WITH f AS (SELECT source,
        |    octet_length(encode(text)) AS byte_len,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000000 AS h_u
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs, CAST(0 AS BIGINT) AS n_decoded,
        |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
        |  CAST(SUM(h_u) AS BIGINT) AS sum_h_u
        |FROM f GROUP BY source ORDER BY source""".stripMargin
  )
}
