package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Versioned snapshot table — the immutable-manifest-log core of every
  * lakehouse table format (Delta/Iceberg), reduced to its essential
  * moves, on plain Hadoop FileSystem APIs so it works on any scheme the
  * session resolves (file:, s3a:, the spec's graftstore:):
  *
  *   - every write lands in a NEW immutable data directory with a
  *     writer-unique name — no in-place mutation, so readers of older
  *     versions are never disturbed (snapshot isolation for free), and
  *     two racing writers can never touch each other's files;
  *   - a version becomes visible only when its manifest file
  *     `_manifests/N` (whose CONTENT is the data-directory pointer) is
  *     published, and publish is an atomic no-overwrite primitive chosen
  *     per scheme (see [[publishManifest]]) — a crashed writer leaves
  *     invisible data files, never a half-published table;
  *   - the current table is simply the highest manifest number, so
  *     "publish" is one file create and time travel is "follow the
  *     manifest you pick";
  *   - two concurrent writers racing to publish N collide on the atomic
  *     create; the loser re-reads the log and retries at N+1 — classic
  *     optimistic concurrency, no locks.
  *
  * At 100 TB the properties that matter: publish cost is O(1) files (the
  * manifest), old versions stay readable during and after a write, and a
  * failed job needs no cleanup before a retry (its orphaned data
  * directory is unreferenced). Vacuuming unreferenced directories is a
  * listing diff against the manifests, left to the caller.
  */
object Snapshots {

  /** One version's manifest payload: the immutable data-directory
    * pointer, the optional exactly-once txn id, the optional
    * deletion-vector directory (merge-on-read deletes: the data files
    * are untouched; the DV names the (file, row) pairs a reader must
    * drop), and the optional DECLARED SCHEMA (schema evolution: set the
    * moment a version's logical schema stops being derivable from its
    * parquet footers alone — [[addColumn]], evolving [[updateWhere]] —
    * and carried forward by every subsequent write; base64 of the
    * StructType JSON, so the payload stays one `|`-separated line).
    * Wire format `data[|txn[|dv[|schema]]]` with `-` as the
    * absent-field sentinel — parsed in exactly two places
    * ([[readManifest]], [[latestCheckpoint]]) and serialized in two
    * ([[publishManifest]] callers, [[checkpointLog]]).
    */
  private[io] case class Entry(
      data: String,
      txn: Option[String],
      dv: Option[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None) {
    def serialize: String = {
      val sch = schema.map(s => java.util.Base64.getEncoder.encodeToString(
        s.json.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      (txn, dv, sch) match {
        case (None, None, None) => data
        case (Some(t), None, None) => s"$data|$t"
        case (t, Some(d), None) => s"$data|${t.getOrElse("-")}|$d"
        case (t, d, Some(s)) => s"$data|${t.getOrElse("-")}|${d.getOrElse("-")}|$s"
      }
    }

    /** The version's data SEGMENTS: `data` is one directory name or a
      * '+'-joined list of them ([[appendRows]]/[[updateWhere]] grow a
      * version by pointing at the prior segments plus one new one —
      * never copying data). Generated names are `data_<uuid8>`, so '+'
      * cannot appear inside a segment name; a pre-multi-segment manifest
      * parses as the single-element list, keeping old logs readable.
      */
    def segments: Seq[String] = data.split('+').toSeq
  }
  private[io] object Entry {
    private def opt(s: String): Option[String] = if (s == "-") None else Some(s)
    private def decodeSchema(s: String): org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.DataType
        .fromJson(new String(
          java.util.Base64.getDecoder.decode(s),
          java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    def parse(fields: Array[String]): Entry = fields match {
      case Array(data) => Entry(data, None, None)
      case Array(data, txn) => Entry(data, Some(txn), None)
      case Array(data, txn, dv) => Entry(data, opt(txn), Some(dv))
      case Array(data, txn, dv, sch) =>
        Entry(data, opt(txn), opt(dv), opt(sch).map(decodeSchema))
      case _ => throw new IllegalStateException(
        s"bad manifest payload: ${fields.mkString("|")}")
    }
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  private val CheckpointPrefix = "checkpoint_"

  /** Versions present as individual manifest FILES (the live log tail —
    * after [[checkpointLog]] drops compacted manifests this is bounded
    * by the checkpoint interval, not the table's age).
    */
  private def listedVersions(f: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Long] = {
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else
      f.listStatus(md)
        .map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption)
        .sorted
        .toSeq
  }

  /** The newest checkpoint, if any: (covered-up-to version, full state
    * `v -> (dataName, txnOpt)` for every version it covers). One listing
    * + one file read — the bounded entry point every reader starts from.
    * A checkpoint listed a moment ago may have been superseded-and-
    * deleted by a racing [[checkpointLog]]; retry on the fresh listing.
    */
  private def latestCheckpoint(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[(Long, Map[Long, Entry])] = {
    val md = manifestDir(dir)
    if (!f.exists(md)) return None
    val cks = f.listStatus(md)
      .map(_.getPath.getName)
      .filter(_.startsWith(CheckpointPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(CheckpointPrefix).toLong).toOption)
      .sorted
    cks.reverseIterator
      .map { up =>
        try {
          val in = f.open(new Path(md, CheckpointPrefix + up))
          val bytes =
            try {
              val bos = new java.io.ByteArrayOutputStream()
              org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
              bos.toByteArray
            } finally in.close()
          val entries = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .split('\n')
            .filter(_.nonEmpty)
            .map { line =>
              val fields = line.split('|')
              if (fields.length < 2)
                throw new IllegalStateException(s"bad checkpoint line: $line")
              fields.head.toLong -> Entry.parse(fields.tail)
            }
            .toMap
          Some((up, entries))
        } catch { case _: java.io.FileNotFoundException => None }
      }
      .collectFirst { case Some(ck) => ck }
  }

  /** All published versions, ascending (empty for a fresh table): the
    * latest checkpoint's coverage plus the live manifest tail.
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val ck = latestCheckpoint(f, dir).map(_._2.keySet).getOrElse(Set.empty[Long])
    (ck ++ listedVersions(f, dir)).toSeq.sorted
  }

  /** Latest published version, if any. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** Write `df` as a new version and atomically publish it. Returns the
    * published version number. Safe under concurrent committers: each
    * writer's data directory is unique (no cross-writer clobbering even
    * while racing for the same version number), and the manifest create
    * is create-if-absent; the collision loser re-reads the log and
    * retries with the next number against its already-written data.
    */
  /** One publish attempt: write the manifest CONTENT to a hidden temp
    * file, then promote it to `_manifests/v` with an atomic NO-OVERWRITE
    * primitive — a manifest is either absent or complete (never partial:
    * the writer dies mid-write only on the dot-file the version listing
    * ignores), and two writers racing for the same number resolve to
    * exactly one winner. Plain `FileSystem.rename` is NOT that primitive:
    * on the local fs it bottoms out in POSIX rename(2), which silently
    * REPLACES an existing destination, so an exists() pre-check + rename
    * would let two racers both "win" v and lose one commit. The primitive
    * is picked per scheme:
    *
    *   - local fs: `Files.createLink` — POSIX link(2) fails atomically
    *     with EEXIST when the target exists, the one local syscall with
    *     true create-if-absent semantics on a complete file;
    *   - schemes with an AbstractFileSystem binding (HDFS):
    *     `FileContext.rename(tmp, target, Rename.NONE)` — enforced
    *     no-overwrite, atomic server-side;
    *   - other FileSystem-only schemes (the spec's graftstore:):
    *     exists-check + rename, the same narrow check-then-act window
    *     every FileSystem-API committer has on such stores. On a raw
    *     object store without atomic rename this layer needs the external
    *     commit coordinator every table format needs there.
    *
    * Returns false iff another writer owns this version number.
    */
  /** Manifest payload framing: `m1\n` marker + raw UTF-8 bytes. The
    * original format was `DataOutputStream.writeUTF`, whose 2-byte length
    * prefix caps a payload at 65535 bytes — an append-heavy table's
    * '+'-joined segment list or a wide evolved schema's base64 JSON walks
    * into that ceiling and every subsequent publish throws
    * UTFDataFormatException, bricking the table. The marker is
    * unambiguous against old manifests: an old file's third byte is the
    * first payload char ('d' of "data_"), never '\n', so the compat read
    * in [[readManifest]] can always tell the formats apart.
    */
  private val PayloadMarker = "m1\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private[io] def publishManifest(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long,
      dataName: String): Boolean = {
    val target = new Path(manifestDir(dir), v.toString)
    if (f.exists(target)) return false // cheap fast-path; atomicity rests on the promote below
    val tmp = new Path(manifestDir(dir), s".tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try {
      out.write(PayloadMarker)
      out.write(dataName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    val won = promoteNoOverwrite(f, tmp, target)
    // local link leaves tmp as a second name for the inode; a lost race
    // leaves the loser's tmp; a completed rename leaves nothing (no-op)
    f.delete(tmp, false)
    won
  }

  /** Atomically promote `tmp` to `target`, failing (false) if `target`
    * already exists — see [[publishManifest]] for the per-scheme choice.
    * On the local path `tmp` is left in place for the caller to delete
    * (link(2) creates a second name for the same inode).
    */
  private def promoteNoOverwrite(
      f: org.apache.hadoop.fs.FileSystem,
      tmp: Path,
      target: Path): Boolean = {
    if (scala.util.Try(f.getScheme).toOption.contains("file")) {
      import java.nio.file.{Files, Paths, FileAlreadyExistsException}
      try {
        Files.createLink(Paths.get(target.toUri.getPath), Paths.get(tmp.toUri.getPath))
        // keep checksum verification alive on a checksummed local fs: the
        // crc sidecar is content-addressed, so linking it under the
        // target's name is valid; best-effort (readers tolerate no-crc)
        scala.util.Try {
          val crcT = Paths.get(new Path(target.getParent, s".${target.getName}.crc").toUri.getPath)
          val crcS = Paths.get(new Path(tmp.getParent, s".${tmp.getName}.crc").toUri.getPath)
          if (Files.exists(crcS) && !Files.exists(crcT)) Files.createLink(crcT, crcS)
        }
        true
      } catch { case _: FileAlreadyExistsException => false }
    } else {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, f.getConf)
        try {
          fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // FileSystem-only scheme: the best available is check-then-rename
          if (f.exists(target)) false else f.rename(tmp, target)
      }
    }
  }

  def commitVersion(spark: SparkSession, df: DataFrame, dir: String, maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val dataName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dataName).toString)
    publishNewVersion(spark, f, dir, dataName, maxRetries)
  }

  /** OCC publish loop for an already-written data directory. Only a LOST
    * RACE retries (publishManifest returned false after a clean temp
    * write); real IO failures propagate with their cause.
    */
  private def publishNewVersion(
      spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      dataName: String,
      maxRetries: Int): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
      if (publishManifest(f, dir, v, dataName)) return v
      attempt += 1
    }
    throw new IllegalStateException(s"could not publish a version after $maxRetries attempts")
  }

  private def statsPath(dir: String, dataName: String) =
    new Path(new Path(dir, dataName), "_stats")

  /** Commit `df` as a new version carrying a per-file min/max statistics
    * sidecar — the manifest-level data-skipping layer of every lakehouse
    * format. Parquet row-group skipping still OPENS every file to read
    * its footer; at 100 TB with millions of files the listing + footer
    * round-trips dominate a selective query's cost, so the format must be
    * able to prune the FILE LIST from bounded metadata before the scan
    * starts. The sidecar lives at `<dataDir>/_stats` — a leading-
    * underscore path Spark's file index ignores, so [[readVersion]] is
    * unaffected — and is written BEFORE the manifest publish, so any
    * published version's sidecar is complete (the same immutability
    * argument as the data files; a crashed writer leaves only invisible
    * debris). Stats cost one extra scan of the new files (one keyed
    * aggregation, no shuffle wider than the file count).
    *
    * Cluster `df` first (e.g. `repartitionByRange` on the stats columns,
    * as [[Compaction.writeClustered]] does) — stats on a scattered layout
    * span the whole domain and prune nothing.
    */
  def commitVersionWithStats(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      statsCols: Seq[String],
      maxRetries: Int = 10): Long = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val dataName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dataName).toString)
    val aggs = count(lit(1)).as("n_rows") +:
      statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(new Path(dir, dataName).toString)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // one sidecar file: rows are bounded by the file count
      .write.parquet(statsPath(dir, dataName).toString)
    publishNewVersion(spark, f, dir, dataName, maxRetries)
  }

  /** Read version `v` touching only the files whose [min, max] stats
    * overlap every `lo <= col <= hi` bound — file-grain data skipping
    * from the stats sidecar. Pruning is conservative: kept files may
    * still hold non-matching rows (the caller applies the row predicate
    * as usual; Catalyst then pushes it into the surviving files' row
    * groups), dropped files provably hold none. A file whose stats
    * column is entirely NULL has NULL min/max and is dropped — range
    * predicates never select NULL rows, so that is exact, not lossy.
    *
    * Versions committed without stats (or bounds on columns the sidecar
    * does not carry) fall back to the full file list — stats are an
    * optimization, never a correctness gate. The only driver
    * materialization is the surviving file-name list, bounded by one
    * version's file count — the same planning-time metadata every table
    * format's driver holds.
    */
  def readVersionPruned(
      spark: SparkSession,
      dir: String,
      v: Long,
      bounds: Map[String, (Any, Any)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val f = fs(spark, dir)
    val entry = manifestEntry(f, dir, v)
    require(entry.isDefined, s"version $v is not published in $dir")
    // Stats sidecars are written by the single-segment commit paths; a
    // multi-segment version (appendRows/updateWhere growth) prunes only
    // if EVERY segment carries one — stats are an optimization, and the
    // conservative fallback is the plain read (compactDeletes or a
    // commitVersionWithStats rewrite restores pruning after heavy
    // append/update churn, the OPTIMIZE contract every format has).
    if (!entry.get.segments.forall(dn => f.exists(statsPath(dir, dn))))
      return readVersion(spark, dir, v)
    // Per-segment sidecars may carry different stats columns (different
    // statsCols across commits); a sampled-schema union would
    // null-evaluate the keep filter and silently prune matching files.
    // Pruning additionally restricts to columns EVERY segment's sidecar
    // carries: a merged-in null from a sidecar that never computed the
    // column is indistinguishable from the exact all-null-column case, so
    // such columns fall back to unpruned (conservative, never lossy).
    // ONE footer read per sidecar: each frame's schema feeds both the
    // intersection and the union (unionByName with allowMissing replaces
    // a second mergeSchema scan of every sidecar on this hot planning path).
    val sidecars = entry.get.segments
      .map(dn => spark.read.parquet(statsPath(dir, dn).toString))
    val everywhere = sidecars.map(_.columns.toSet).reduce(_ intersect _)
    val stats = sidecars.reduce(_.unionByName(_, allowMissingColumns = true))
    // Bounds arrive under TODAY's logical names, but sidecars were
    // written in their commit's era and carry that era's column names —
    // which equal the declared field's PHYSICAL name (physical names are
    // pinned at first rename and never change). Looking up `min_$logical`
    // directly would, after a rename chain that REUSES a prior name
    // (rename b->c then a->b — legal, renameColumn only checks logical
    // collisions), consult the WRONG column's min/max and silently drop
    // files containing matching rows. Translate through the declared
    // schema first; a column absent from the declared schema (or whose
    // physical the sidecars never computed) falls back to unpruned —
    // conservative, never lossy.
    val declared = entry.get.schema
    def physOf(c: String): String = declared
      .flatMap(_.fields.find(_.name == c).map(physicalName))
      .getOrElse(c)
    val usable = bounds.toSeq
      .map { case (c, b) => (physOf(c), b) }
      .filter { case (p, _) => everywhere.contains(s"min_$p") }
    if (usable.isEmpty) return readVersion(spark, dir, v)
    val keep = usable
      .map { case (p, (lo, hi)) => col(s"max_$p") >= lit(lo) && col(s"min_$p") <= lit(hi) }
      .reduce(_ && _)
    val files = stats.filter(keep).select("file").collect().map(_.getString(0)).toIndexedSeq
    if (files.isEmpty)
      // no file can match: empty result with the version's schema (the
      // foldable-false filter collapses to an empty LocalRelation)
      readVersion(spark, dir, v).where(lit(false))
    else {
      // the pruned file subset still owes the version's deletion vector:
      // DV keys are absolute file paths, so the anti-join naturally
      // no-ops for rows of files the pruning already dropped — and an
      // evolved version's declared-schema alignment applies here too
      alignToDeclared(
        applyDv(spark, dir, segmentReader(spark, entry.get.schema).parquet(files: _*),
          entry.get.dv),
        entry.get.schema)
    }
  }

  /** Parse one manifest: (data directory name, optional txn id). The
    * single reader of the wire format — committedTxns, vacuum and
    * readVersion all go through here, so the format lives in one place.
    */
  private def readManifest(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long): Entry =
    Entry.parse(readManifestPayload(f, dir, v).split('|'))

  /** The raw manifest payload string: `m1` framing (marker + UTF-8) with
    * a compatibility read for pre-round-9 `writeUTF` manifests — see
    * [[PayloadMarker]] for why the two are unambiguous.
    */
  private[io] def readManifestPayload(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long): String = {
    val in = f.open(new Path(manifestDir(dir), v.toString))
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toByteArray
      } finally in.close()
    if (bytes.length >= PayloadMarker.length &&
      PayloadMarker.indices.forall(i => bytes(i) == PayloadMarker(i)))
      new String(bytes, PayloadMarker.length, bytes.length - PayloadMarker.length,
        java.nio.charset.StandardCharsets.UTF_8)
    else
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)).readUTF()
  }

  /** Scan-path manifest read: a manifest listed a moment ago may legally
    * be GONE by the time it is opened — a concurrent idempotent commit
    * retracts its own duplicate manifest (see the dup sweep below), so a
    * vanished file is ordinary lock-free log churn, not corruption. The
    * sweeping/scanning paths skip it; only the targeted readVersion treats
    * absence as an error.
    */
  private def readManifestOpt(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long): Option[Entry] =
    try Some(readManifest(f, dir, v))
    catch { case _: java.io.FileNotFoundException => None }

  /** Resolve a version to its (data dir, txn): the live manifest file if
    * present, else the latest checkpoint's entry — the lookup every
    * reader uses once [[checkpointLog]] has dropped compacted manifests.
    */
  private def manifestEntry(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long): Option[Entry] =
    readManifestOpt(f, dir, v)
      .orElse(latestCheckpoint(f, dir).flatMap(_._2.get(v)))

  /** Transaction ids already committed to this table. What makes
    * at-least-once streaming replays exactly-once: a replayed
    * micro-batch's txn id is already in the log, so its commit is a
    * no-op. Cost: one checkpoint read + one manifest read per
    * POST-checkpoint version — bounded by the [[checkpointLog]] cadence,
    * not the table's age (a continuously-ingesting table's log would
    * otherwise grow one file per micro-batch forever).
    */
  def committedTxns(spark: SparkSession, dir: String): Set[String] = {
    val f = fs(spark, dir)
    val ck = latestCheckpoint(f, dir)
    val base = ck.map(_._2.values.flatMap(_.txn).toSet).getOrElse(Set.empty[String])
    val covered = ck.map(_._1).getOrElse(-1L)
    base ++ listedVersions(f, dir)
      .filter(_ > covered)
      .flatMap(v => readManifestOpt(f, dir, v).flatMap(_.txn))
  }

  /** Compact the manifest log: write `_manifests/checkpoint_V` (V = the
    * current latest version) carrying the FULL table state — every
    * version's data-directory pointer and txn id, folded from the
    * previous checkpoint plus the live tail — then drop the now-redundant
    * individual manifests `<= V` and any superseded older checkpoint.
    * After compaction every reader path (versions, committedTxns,
    * readVersion time travel, vacuum's referenced set) starts from the
    * checkpoint and touches only the post-checkpoint tail, so log cost is
    * bounded by the compaction cadence. This is the move every real table
    * format makes (Delta's _last_checkpoint, Iceberg's snapshot
    * metadata); the wire format here is the minimal line-per-version one.
    *
    * Write is the same no-overwrite publish primitive as a manifest: a
    * checkpoint is either absent or complete. Two racers checkpointing at
    * the same V produce byte-identical content, so the loser's EEXIST is
    * success; racers at different V both land and the newest wins the
    * next listing. Returns the covered-up-to version, or None on an empty
    * table.
    */
  def checkpointLog(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    if (vs.isEmpty) return None
    val upTo = vs.max
    val prev = latestCheckpoint(f, dir).map(_._2).getOrElse(Map.empty[Long, Entry])
    val entries = vs.flatMap(v => readManifestOpt(f, dir, v).orElse(prev.get(v)).map(v -> _))
    val content = entries
      .map { case (v, e) => s"$v|${e.serialize}" }
      .mkString("", "\n", "\n")
    val md = manifestDir(dir)
    val target = new Path(md, CheckpointPrefix + upTo)
    if (!f.exists(target)) {
      val tmp = new Path(md, s".tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, false)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      promoteNoOverwrite(f, tmp, target) // loser = identical content already there
      f.delete(tmp, false)
    }
    // drop compacted manifests and superseded checkpoints: in-flight
    // scans tolerate vanished files (readManifestOpt) and targeted reads
    // fall back to the checkpoint (manifestEntry), so deletion is safe
    listedVersions(f, dir)
      .filter(_ <= upTo)
      .foreach(v => f.delete(new Path(md, v.toString), false))
    f.listStatus(md)
      .map(_.getPath.getName)
      .filter(_.startsWith(CheckpointPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(CheckpointPrefix).toLong).toOption)
      .filter(_ < upTo)
      .foreach(v => f.delete(new Path(md, CheckpointPrefix + v), false))
    Some(upTo)
  }

  /** Idempotent commit for streaming `foreachBatch`: publishes `df` as a
    * new version carrying `txnId`, or does nothing (returns None) if a
    * version with this txnId is already in the log — the micro-batch was
    * already committed before a restart/replay. Spark's foreachBatch is
    * at-least-once; this check is what upgrades the sink to
    * exactly-once, the same move every lakehouse streaming sink makes.
    * `txnId` must be scoped to the writing application (e.g.
    * "appId#batchId") — a bare batch number would collide with any other
    * stream writing the same table.
    */
  def commitVersionIdempotent(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      txnId: String,
      maxRetries: Int = 10): Option[Long] = {
    require(txnId.nonEmpty, "txnId must be non-empty (an empty id would " +
      "serialize as a trailing field split() drops, silently disabling idempotence)")
    require(!txnId.contains('|'), "txnId must not contain the manifest separator '|'")
    if (committedTxns(spark, dir).contains(txnId)) return None
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val dataName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dataName).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      // re-check EVERY iteration, before picking a version number: a
      // concurrent replay of the SAME txn may have published since our
      // last look without us ever losing a rename race (it can win a
      // HIGHER version number than the one we are about to try) — the
      // check and the version choice must see the same log state
      if (committedTxns(spark, dir).contains(txnId)) return None
      val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
      if (publishManifest(f, dir, v, s"$dataName|$txnId")) {
        // post-publish duplicate sweep: a concurrent replay of this txn
        // can land at a DIFFERENT version number without either writer
        // losing a rename race (check→publish is not atomic over plain
        // files). Deterministic resolution: lowest version wins; a
        // duplicate retracts itself. The loser's data dir becomes
        // vacuum-able debris and its brief visibility window is the
        // price of lock-free publish on a plain filesystem.
        val dup = versions(spark, dir)
          .filter(w => w != v && readManifestOpt(f, dir, w).exists(_.txn.contains(txnId)))
        if (dup.exists(_ < v)) {
          f.delete(new Path(manifestDir(dir), v.toString), false)
          return None
        }
        return Some(v)
      }
      attempt += 1
    }
    throw new IllegalStateException(s"could not publish txn $txnId after $maxRetries attempts")
  }

  /** Change data feed between two published versions: the multiset diff
    * (exceptAll both ways, so duplicate-row count changes surface too),
    * tagged `insert`/`delete` — an update is a delete+insert pair.
    * Downstream incremental consumers (aggregate maintenance, index
    * refresh) process versions by diff instead of re-reading the table;
    * cost is two anti-join-shaped passes over just the two versions.
    */
  def changes(spark: SparkSession, dir: String, fromV: Long, toV: Long): DataFrame = {
    val before = readVersion(spark, dir, fromV)
    val after = readVersion(spark, dir, toV)
    // exceptAll requires aligned schemas; diffing across a schema change
    // is semantically ambiguous (is a widened row "changed"?), so the
    // boundary is rejected loudly — evolve consumers read versions whole
    require(
      before.schema == after.schema,
      s"change feed across a schema change (v$fromV -> v$toV) is not defined; " +
        "read the versions whole instead")
    after.exceptAll(before).withColumn("_change", org.apache.spark.sql.functions.lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change", org.apache.spark.sql.functions.lit("delete")))
  }

  /** Delete data directories no manifest references (crashed or
    * race-losing writers) and return their names. Never touches a
    * referenced version — history stays fully time-travelable. Only
    * directories older than `minAgeMs` are candidates: an unreferenced
    * dir can be an IN-FLIGHT writer that has written data but not yet
    * published its manifest, and age is the only signal that
    * distinguishes debris from a live commit — the same retention-window
    * contract every table format's vacuum has. Default 24 h; tests pass
    * 0 deliberately.
    */
  def vacuum(spark: SparkSession, dir: String, minAgeMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val f = fs(spark, dir)
    // a manifest retracted mid-scan leaves its data dir unreferenced —
    // exactly the debris vacuum exists to collect, so skipping is correct.
    // Checkpoint entries count as references too: after checkpointLog the
    // individual manifests are gone but their versions stay readable.
    val ckRefs = latestCheckpoint(f, dir)
      .map(_._2.values.flatMap(e => e.segments ++ e.dv.toSeq).toSet)
      .getOrElse(Set.empty[String])
    val referenced = ckRefs ++
      listedVersions(f, dir)
        .flatMap(v => readManifestOpt(f, dir, v))
        .flatMap(e => e.segments ++ e.dv.toSeq)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val orphans = f.listStatus(new Path(dir))
      .filter(st =>
        (st.getPath.getName.startsWith("data_") || st.getPath.getName.startsWith("dv_")) &&
          !referenced(st.getPath.getName) &&
          st.getModificationTime <= cutoff)
      .map(_.getPath.getName)
      .toSeq
    orphans.foreach(n => f.delete(new Path(dir, n), true))
    orphans
  }

  /** Read the latest published version (snapshot-isolated: a concurrent
    * commit cannot change the files this DataFrame reads).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir,
      latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir")))

  /** Time travel: read an explicit published version by following its
    * manifest's data-directory pointer — from the live manifest file or,
    * after log compaction, from the checkpoint's entry. A version that
    * carries a DECLARED schema (post-[[addColumn]] evolution) reads its
    * segments with footer merging and aligns to that schema — segments
    * written before the evolution surface the new columns as null, and
    * time travel to pre-evolution versions keeps their exact old shape
    * (their entries carry no/an older schema).
    */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val f = fs(spark, dir)
    val entry = manifestEntry(f, dir, v)
    require(entry.isDefined, s"version $v is not published in $dir")
    alignToDeclared(
      applyDv(spark, dir, segmentScan(spark, dir, entry.get), entry.get.dv),
      entry.get.schema)
  }

  /** Scan a version's data segments. A declared-schema version reads with
    * an EXPLICIT physical schema (each declared field requested under its
    * physical name at its declared — possibly WIDENED — type): the parquet
    * reader then null-fills physicals absent from pre-evolution segments,
    * ignores dropped columns' stale bytes, and up-converts narrower file
    * types in the vectorized path (int32→int64, float→double, decimal
    * precision-up — the Spark 4 widening promotions), all WITHOUT the
    * footer-merging job `mergeSchema` runs over every file at planning
    * time — which, besides costing a pass over the footers, hard-fails on
    * exactly the heterogeneity [[widenColumn]] creates (StructType.merge
    * rejects int vs long). Plain versions keep the single-footer fast
    * path byte-for-byte.
    */
  private def segmentScan(spark: SparkSession, dir: String, entry: Entry): DataFrame =
    segmentReader(spark, entry.schema)
      .parquet(entry.segments.map(new Path(dir, _).toString): _*)

  /** The reader for a (possibly evolved) version's segments: explicit
    * physical-name/declared-type schema when a declared schema exists
    * (see [[segmentScan]]), the plain footer-driven reader otherwise.
    */
  private def segmentReader(
      spark: SparkSession,
      declared: Option[org.apache.spark.sql.types.StructType]): org.apache.spark.sql.DataFrameReader =
    declared match {
      case None => spark.read
      case Some(st) =>
        spark.read.schema(org.apache.spark.sql.types.StructType(
          st.fields.map(f => org.apache.spark.sql.types.StructField(
            physicalName(f), f.dataType, nullable = true))))
    }

  /** COLUMN MAPPING (rename/drop without rewriting data — Delta's column
    * mapping move): each declared field may carry the PHYSICAL name its
    * bytes live under in parquet, in the field's metadata under this key.
    * Physical names are assigned once and never change: [[renameColumn]]
    * changes only the logical name (metadata-only publish), [[dropColumn]]
    * removes the field (old segments' physical column becomes ignored
    * bytes), and a column added while a mapping exists gets a FRESH
    * physical name when its logical name ever collides with a physical
    * one — a dropped column's stale bytes can therefore never resurface
    * under a re-added name. No metadata key ⇒ physical == logical (every
    * pre-mapping table, unchanged byte-for-byte).
    */
  private val PhysicalKey = "graft.physical"

  private def physicalName(fld: org.apache.spark.sql.types.StructField): String =
    if (fld.metadata.contains(PhysicalKey)) fld.metadata.getString(PhysicalKey) else fld.name

  /** The physical name for a NEW declared field: the logical name on a
    * mapping-free table (today's byte-compatible behavior), else a fresh
    * `p_<uuid>`. "Mapping history exists" — any field carrying
    * [[PhysicalKey]] — forces the uuid path because a DROPPED column's
    * physical name is no longer visible in the declared schema, and
    * re-using it would resurface the stale bytes old segments still hold
    * under that name ([[dropColumn]] pins the marker onto every surviving
    * field for exactly this reason).
    */
  private def freshPhysical(
      logical: String,
      cur: org.apache.spark.sql.types.StructType): String =
    if (cur.fields.exists(f =>
        physicalName(f) == logical || f.metadata.contains(PhysicalKey)))
      s"p_${java.util.UUID.randomUUID().toString.take(8)}"
    else logical

  /** Record `physical` on the field. The identity case (physical ==
    * logical, no prior pin) stays metadata-free so a plain [[addColumn]]
    * never creates mapping history; `force` pins even the identity —
    * [[dropColumn]] needs the history marker on every surviving field.
    */
  private def withPhysical(
      fld: org.apache.spark.sql.types.StructField,
      physical: String,
      force: Boolean = false): org.apache.spark.sql.types.StructField =
    if (!force && physical == fld.name && !fld.metadata.contains(PhysicalKey)) fld
    else fld.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(fld.metadata).putString(PhysicalKey, physical).build())

  /** Rename a segment write's columns from the table's logical names to
    * their physical ones — every segment-writing path (append, update
    * rewrite, merge, compaction pack) goes through here so parquet always
    * stores physical names. Identity (and plan-free) without a mapping.
    */
  private def toPhysical(
      df: DataFrame,
      declared: Option[org.apache.spark.sql.types.StructType]): DataFrame = declared match {
    case None => df
    case Some(st) =>
      import org.apache.spark.sql.functions.col
      if (st.fields.forall(f => physicalName(f) == f.name)) df
      else df.select(st.fields.toSeq.map(f => col(f.name).as(physicalName(f))): _*)
  }

  /** Project to the declared schema when one exists: declared column
    * order, each field read from its PHYSICAL column, missing physicals
    * (pre-evolution segments) null-filled with the declared type; `keep`
    * columns (the DV keys) pass through untouched.
    */
  private def alignToDeclared(
      base: DataFrame,
      declared: Option[org.apache.spark.sql.types.StructType],
      keep: Seq[String] = Nil): DataFrame = declared match {
    case None => base
    case Some(st) =>
      import org.apache.spark.sql.functions.{col, lit}
      val present = base.columns.toSet
      val cols = st.fields.toSeq.map { fld =>
        val p = physicalName(fld)
        if (present(p)) col(p).as(fld.name)
        else lit(null).cast(fld.dataType).as(fld.name)
      } ++ keep.map(col)
      base.select(cols: _*)
  }

  /** The latest version's logical schema: the declared one if evolution
    * set it, else the segments' parquet schema.
    */
  def tableSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType = {
    val f = fs(spark, dir)
    // the latest manifest can legally vanish between the listing and the
    // open (a concurrent idempotent writer retracting its duplicate) —
    // the same benign log churn every write loop retries on, so re-read
    // the log instead of crashing the caller on a .get
    var attempt = 0
    while (attempt < 10) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case Some(entry) =>
          return entry.schema.getOrElse(segmentScan(spark, dir, entry).schema)
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"could not resolve the latest manifest in $dir after 10 attempts")
  }

  /** Fail a write whose dataframe shape diverges from the table's schema
    * (names, types AND order must match exactly — a mismatched append
    * would otherwise commit fine and later multi-segment reads would
    * silently null-fill instead of failing loudly). Nullability and
    * metadata are ignored: parquet round-trips legitimately flip them.
    */
  private def requireSchemaMatch(
      df: DataFrame,
      expected: org.apache.spark.sql.types.StructType,
      op: String): Unit = {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.toSeq.map(f => (f.name, f.dataType))
    require(
      shape(df.schema) == shape(expected),
      s"$op: dataframe schema ${df.schema.simpleString} does not match the " +
        s"table schema ${expected.simpleString}; evolve with addColumn first " +
        "(writes never change the schema implicitly)")
  }

  /** Merge-on-read: drop the (file, row) pairs the version's deletion
    * vector names. Keys ride the parquet reader's `_metadata.file_path`
    * and `_metadata.row_index` — generated columns, no data-file bytes
    * added — and the anti-join is left to AQE (a small DV broadcasts; a
    * massive one shuffles rather than OOM the driver). No DV ⇒ the
    * plan is exactly the plain scan: zero cost on undeleted tables.
    */
  private def applyDv(
      spark: SparkSession,
      dir: String,
      base: DataFrame,
      dv: Option[String]): DataFrame = dv match {
    case None => base
    case Some(dvName) =>
      import org.apache.spark.sql.functions.col
      val dvDf = spark.read.parquet(new Path(dir, dvName).toString)
      base
        .withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(
          dvDf.select(col("file").as("__dv_file"), col("pos").as("__dv_pos")),
          Seq("__dv_file", "__dv_pos"), "left_anti")
        .drop("__dv_file", "__dv_pos")
  }

  /** Merge-on-read DELETE: publish a new version whose manifest points at
    * the SAME immutable data directory plus a deletion vector naming the
    * (file, row-index) pairs matching `pred` — no data file is rewritten,
    * the delete costs one scan + one small parquet write + one manifest
    * publish, and time travel to pre-delete versions is untouched (the
    * Delta/Iceberg merge-on-read move). Deletes COMPOSE: matches are
    * computed on the current MoR view (already-deleted rows can't
    * re-match) and the new DV is the union of the version's DV and the
    * fresh hits. Concurrency is the same OCC loop as every commit here:
    * a lost publish re-reads the log and RECOMPUTES the matches against
    * the new latest version — a racing writer's rows are never resurrected
    * and never missed. A no-match delete publishes nothing (None);
    * a lost attempt's DV directory is vacuum-able `dv_` debris.
    * Returns the published version.
    */
  def deleteWhere(
      spark: SparkSession,
      dir: String,
      pred: org.apache.spark.sql.Column,
      maxRetries: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        // a None entry here is a lost race with a concurrent idempotent
        // writer retracting its duplicate manifest — ordinary log churn,
        // re-read the log and retry (never .get-crash on it)
        case None => attempt += 1
        case Some(entry) =>
          // matches on the CURRENT MoR view, keyed by the reader's metadata
          val hits = applyDvKeyed(spark, dir, entry)
            .filter(pred)
            .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
          val prior = entry.dv.map(d => spark.read.parquet(new Path(dir, d).toString))
          val merged = prior.fold(hits)(p => p.unionByName(hits))
          if (hits.isEmpty) return None
          val dvName = s"dv_${java.util.UUID.randomUUID().toString.take(8)}"
          merged.coalesce(1).write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(dir, dvName).toString)
          if (publishManifest(f, dir, v + 1,
              Entry(entry.data, None, Some(dvName), entry.schema).serialize))
            return Some(v + 1)
          // lost the race: the new latest may have different data OR a newer
          // DV — recompute everything; this attempt's DV dir is vacuum debris
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish delete after $maxRetries attempts")
  }

  /** The MoR view with the `__dv_file`/`__dv_pos` key columns still
    * attached — [[deleteWhere]]/[[updateWhere]]/[[mergeInto]] need the
    * keys of the SURVIVORS. Declared-schema alignment applies here too:
    * a predicate over an evolved column must see it (null-filled) on
    * pre-evolution segments.
    */
  private def applyDvKeyed(
      spark: SparkSession,
      dir: String,
      entry: Entry): DataFrame = {
    import org.apache.spark.sql.functions.col
    val keyed = segmentScan(spark, dir, entry)
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    val undeleted = entry.dv match {
      case None => keyed
      case Some(dvName) =>
        keyed.join(
          spark.read.parquet(new Path(dir, dvName).toString)
            .select(col("file").as("__dv_file"), col("pos").as("__dv_pos")),
          Seq("__dv_file", "__dv_pos"), "left_anti")
    }
    alignToDeclared(undeleted, entry.schema, keep = Seq("__dv_file", "__dv_pos"))
  }

  /** APPEND: publish a new version whose manifest points at the prior
    * version's segments PLUS one new directory holding `df` — the
    * incremental-ingest write path (Delta add-file, Iceberg append):
    * cost is the new rows + one O(1) manifest publish, never a table
    * rewrite, and the prior version stays time-travelable byte-for-byte.
    * The prior deletion vector is carried — appended files have no DV
    * entries, so they are untouched by it. `df` must match the table
    * schema (appends never evolve the schema; a widening write commits
    * a full new version instead). OCC: a lost
    * publish re-reads the new latest and re-points — the already-written
    * segment is reused, no data is rewritten on retry. Many appends grow
    * the segment list; [[compactDeletes]] or any full commit collapses
    * it back to one directory (the OPTIMIZE move).
    */
  def appendRows(
      spark: SparkSession,
      dir: String,
      df: DataFrame,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    // validate BEFORE writing the segment: a mismatched append must fail
    // loudly up front, not commit and let later multi-segment reads
    // silently null-fill the divergent columns
    val declared = tableSchema(spark, dir)
    requireSchemaMatch(df, declared, "appendRows")
    val segName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    // physical names in parquet (stable across renames — see PhysicalKey)
    toPhysical(df, Some(declared)).write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(dir, segName).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir (append " +
          "needs a table; create one with commitVersion)"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer — re-read the log
        case Some(entry) =>
          if (publishManifest(f, dir, v + 1,
              Entry(s"${entry.data}+$segName", None, entry.dv, entry.schema).serialize))
            return v + 1
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish append after $maxRetries attempts")
  }

  /** Exactly-once streaming APPEND: [[appendRows]] carrying a txn id,
    * with [[commitVersionIdempotent]]'s replay check and duplicate
    * sweep — the streaming-ingest write path where the LATEST version is
    * always the whole accumulated table (one segment per micro-batch,
    * O(batch) written + O(1) published per trigger), instead of the
    * one-version-per-batch layout whose "table" is a union over
    * versions. A replayed batch's txn is already in the log → no-op
    * (None); the first batch on an empty table commits as version 0.
    *
    * Concurrency note, stronger than the full-version variant needs: a
    * duplicate txn landing at two versions retracts the higher one, but
    * an append CHAINS on the prior entry — a third writer appending
    * inside the brief pre-retract window would inherit the duplicate
    * segment permanently. The streaming-sink contract makes that window
    * unreachable: one appId+checkpoint per writing stream, and the
    * engine serializes a checkpoint's batches, so replays of a txn are
    * sequential (restart-then-rerun), never concurrent with themselves.
    * Multiple DIFFERENT apps appending the same table stay safe — their
    * txns never collide, and cross-app races are ordinary OCC retries.
    */
  def appendRowsIdempotent(
      spark: SparkSession,
      dir: String,
      df: DataFrame,
      txnId: String,
      maxRetries: Int = 10): Option[Long] = {
    require(txnId.nonEmpty, "txnId must be non-empty (an empty id would " +
      "serialize as a trailing field split() drops, silently disabling idempotence)")
    require(!txnId.contains('|'), "txnId must not contain the manifest separator '|'")
    if (committedTxns(spark, dir).contains(txnId)) return None
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    // schema gate (first batch on an empty table DEFINES the schema)
    val declared0 = if (latestVersion(spark, dir).isDefined) {
      val ts = tableSchema(spark, dir)
      requireSchemaMatch(df, ts, "appendRowsIdempotent")
      Some(ts)
    } else None
    val segName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    toPhysical(df, declared0).write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(dir, segName).toString)
    // lazily-written corrective segment for the mapped-winner case below:
    // written at most once however many OCC retries chain on it
    var physSeg: Option[String] = None
    var attempt = 0
    while (attempt < maxRetries) {
      // re-check every iteration BEFORE choosing a version (the
      // commitVersionIdempotent contract): a concurrent replay may have
      // landed without us losing a rename race
      if (committedTxns(spark, dir).contains(txnId)) return None
      val vOpt = latestVersion(spark, dir)
      val payloadOpt = vOpt match {
        case None => Some(Entry(segName, Some(txnId), None))
        case Some(v) =>
          // a None entry = lost race with a retracting writer: retry
          manifestEntry(f, dir, v).map { e =>
            // re-gate EVERY attempt that chains on an entry: two
            // initializing writers with divergent schemas both pass the
            // empty-table gate above, and the v0-race loser would
            // otherwise chain its divergent segment at v1 — exactly the
            // silent null-fill corruption the gate exists to prevent.
            // Fail loudly; the orphan segment is vacuum debris.
            requireSchemaMatch(
              df, e.schema.getOrElse(segmentScan(spark, dir, e).schema),
              "appendRowsIdempotent")
            // the schema gate above is shape-only (names/types — metadata-
            // insensitive by design), so it ALSO passes when we wrote our
            // segment on the empty-table path (raw logical column names)
            // but the v0 race was lost to a table whose declared schema
            // carries a COLUMN MAPPING: chaining the logically-named
            // segment would then store bytes reads never resolve (they
            // look up physical names) — silent null-fill. Re-write the
            // rows under the winner's physical names once and chain THAT
            // segment; the logical-named original is vacuum debris.
            val mapped = declared0.isEmpty &&
              e.schema.exists(st => st.fields.exists(fl => physicalName(fl) != fl.name))
            val seg = if (!mapped) segName else physSeg.getOrElse {
              val s2 = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
              toPhysical(df, e.schema).write.mode(SaveMode.ErrorIfExists)
                .parquet(new Path(dir, s2).toString)
              physSeg = Some(s2)
              s2
            }
            Entry(s"${e.data}+$seg", Some(txnId), e.dv, e.schema)
          }
      }
      payloadOpt match {
        case None => attempt += 1
        case Some(payload) =>
          val next = vOpt.map(_ + 1).getOrElse(0L)
          if (publishManifest(f, dir, next, payload.serialize)) {
            val dup = versions(spark, dir)
              .filter(w => w != next && readManifestOpt(f, dir, w).exists(_.txn.contains(txnId)))
            if (dup.exists(_ < next)) {
              // before retracting our duplicate, prove nobody CHAINED on it:
              // an append entry inherits the prior entry's segment list, so a
              // third writer publishing next+1 on top of us would keep our
              // (duplicate) segment alive after the retract — permanent
              // double rows. Unreachable under the sink contract (one
              // appId+checkpoint per stream serializes a txn's replays), so
              // reaching it means the contract was violated: fail LOUDLY
              // instead of silently duplicating.
              if (versions(spark, dir).max > next)
                throw new IllegalStateException(
                  s"txn $txnId committed twice (v${dup.min} and v$next) AND a later " +
                    "writer chained on the duplicate — the one-writer-per-txn sink " +
                    "contract was violated; the table needs manual repair")
              f.delete(new Path(manifestDir(dir), next.toString), false)
              // the pre-retract check is check-THEN-delete: an out-of-contract
              // writer can read our duplicate as latest in between and publish
              // next+1 inheriting its segment. Re-verify AFTER the retract —
              // inheritance is detectable (the chained entry carries segName),
              // so the guard is a verified barrier, not best-effort narrowing.
              // our segment as actually chained (the corrective physical
              // rewrite above may have swapped segName for physSeg)
              val ourSeg = payload.segments.last
              val inherited = versions(spark, dir)
                .filter(_ > next)
                .filter(w => readManifestOpt(f, dir, w).exists(_.segments.contains(ourSeg)))
              if (inherited.nonEmpty)
                throw new IllegalStateException(
                  s"txn $txnId: version(s) ${inherited.mkString(",")} chained on the " +
                    s"retracted duplicate v$next (segment $ourSeg) — the " +
                    "one-writer-per-txn sink contract was violated; the table " +
                    "needs manual repair")
              return None
            }
            return Some(next)
          }
          attempt += 1
      }
    }
    throw new IllegalStateException(
      s"could not publish idempotent append for txn $txnId after $maxRetries attempts")
  }

  /** Merge-on-read UPDATE: rows matching `pred` are dropped from the
    * existing segments via the deletion vector and re-appear REWRITTEN
    * (each `sets` column expression evaluated over the old row) in one
    * new segment — published as ONE version, so the update is atomic:
    * no reader ever sees the delete without the insert. This is the
    * missing third write-path primitive next to [[deleteWhere]] and
    * [[appendRows]] (Delta UPDATE with DVs does exactly this dance);
    * cost = one MoR scan + the matched rows rewritten + one O(1)
    * publish — untouched rows are never copied. Matches are computed on
    * the current MoR view, so updates compose with prior deletes and
    * updates; a lost OCC publish RECOMPUTES against the new latest (the
    * stale attempt's segment + DV become vacuum-able debris). A
    * no-match update publishes nothing (None). A SET naming a NEW column
    * EVOLVES the schema (declared-schema entry; old segments read the
    * column as null; time travel keeps the old shape) — see [[addColumn]]
    * for the metadata-only evolve.
    */
  def updateWhere(
      spark: SparkSession,
      dir: String,
      pred: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      maxRetries: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.col
    require(sets.nonEmpty, "updateWhere needs at least one SET column")
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          // matched rows of the CURRENT MoR view, with their (file, pos) keys;
          // materialized once — the frame feeds BOTH the DV union and the
          // rewritten segment, and the two consumers must see the same rows
          val hits = applyDvKeyed(spark, dir, entry)
            .filter(pred)
            .localCheckpoint(true)
          if (hits.isEmpty) return None
          val prior = entry.dv.map(d => spark.read.parquet(new Path(dir, d).toString))
          val newKeys = hits.select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
          val merged = prior.fold(newKeys)(p => p.unionByName(newKeys))
          val dvName = s"dv_${java.util.UUID.randomUUID().toString.take(8)}"
          merged.coalesce(1).write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(dir, dvName).toString)
          val bare = hits.drop("__dv_file", "__dv_pos")
          // SET of a NEW column is schema evolution: the version's entry
          // gains a declared schema (old columns + the new ones, nullable),
          // UNMATCHED rows in old segments read the new column as null, and
          // time travel below this version keeps the old shape — the
          // UPDATE-with-evolution move (Delta's automatic schema evolution)
          val rewritten = sets.foldLeft(bare) {
            case (acc, (name, setCol)) => acc.withColumn(name, setCol)
          }
          val newNames = sets.map(_._1).distinct.filterNot(bare.columns.contains)
          val curFields = entry.schema.map(_.fields.toSeq).getOrElse(bare.schema.fields.toSeq)
          val newSchema: Option[org.apache.spark.sql.types.StructType] =
            if (newNames.isEmpty) entry.schema
            else Some(org.apache.spark.sql.types.StructType(
              curFields ++ newNames.map(n => withPhysical(
                org.apache.spark.sql.types.StructField(
                  n, rewritten.schema(n).dataType, nullable = true),
                freshPhysical(n, org.apache.spark.sql.types.StructType(curFields))))))
          val segName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
          toPhysical(rewritten, newSchema).write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(dir, segName).toString)
          if (publishManifest(f, dir, v + 1,
              Entry(s"${entry.data}+$segName", None, Some(dvName), newSchema).serialize))
            return Some(v + 1)
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish update after $maxRetries attempts")
  }

  /** Schema evolution, the metadata-only half: publish a new version with
    * the SAME data and DV whose declared schema gains `name` (nullable,
    * appended last — parquet-compatible widening only). Cost is ONE
    * manifest file — no data is read or written, which is what makes
    * evolution viable on a million-file table. Readers of the new version
    * see the column as null until a write fills it; time travel below
    * this version keeps the old shape; [[appendRows]] after the evolve
    * requires the evolved shape (the append carries the column).
    * Rejects duplicate names loudly. Same OCC loop as every commit.
    */
  def addColumn(
      spark: SparkSession,
      dir: String,
      name: String,
      dataType: org.apache.spark.sql.types.DataType,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          val cur = entry.schema.getOrElse(segmentScan(spark, dir, entry).schema)
          require(!cur.fieldNames.contains(name),
            s"addColumn: column '$name' already exists in ${cur.simpleString}")
          // fresh physical name when the logical one collides with an
          // existing physical (rename/drop history) — see [[PhysicalKey]]
          val evolved = org.apache.spark.sql.types.StructType(
            cur.fields :+ withPhysical(
              org.apache.spark.sql.types.StructField(name, dataType, nullable = true),
              freshPhysical(name, cur)))
          if (publishManifest(f, dir, v + 1,
              Entry(entry.data, None, entry.dv, Some(evolved)).serialize))
            return v + 1
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish addColumn after $maxRetries attempts")
  }

  /** Rename a column — metadata-only via COLUMN MAPPING: the declared
    * field keeps its PHYSICAL name (pinned into the field metadata the
    * first time a rename touches it) and only the logical name changes,
    * so the publish is ONE manifest file on a table of any size. Reads
    * map physical→logical per segment ([[alignToDeclared]]); writes map
    * back ([[toPhysical]]); time travel below this version keeps the old
    * name. Same OCC loop as every commit.
    */
  def renameColumn(
      spark: SparkSession,
      dir: String,
      from: String,
      to: String,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          val cur = entry.schema.getOrElse(segmentScan(spark, dir, entry).schema)
          require(cur.fieldNames.contains(from),
            s"renameColumn: no column '$from' in ${cur.simpleString}")
          require(!cur.fieldNames.contains(to),
            s"renameColumn: column '$to' already exists in ${cur.simpleString}")
          val evolved = org.apache.spark.sql.types.StructType(cur.fields.map { fld =>
            if (fld.name == from)
              withPhysical(fld.copy(name = to), physicalName(fld))
            else fld
          })
          if (publishManifest(f, dir, v + 1,
              Entry(entry.data, None, entry.dv, Some(evolved)).serialize))
            return v + 1
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish rename after $maxRetries attempts")
  }

  /** The metadata-only type promotions [[widenColumn]] admits — exactly
    * the set the Spark 4 vectorized parquet reader up-converts at scan
    * time (the type-widening promotions), so old segments never need a
    * rewrite: integral up-chain (byte→short→int→long), any integral or
    * float→double, float→double, and decimal precision-up AT THE SAME
    * SCALE (a scale change rescales stored values — that is a rewrite,
    * not a widening). Everything else (string↔numeric, long→int, …) is
    * refused: narrowing loses data and cross-family casts change bytes'
    * meaning — callers rewrite through a full commit instead.
    */
  private[io] def isWidening(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val rank = Map[DataType, Int](ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    (from, to) match {
      case (f, t) if rank.contains(f) && rank.contains(t) => rank(t) > rank(f)
      case (f, DoubleType) if rank.contains(f) || f == FloatType => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  /** Widen a column's type — metadata-only (ONE manifest publish on a
    * table of any size, like [[renameColumn]]): the declared field's type
    * becomes `to`, old segments keep their narrower bytes and the scan
    * up-converts them ([[segmentReader]] requests the declared type; the
    * parquet reader's widening promotions do the rest — no cast bolted
    * above the scan, so filters on the column still push down). Only
    * [[isWidening]] promotions are admitted; [[requireSchemaMatch]] stays
    * strict, so post-widen appends must carry the WIDE type (narrow
    * frames fail loudly — implicit re-narrowing is how silent truncation
    * happens). Time travel below this version keeps the narrow type.
    * Same OCC loop as every commit.
    */
  def widenColumn(
      spark: SparkSession,
      dir: String,
      name: String,
      to: org.apache.spark.sql.types.DataType,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          val cur = entry.schema.getOrElse(segmentScan(spark, dir, entry).schema)
          val idx = cur.fieldNames.indexOf(name)
          require(idx >= 0, s"widenColumn: no column '$name' in ${cur.simpleString}")
          val from = cur.fields(idx).dataType
          require(isWidening(from, to),
            s"widenColumn: ${from.simpleString} -> ${to.simpleString} is not a " +
              "widening promotion (narrowing/cross-family changes need a rewrite " +
              "through a full commitVersion)")
          val evolved = org.apache.spark.sql.types.StructType(cur.fields.map { fld =>
            if (fld.name == name) fld.copy(dataType = to) else fld
          })
          if (publishManifest(f, dir, v + 1,
              Entry(entry.data, None, entry.dv, Some(evolved)).serialize))
            return v + 1
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish widenColumn after $maxRetries attempts")
  }

  /** Drop a column — metadata-only: the declared schema loses the field;
    * its physical bytes stay in the old segments as ignored columns (the
    * merge-on-read trade every column-mapping format makes — a rewrite
    * reclaims the space, never required for correctness). A column later
    * re-added under the dropped name gets a FRESH physical name
    * ([[freshPhysical]]), so the stale bytes can never resurface. At
    * least one column must remain. Time travel below this version still
    * reads the dropped column.
    */
  def dropColumn(
      spark: SparkSession,
      dir: String,
      name: String,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          val cur = entry.schema.getOrElse(segmentScan(spark, dir, entry).schema)
          require(cur.fieldNames.contains(name),
            s"dropColumn: no column '$name' in ${cur.simpleString}")
          require(cur.fields.length > 1,
            s"dropColumn: cannot drop the last column '$name'")
          // pin every SURVIVING field's physical name: from here on the
          // table has rename/drop history, and [[freshPhysical]] guards
          // re-adds against collision with any CURRENT physical — pinning
          // keeps the invariant that a declared field's bytes are always
          // found under its recorded physical name, whatever happened first
          val evolved = org.apache.spark.sql.types.StructType(
            cur.fields.filterNot(_.name == name)
              .map(fld => withPhysical(fld, physicalName(fld), force = true)))
          if (publishManifest(f, dir, v + 1,
              Entry(entry.data, None, entry.dv, Some(evolved)).serialize))
            return v + 1
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish dropColumn after $maxRetries attempts")
  }

  /** MERGE INTO — the atomic upsert write path (Delta MERGE with DVs does
    * exactly this dance): `source` rows are matched to the current MoR
    * view on `keyCols`; matched target rows are dropped via the deletion
    * vector and REPLACED by their source row in one new segment,
    * unmatched source rows are inserted into the same segment, and rows
    * where `deleteWhen` holds (evaluated over the source row) delete
    * their matched target and are not inserted — ALL published as ONE
    * version, so no reader ever sees a half-applied merge. Cost: one MoR
    * scan + one keyed join + the source rows written + one O(1) publish;
    * unmatched TARGET rows are never copied. The classification logic is
    * the snapshot-table twin of [[graft.ops.Cdc.applyUpserts]] (kept /
    * updated / inserted), executed as a write instead of a projection.
    *
    * Contracts: `source` must carry exactly the table schema (evolve
    * first with [[addColumn]]); at most ONE source row per key (checked —
    * two updates racing to the same key in one batch is the ambiguity
    * every MERGE rejects); an effect-free merge publishes nothing (None).
    * `txnId` upgrades a streaming `foreachBatch` caller to exactly-once:
    * a replayed batch's id is already in the log → no-op, with the same
    * lowest-version-wins duplicate sweep (and loud chained-duplicate
    * check) as [[appendRowsIdempotent]]. OCC: a lost publish recomputes
    * the match against the new latest — the insert segment is reused
    * (it depends only on `source`), the stale DV is vacuum debris.
    */
  def mergeInto(
      spark: SparkSession,
      dir: String,
      source: DataFrame,
      keyCols: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      txnId: Option[String] = None,
      maxRetries: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    txnId.foreach { t =>
      require(t.nonEmpty, "txnId must be non-empty")
      require(!t.contains('|'), "txnId must not contain the manifest separator '|'")
    }
    val f = fs(spark, dir)
    if (txnId.exists(committedTxns(spark, dir).contains)) return None
    val declared0 = tableSchema(spark, dir)
    requireSchemaMatch(source, declared0, "mergeInto")
    keyCols.foreach(k => require(source.columns.contains(k),
      s"mergeInto: key column '$k' is not in the source schema"))
    // one source row per key — the "multiple source rows matched" ambiguity
    // every MERGE implementation rejects. One aggregation over the source.
    val dupKey = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
    require(dupKey.isEmpty,
      s"mergeInto: source has multiple rows for the same (${keyCols.mkString(", ")}) key")
    // rows the merge WRITES (update images + inserts) depend only on the
    // source — write the segment once, reuse it across OCC retries
    val toWrite = deleteWhen.fold(source)(c => source.filter(!coalesce(c, lit(false))))
    val hasInserts = !toWrite.isEmpty
    val segName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    if (hasInserts)
      toPhysical(toWrite, Some(declared0)).write.mode(SaveMode.ErrorIfExists)
        .parquet(new Path(dir, segName).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      if (txnId.exists(committedTxns(spark, dir).contains)) return None
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          // every matched target row is DV-dropped (its replacement — or
          // nothing, for deleteWhen rows — lives in the new segment)
          val hits = applyDvKeyed(spark, dir, entry)
            .join(source.select(keyCols.map(col): _*), keyCols, "inner")
            .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
            .localCheckpoint(true)
          val hasMatches = !hits.isEmpty
          if (!hasMatches && !hasInserts) return None
          val dvOpt =
            if (!hasMatches) entry.dv
            else {
              val prior = entry.dv.map(d => spark.read.parquet(new Path(dir, d).toString))
              val dvName = s"dv_${java.util.UUID.randomUUID().toString.take(8)}"
              prior.fold(hits.toDF())(p => p.unionByName(hits))
                .coalesce(1).write.mode(SaveMode.ErrorIfExists)
                .parquet(new Path(dir, dvName).toString)
              Some(dvName)
            }
          val data = if (hasInserts) s"${entry.data}+$segName" else entry.data
          val next = v + 1
          if (publishManifest(f, dir, next,
              Entry(data, txnId, dvOpt, entry.schema).serialize)) {
            txnId.foreach { t =>
              val dup = versions(spark, dir)
                .filter(w => w != next && readManifestOpt(f, dir, w).exists(_.txn.contains(t)))
              if (dup.exists(_ < next)) {
                // same chained-duplicate guard as appendRowsIdempotent: a
                // writer stacked on our duplicate inherits its segment/DV
                if (versions(spark, dir).max > next)
                  throw new IllegalStateException(
                    s"txn $t merged twice (v${dup.min} and v$next) AND a later writer " +
                      "chained on the duplicate — the one-writer-per-txn sink contract " +
                      "was violated; the table needs manual repair")
                f.delete(new Path(manifestDir(dir), next.toString), false)
                // post-retract re-verify (the appendRowsIdempotent barrier):
                // an out-of-contract writer reading our duplicate as latest in
                // the check→delete window inherits our segment or our fresh DV
                val inherited = versions(spark, dir)
                  .filter(_ > next)
                  .filter(w => readManifestOpt(f, dir, w).exists(e =>
                    (hasInserts && e.segments.contains(segName)) ||
                      (hasMatches && e.dv == dvOpt)))
                if (inherited.nonEmpty)
                  throw new IllegalStateException(
                    s"txn $t: version(s) ${inherited.mkString(",")} chained on the " +
                      s"retracted duplicate v$next — the one-writer-per-txn sink " +
                      "contract was violated; the table needs manual repair")
                return None
              }
            }
            return Some(next)
          }
          attempt += 1
      }
    }
    throw new IllegalStateException(s"could not publish merge after $maxRetries attempts")
  }

  /** RESTORE: publish a NEW version whose manifest points at version
    * `v`'s data directory and deletion vector — the constant-time
    * rollback every table format ships (Delta RESTORE, Iceberg
    * rollback). Nothing is copied or rewritten; history stays intact
    * (the rolled-back versions remain time-travelable, and the restore
    * itself is one more log entry, so a rollback can be rolled back).
    * The txn id is deliberately NOT carried over: replay idempotence
    * belongs to the original commit, and a restore re-claiming it would
    * make the original stream skip a genuinely new batch. Same OCC
    * publish loop as every commit. Returns the new version number.
    */
  def rollbackTo(spark: SparkSession, dir: String, v: Long, maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    val entry = manifestEntry(f, dir, v)
    require(entry.isDefined, s"version $v is not published in $dir")
    var attempt = 0
    while (attempt < maxRetries) {
      val next = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
      // the restored version's DECLARED SCHEMA travels with its data: a
      // rollback across an evolution restores the pre-evolution shape
      if (publishManifest(f, dir, next,
          Entry(entry.get.data, None, entry.get.dv, entry.get.schema).serialize))
        return next
      attempt += 1
    }
    throw new IllegalStateException(s"could not publish rollback after $maxRetries attempts")
  }

  /** Materialize the latest version's deletion vector: rewrite the MoR
    * view as a plain new data directory and publish it with no DV — the
    * OPTIMIZE step that caps read amplification after many deletes. The
    * old data+DV versions stay time-travelable until [[vacuum]]. No-op
    * (None) when the latest version carries no DV.
    */
  def compactDeletes(spark: SparkSession, dir: String, maxRetries: Int = 10): Option[Long] = {
    val f = fs(spark, dir)
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no published versions in $dir"))
    if (manifestEntry(f, dir, v).get.dv.isEmpty) return None
    Some(commitVersion(spark, readVersion(spark, dir, v), dir, maxRetries))
  }

  /** A segment's live data bytes: the visible part files directly in the
    * segment directory (the `_stats` sidecar and `_SUCCESS` markers are
    * excluded — they are metadata, not row payload). One listing per
    * segment — planning-time metadata, same class as the manifest read.
    */
  private def segmentBytes(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      segName: String): Long =
    f.listStatus(new Path(dir, segName))
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getLen).sum

  /** Number of data segments the LATEST version unions — the
    * fragmentation metric a caller (or a maintenance loop) checks to
    * decide when to [[compactSegments]]. One manifest read.
    */
  def segmentCount(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    // a None entry = the latest manifest was retracted by a racing
    // idempotent writer between the listing and the open — the same
    // benign log churn tableSchema retries on. Mapping it to 0 would
    // tell a maintenance loop the table has no fragmentation and skip a
    // needed compaction that cycle; retry on the fresh listing instead.
    var attempt = 0
    while (attempt < 10) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case Some(entry) => return entry.segments.size
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"could not resolve the latest manifest in $dir after 10 attempts")
  }

  /** Incremental bin-pack OPTIMIZE — the small-file compaction every
    * streaming-ingested table needs within its first week: each
    * micro-batch append leaves one segment, so after a 300-batch soak the
    * manifest's data field is a 300-way '+'-list and every read unions
    * 300 parquet directories. [[compactDeletes]]/[[commitVersion]] can
    * collapse that, but at O(table) — they rewrite EVERYTHING. This
    * rewrites ONLY the segments whose live bytes are below `targetBytes`
    * (Delta OPTIMIZE's bin-packing contract): their DV-surviving rows
    * land in ONE packed segment (sized to ~targetBytes files), segments
    * already at weight are carried by POINTER, and the result is ONE
    * publish. Cost: O(small-file bytes) read+written + O(1) publish —
    * independent of the table's total size.
    *
    * Deletion vectors compose: the packed segment materializes its
    * sources' survivors (their DV entries are consumed), and the new
    * version's DV keeps exactly the entries naming kept segments' files —
    * rebasing, not dropping, deletes. Time travel is untouched (old
    * versions still reference the small segments; [[vacuum]] reaps them
    * only once no manifest or checkpoint does). Declared-schema versions
    * pack through the same alignment as any read, so a packed segment
    * carries the evolved shape. OCC: a lost publish recomputes against
    * the new latest (a racing append's fresh segment joins the next
    * compaction); the stale packed dir is vacuum debris.
    *
    * No-op (None) when fewer than two segments qualify — packing one
    * segment would rewrite bytes for zero file-count gain.
    */
  def compactSegments(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      maxRetries: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no published versions in $dir"))
      manifestEntry(f, dir, v) match {
        case None => attempt += 1 // lost race with a retracting writer
        case Some(entry) =>
          val sized = entry.segments.map(dn => dn -> segmentBytes(f, dir, dn))
          val small = sized.filter(_._2 < targetBytes)
          if (small.size < 2) return None
          val kept = entry.segments.filterNot(small.map(_._1).toSet)
          // the small segments' DV-surviving rows, aligned to the declared
          // schema (a packed segment must carry the evolved shape)
          val smallScan = segmentReader(spark, entry.schema)
            .parquet(small.map(s => new Path(dir, s._1).toString): _*)
          val survivors = alignToDeclared(
            applyDv(spark, dir, smallScan, entry.dv), entry.schema)
          val files = math.max(1L, (small.map(_._2).sum + targetBytes - 1) / targetBytes)
          val segName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
          toPhysical(survivors.coalesce(files.toInt), entry.schema)
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(dir, segName).toString)
          // rebase the DV onto the kept segments: packed rows already
          // materialized their deletes, so entries naming a compacted
          // file must not survive (they would be dangling paths)
          val dvOpt = entry.dv.flatMap { d =>
            val keptPred = kept
              .map(s => col("file").contains(s"/$s/"))
              .reduceOption(_ || _)
              .getOrElse(org.apache.spark.sql.functions.lit(false))
            val remaining = spark.read.parquet(new Path(dir, d).toString).filter(keptPred)
            if (remaining.isEmpty) None
            else {
              val dvName = s"dv_${java.util.UUID.randomUUID().toString.take(8)}"
              remaining.coalesce(1).write.mode(SaveMode.ErrorIfExists)
                .parquet(new Path(dir, dvName).toString)
              Some(dvName)
            }
          }
          if (publishManifest(f, dir, v + 1,
              Entry((kept :+ segName).mkString("+"), None, dvOpt, entry.schema).serialize))
            return Some(v + 1)
          attempt += 1 // lost the race: recompute; this packed dir is vacuum debris
      }
    }
    throw new IllegalStateException(s"could not publish compaction after $maxRetries attempts")
  }

  /** Z-order OPTIMIZE: rewrite the latest version clustered by the Morton
    * interleave of `cols` and commit it (with a stats sidecar on those
    * same columns) as a NEW version — the multi-dimensional sibling of
    * [[Compaction.writeClustered]]. Lexicographic range clustering on
    * (a, b) leaves b's per-file min/max spanning the whole domain, so
    * [[readVersionPruned]] can skip on a but never on b; the Z-layout
    * keeps every dimension's span ~n^(1/d) of the domain, so a k-dim box
    * predicate prunes on all k at once — ZorderSpec asserts the file
    * count strictly drops vs a scattered layout on the same box. The
    * rewrite is one scan + one range exchange; old versions stay
    * readable (time travel is untouched) until [[vacuum]] reaps their
    * data. The min/max collect is ONE planning-time row, same class as
    * the pruned-file list. Numeric (long-castable) columns only.
    *
    * Requires a non-empty table with at least one non-null value in
    * every z column (fails fast with a named message otherwise — the
    * min/max anchor is undefined). Rows with a NULL in any z column get
    * a null z-value and cluster together at the null end of the range
    * order; they are kept in the rewrite, never dropped.
    */
  def optimizeZorder(
      spark: SparkSession,
      dir: String,
      cols: Seq[String],
      files: Int,
      bits: Int = 16,
      maxRetries: Int = 10): Long = {
    import org.apache.spark.sql.functions.{col, max, min}
    require(cols.nonEmpty, "z-order needs at least one column")
    val cur = read(spark, dir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"lo_$c"), max(col(c).cast("long")).as(s"hi_$c")))
    val mm = cur.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.foreach { case (c, j) =>
      require(
        !mm.isNullAt(2 * j) && !mm.isNullAt(2 * j + 1),
        s"optimizeZorder($dir): z column '$c' has no non-null values " +
          "(empty table or all-null column) — min/max anchor undefined")
    }
    val qcols = cols.zipWithIndex.map { case (c, j) =>
      Compaction.quantize(col(c).cast("long"), mm.getLong(2 * j), mm.getLong(2 * j + 1), bits)
    }
    val clustered = cur
      .withColumn("__z", Compaction.zValue(qcols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z") // projection after the sort: intra-partition order kept
    commitVersionWithStats(spark, clustered, dir, cols, maxRetries)
  }
}
