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
  *     created, and creation is ATOMIC (FileSystem.create with
  *     overwrite=false) — a crashed writer leaves invisible data files,
  *     never a half-published table;
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

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  /** All published versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else
      f.listStatus(md)
        .map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption)
        .sorted
        .toSeq
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
    * file, then atomically rename it to `_manifests/v`. Rename-no-
    * overwrite is the atomic check-and-publish (HDFS and local fs fail a
    * rename onto an existing file); a manifest is therefore either absent
    * or complete — never visible with partial content, even if the writer
    * dies mid-write (the orphan is a dot-file the version listing
    * ignores). Returns false iff another writer owns this version number.
    * (On object stores without atomic rename — raw S3 — this layer needs
    * the same external commit coordinator every table format needs there.)
    */
  private[io] def publishManifest(
      f: org.apache.hadoop.fs.FileSystem,
      dir: String,
      v: Long,
      dataName: String): Boolean = {
    val target = new Path(manifestDir(dir), v.toString)
    if (f.exists(target)) return false
    val tmp = new Path(manifestDir(dir), s".tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.writeUTF(dataName)
    finally out.close()
    val won = f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  def commitVersion(spark: SparkSession, df: DataFrame, dir: String, maxRetries: Int = 10): Long = {
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val dataName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dataName).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
      // only a LOST RACE retries (publishManifest returned false after a
      // clean temp write); real IO failures propagate with their cause
      if (publishManifest(f, dir, v, dataName)) return v
      attempt += 1
    }
    throw new IllegalStateException(s"could not publish a version after $maxRetries attempts")
  }

  /** Transaction ids already committed to this table (the second field
    * of each manifest, when present). What makes at-least-once streaming
    * replays exactly-once: a replayed micro-batch's txn id is already in
    * the log, so its commit is a no-op.
    */
  def committedTxns(spark: SparkSession, dir: String): Set[Long] = {
    val f = fs(spark, dir)
    versions(spark, dir).flatMap { v =>
      val in = f.open(new Path(manifestDir(dir), v.toString))
      val content =
        try in.readUTF()
        finally in.close()
      content.split('|') match {
        case Array(_, txn) => scala.util.Try(txn.toLong).toOption
        case _ => None
      }
    }.toSet
  }

  /** Idempotent commit for streaming `foreachBatch`: publishes `df` as a
    * new version carrying `txnId`, or does nothing (returns None) if a
    * version with this txnId is already in the log — the micro-batch was
    * already committed before a restart/replay. Spark's foreachBatch is
    * at-least-once; this check is what upgrades the sink to
    * exactly-once, the same move every lakehouse streaming sink makes.
    */
  def commitVersionIdempotent(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      txnId: Long,
      maxRetries: Int = 10): Option[Long] = {
    if (committedTxns(spark, dir).contains(txnId)) return None
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val dataName = s"data_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dataName).toString)
    var attempt = 0
    while (attempt < maxRetries) {
      val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
      if (publishManifest(f, dir, v, s"$dataName|$txnId")) return Some(v)
      // lost a race: someone else published — they may have been a replay
      // of the SAME txn (two executors of one restart); re-check
      if (committedTxns(spark, dir).contains(txnId)) return None
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
    after.exceptAll(before).withColumn("_change", org.apache.spark.sql.functions.lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change", org.apache.spark.sql.functions.lit("delete")))
  }

  /** Delete data directories no manifest references (crashed or
    * race-losing writers) and return their names. Never touches a
    * referenced version — history stays fully time-travelable. The whole
    * operation is one listing diff against the manifest log.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val referenced = versions(spark, dir).map { v =>
      val in = f.open(new Path(manifestDir(dir), v.toString))
      try in.readUTF().split('|').head
      finally in.close()
    }.toSet
    val orphans = f.listStatus(new Path(dir))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("data_") && !referenced(n))
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
    * manifest's data-directory pointer.
    */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val f = fs(spark, dir)
    val mf = new Path(manifestDir(dir), v.toString)
    require(f.exists(mf), s"version $v is not published in $dir")
    val in = f.open(mf)
    val content =
      try in.readUTF()
      finally in.close()
    // content = dataDir, optionally "|txnId" for streaming commits
    spark.read.parquet(new Path(dir, content.split('|').head).toString)
  }
}
