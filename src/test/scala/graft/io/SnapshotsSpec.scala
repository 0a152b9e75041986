package graft.io

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** The ACID-ish contract of the manifest-log snapshot table:
  * atomic publish, snapshot isolation, time travel, crash invisibility,
  * optimistic-concurrency retry.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("versions publish atomically, time-travel reads see each snapshot") {
    val dir = Files.createTempDirectory("snap").toString
    assert(Snapshots.versions(spark, dir).isEmpty)

    val v0 = Snapshots.commitVersion(spark, Seq(1L, 2L, 3L).toDF("x"), dir)
    val v1 = Snapshots.commitVersion(spark, Seq(10L, 20L).toDF("x"), dir)
    assert(v0 == 0L && v1 == 1L)
    assert(Snapshots.versions(spark, dir) == Seq(0L, 1L))

    // latest == v1; time travel to v0 still sees the original rows
    assert(Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    assert(Snapshots.readVersion(spark, dir, 0L).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("unpublished data is invisible: a crashed writer leaves no trace") {
    val dir = Files.createTempDirectory("snap_crash").toString
    Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)
    // simulate a writer that died after writing data but before publishing
    Seq(99L, 98L).toDF("x").write.parquet(s"$dir/data_deadbeef")
    assert(Snapshots.versions(spark, dir) == Seq(0L))
    assert(Snapshots.read(spark, dir).as[Long].collect().toSeq == Seq(1L))
  }

  test("a snapshot read keeps working while new versions land") {
    val dir = Files.createTempDirectory("snap_iso").toString
    Snapshots.commitVersion(spark, Seq(1L, 2L).toDF("x"), dir)
    val pinned = Snapshots.read(spark, dir) // resolves to v0's files
    Snapshots.commitVersion(spark, Seq(3L).toDF("x"), dir)
    // the pinned plan still reads v0's immutable directory
    assert(pinned.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.read(spark, dir).as[Long].collect().toSeq == Seq(3L))
  }

  test("CDC upserts maintain the table incrementally with full history") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("snap_cdc").toString
    Snapshots.commitVersion(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val updates = Seq((2L, "B"), (3L, "c")).toDF("uid", "uv")
    val merged = graft.ops.Cdc
      .applyUpserts(
        Snapshots.read(spark, dir), updates, "id", "uid",
        Seq(("v", col("v"), col("uv"))))
      .select(col("__key").as("id"), col("v"))
    val v1 = Snapshots.commitVersion(spark, merged, dir)
    assert(v1 == 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().sorted.toSeq
    // v0 history intact; latest is the merged state
    assert(rows(Snapshots.readVersion(spark, dir, 0L)) == Seq(1L -> "a", 2L -> "b"))
    assert(rows(Snapshots.read(spark, dir)) == Seq(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("optimistic concurrency: losing the publish race is detected and retried") {
    val dir = Files.createTempDirectory("snap_occ").toString
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)
    // collision detection itself: first publish of v=1 wins, a second
    // attempt at the SAME number (the stolen-version case, deterministic)
    // must report a lost race, not corrupt the winner
    assert(Snapshots.publishManifest(f, dir, 1L, "data_winner"))
    assert(!Snapshots.publishManifest(f, dir, 1L, "data_loser"))
    // the loop recomputes the log and lands after the stolen number
    Seq(7L).toDF("x").write.parquet(s"$dir/data_seven")
    assert(!Snapshots.publishManifest(f, dir, 1L, "data_seven"))
    val v = Snapshots.commitVersion(spark, Seq(7L).toDF("x"), dir)
    assert(v == 2L, "loser must land at the next version number")
    assert(Snapshots.read(spark, dir).as[Long].collect().toSeq == Seq(7L))
    // no temp litter left behind from the lost race
    assert(!f.listStatus(new Path(s"$dir/_manifests"))
      .exists(_.getPath.getName.startsWith(".tmp_")))
  }

  test("change data feed: version diff surfaces inserts and deletes") {
    val dir = Files.createTempDirectory("snap_cdf").toString
    Snapshots.commitVersion(spark, Seq(1L, 2L, 2L).toDF("x"), dir)
    Snapshots.commitVersion(spark, Seq(2L, 3L).toDF("x"), dir)
    val ch = Snapshots.changes(spark, dir, 0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // one of the duplicate 2s went away (multiset semantics), 1 deleted, 3 inserted
    assert(ch == Seq(1L -> "delete", 2L -> "delete", 3L -> "insert"))
  }

  test("aggregate maintained by CDF deltas == full recompute on the new version") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("snap_ivm").toString
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    Snapshots.commitVersion(spark, docs.filter(col("doc_id") % 4 =!= 0), dir)
    Snapshots.commitVersion(spark, docs.filter(col("doc_id") % 3 =!= 0), dir)
    def fullAgg(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Incremental.mergeStates(
        graft.ops.Incremental.partialStates(df.withColumn("b", lit(0)), Seq("source"), "b", "n_chars"),
        Seq("source"))
    val maintained = graft.ops.Incremental.applyDelta(
      fullAgg(Snapshots.readVersion(spark, dir, 0L)),
      Snapshots.changes(spark, dir, 0L, 1L).select("source", "n_chars", "_change"),
      Seq("source"), "n_chars")
    val recomputed = fullAgg(Snapshots.readVersion(spark, dir, 1L))
    val a = maintained.collect().map(_.toString).sorted.toSeq
    val b = recomputed.collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("vacuum removes only unreferenced data dirs; history stays readable") {
    val dir = Files.createTempDirectory("snap_vac").toString
    Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)
    Snapshots.commitVersion(spark, Seq(2L).toDF("x"), dir)
    // a crashed writer's orphaned data
    Seq(99L).toDF("x").write.parquet(s"$dir/data_orphan1")
    // default retention window protects a possibly-in-flight writer...
    assert(Snapshots.vacuum(spark, dir).isEmpty)
    // ...and minAgeMs=0 reclaims it once the window is waived
    val removed = Snapshots.vacuum(spark, dir, minAgeMs = 0L)
    assert(removed == Seq("data_orphan1"))
    assert(rowsOf(Snapshots.readVersion(spark, dir, 0L)) == Seq(1L))
    assert(rowsOf(Snapshots.readVersion(spark, dir, 1L)) == Seq(2L))
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0L).isEmpty)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.as[Long].collect().sorted.toSeq

  test("two writers committing concurrently both land, on distinct versions") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("snap_race").toString
    val vs = Await.result(
      Future.sequence(Seq(
        Future(Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)),
        Future(Snapshots.commitVersion(spark, Seq(2L).toDF("x"), dir)))),
      2.minutes)
    assert(vs.toSet.size == 2, s"writers must get distinct versions, got $vs")
    // both versions resolve to their own intact data
    val seen = vs.sorted.map(v =>
      Snapshots.readVersion(spark, dir, v).as[Long].collect().toSeq)
    assert(seen.flatten.toSet == Set(1L, 2L))
  }

  test("publish is atomic no-overwrite on local fs: N racers, one winner, content intact") {
    // POSIX rename(2) silently replaces its destination, so a naive
    // exists+rename publish lets two racers both "win" and one commit is
    // silently lost. The link(2)-based publish must admit exactly ONE
    // winner, and the surviving manifest must be the winner's content.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = Files.createTempDirectory("snap_atomic").toString
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(s"$dir/_manifests"))
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    (0 until n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          results.put(i, Snapshots.publishManifest(f, dir, 0L, s"data_racer_$i"))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    val winners = results.asScala.collect { case (i, true) => i }.toSeq
    assert(winners.size == 1, s"exactly one racer must win, got winners=$winners")
    // the published manifest carries the winner's content, not a loser's
    val content = Snapshots.readManifestPayload(f, dir, 0L)
    assert(content == s"data_racer_${winners.head}",
      s"manifest content '$content' must be the winner's — an overwrite lost a commit")
    // and no tmp litter survives the stampede
    assert(!f.listStatus(new Path(s"$dir/_manifests"))
      .exists(_.getPath.getName.startsWith(".tmp_")))
  }

  test("scans tolerate a manifest vanishing mid-scan (legal retraction churn)") {
    val dir = Files.createTempDirectory("snap_vanish").toString
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)
    val v1 = Snapshots.commitVersionIdempotent(spark, Seq(2L).toDF("x"), dir, "app#1")
    assert(v1.contains(1L))
    // simulate the race: version 1's manifest retracts itself after the
    // listing but before the read — here, deleted before the scan, which
    // the scan paths must shrug off rather than throw FileNotFoundException
    f.delete(new Path(s"$dir/_manifests/1"), false)
    assert(Snapshots.committedTxns(spark, dir).isEmpty) // txn rode the vanished manifest
    // vacuum: the retracted version's data dir is now legitimate debris
    val removed = Snapshots.vacuum(spark, dir, minAgeMs = 0L)
    assert(removed.size == 1)
    assert(rowsOf(Snapshots.read(spark, dir)) == Seq(1L))
  }

  test("idempotent commit rejects an empty txnId (would silently disable idempotence)") {
    val dir = Files.createTempDirectory("snap_emptytxn").toString
    intercept[IllegalArgumentException] {
      Snapshots.commitVersionIdempotent(spark, Seq(1L).toDF("x"), dir, "")
    }
  }

  test("stats-carrying commit prunes the file list; pruned read is exact") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("snap_stats").toString
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // clustered layout: each of the 8 files owns a narrow price range
    val v = Snapshots.commitVersionWithStats(
      spark, o.repartitionByRange(8, col("o_totalprice")), dir, Seq("o_totalprice"))

    // sidecar is invisible to the plain read path
    assert(Snapshots.readVersion(spark, dir, v).count() == o.count())

    val (lo, hi) = (1000.0, 5000.0)
    val pruned = Snapshots.readVersionPruned(spark, dir, v, Map("o_totalprice" -> (lo, hi)))
    val allFiles = Snapshots.readVersion(spark, dir, v)
      .select(input_file_name()).distinct().count()
    val keptFiles = pruned.select(input_file_name()).distinct().count()
    assert(allFiles == 8, s"expected 8 clustered files, saw $allFiles")
    assert(keptFiles <= 2, s"narrow range should keep <=2 of 8 files, kept $keptFiles")

    // exactness: row predicate over the pruned scan == over the full scan
    val full = Snapshots.readVersion(spark, dir, v)
      .filter(col("o_totalprice").between(lo, hi))
    val viaPruned = pruned.filter(col("o_totalprice").between(lo, hi))
    assert(viaPruned.count() == full.count())
    assert(viaPruned.agg(sum("o_orderkey")).head.getLong(0) ==
      full.agg(sum("o_orderkey")).head.getLong(0))

    // bounds no file can satisfy: empty result, schema intact
    val none = Snapshots.readVersionPruned(spark, dir, v, Map("o_totalprice" -> (-2.0, -1.0)))
    assert(none.count() == 0)
    assert(none.schema == Snapshots.readVersion(spark, dir, v).schema)
  }

  test("pruned read of a stats-less version falls back to the full file list") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("snap_nostats").toString
    val v = Snapshots.commitVersion(spark, Seq(1L, 2L, 3L).toDF("x"), dir)
    val df = Snapshots.readVersionPruned(spark, dir, v, Map("x" -> (2L, 3L)))
    // stats are an optimization, never a correctness gate: no sidecar
    // means no pruning, all rows visible
    assert(df.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  private def manifestFiles(dir: String): Seq[String] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(new Path(dir, "_manifests")).map(_.getPath.getName).toSeq.sorted
  }

  test("log compaction: checkpoint folds the log, drops manifests, keeps every read path") {
    val dir = Files.createTempDirectory("snap_ckpt").toString
    val vs = (0 until 5).map(i => Snapshots.commitVersion(spark, Seq(i.toLong).toDF("x"), dir))
    assert(vs == Seq(0L, 1L, 2L, 3L, 4L))

    assert(Snapshots.checkpointLog(spark, dir) == Some(4L))
    // the individual manifests 0..4 are gone; only checkpoint_4 remains
    assert(manifestFiles(dir) == Seq("checkpoint_4"))

    // every read path still works from the checkpoint alone
    assert(Snapshots.versions(spark, dir) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(Snapshots.read(spark, dir).as[Long].collect().toSeq == Seq(4L))
    (0 until 5).foreach { i =>
      assert(Snapshots.readVersion(spark, dir, i.toLong).as[Long].collect().toSeq == Seq(i.toLong))
    }

    // post-checkpoint commits continue the version sequence
    val v5 = Snapshots.commitVersion(spark, Seq(50L).toDF("x"), dir)
    assert(v5 == 5L)
    assert(Snapshots.versions(spark, dir) == (0L to 5L))
    // time travel ACROSS the boundary: pre- and post-checkpoint versions
    assert(Snapshots.readVersion(spark, dir, 2L).as[Long].collect().toSeq == Seq(2L))
    assert(Snapshots.readVersion(spark, dir, 5L).as[Long].collect().toSeq == Seq(50L))

    // a second compaction folds checkpoint + tail and supersedes the old one
    assert(Snapshots.checkpointLog(spark, dir) == Some(5L))
    assert(manifestFiles(dir) == Seq("checkpoint_5"))
    assert(Snapshots.readVersion(spark, dir, 0L).as[Long].collect().toSeq == Seq(0L))
  }

  test("log compaction: committedTxns reads checkpoint + tail only; idempotence survives") {
    val dir = Files.createTempDirectory("snap_ckpt_txn").toString
    assert(Snapshots.commitVersionIdempotent(spark, Seq(1L).toDF("x"), dir, "app#b0").isDefined)
    assert(Snapshots.commitVersionIdempotent(spark, Seq(2L).toDF("x"), dir, "app#b1").isDefined)
    Snapshots.checkpointLog(spark, dir)
    assert(manifestFiles(dir) == Seq("checkpoint_1"))

    // replay of a PRE-checkpoint batch is still a no-op (txn set folded in)
    assert(Snapshots.committedTxns(spark, dir) == Set("app#b0", "app#b1"))
    assert(Snapshots.commitVersionIdempotent(spark, Seq(1L).toDF("x"), dir, "app#b0").isEmpty)

    // post-checkpoint txns accumulate on top of the checkpointed base
    assert(Snapshots.commitVersionIdempotent(spark, Seq(3L).toDF("x"), dir, "app#b2").isDefined)
    assert(Snapshots.committedTxns(spark, dir) == Set("app#b0", "app#b1", "app#b2"))
    // cost contract: exactly one live manifest after the checkpoint
    assert(manifestFiles(dir).count(n => !n.startsWith("checkpoint_")) == 1)
  }

  test("log compaction: vacuum never collects checkpoint-referenced data dirs") {
    val dir = Files.createTempDirectory("snap_ckpt_vac").toString
    (0 until 3).foreach(i => Snapshots.commitVersion(spark, Seq(i.toLong).toDF("x"), dir))
    Snapshots.checkpointLog(spark, dir)
    // all manifests are compacted away; the data dirs are referenced only
    // via the checkpoint — vacuum(0) must keep every one of them
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0L).isEmpty)
    (0 until 3).foreach { i =>
      assert(Snapshots.readVersion(spark, dir, i.toLong).as[Long].collect().toSeq == Seq(i.toLong))
    }
  }

  test("log compaction on an empty table is a no-op") {
    val dir = Files.createTempDirectory("snap_ckpt_empty").toString
    assert(Snapshots.checkpointLog(spark, dir).isEmpty)
  }

  test("manifest payloads past the old writeUTF 64 KB ceiling round-trip") {
    // an append-heavy table's '+'-joined segment list (or a wide evolved
    // schema's base64 JSON) legitimately exceeds 65535 bytes; the old
    // writeUTF framing threw UTFDataFormatException on every subsequent
    // publish — a bricked table. The m1 framing must carry it verbatim.
    val dir = Files.createTempDirectory("snap_bigpayload").toString
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(s"$dir/_manifests"))
    val big = (0 until 9000).map(i => f"data_${i}%08d").mkString("+") // ~117 KB
    assert(big.length > 65535)
    assert(Snapshots.publishManifest(f, dir, 0L, big))
    assert(Snapshots.readManifestPayload(f, dir, 0L) == big)
  }

  test("pre-m1 writeUTF manifests stay readable (wire compatibility)") {
    val dir = Files.createTempDirectory("snap_oldwire").toString
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(7L).toDF("x").write.parquet(s"$dir/data_old00001")
    f.mkdirs(new Path(s"$dir/_manifests"))
    val out = f.create(new Path(s"$dir/_manifests/0"), false)
    try out.writeUTF("data_old00001") finally out.close()
    assert(Snapshots.readManifestPayload(f, dir, 0L) == "data_old00001")
    assert(Snapshots.read(spark, dir).as[Long].collect().toSeq == Seq(7L))
  }

  test("racing initializers with divergent schemas: at most one schema lands") {
    // two writers both see an empty table, both pass the pre-write gate;
    // the v0-race loser must fail the IN-LOOP re-gate instead of chaining
    // a divergent segment at v1 (silent null-fill corruption). Raced 8x:
    // the loud outcome is deterministic even though the interleaving isn't.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    (0 until 8).foreach { round =>
      val dir = Files.createTempDirectory(s"snap_initrace$round").toString
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val oks = new java.util.concurrent.atomic.AtomicInteger(0)
      def submit(body: => Unit): Unit = pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try { body; oks.incrementAndGet() }
          catch { case t: Throwable => errs.add(t) }
        }
      })
      submit(Snapshots.appendRowsIdempotent(spark, dir, Seq(1L).toDF("x"), s"a#$round"))
      submit(Snapshots.appendRowsIdempotent(spark, dir, Seq("s").toDF("y"), s"b#$round"))
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      // every failure must be the loud schema gate, never silent success
      errs.forEach(t => assert(
        t.getMessage != null && t.getMessage.contains("does not match the"),
        s"unexpected failure class: $t"))
      // the table must hold exactly ONE schema family: reading the latest
      // version succeeds and its schema is one of the two writers' shapes
      val got = Snapshots.read(spark, dir)
      assert(got.schema.fields.map(_.name).toSeq == Seq("x") ||
        got.schema.fields.map(_.name).toSeq == Seq("y"),
        s"mixed-schema table: ${got.schema.simpleString}")
      assert(got.count() == 1L, "a divergent segment chained onto the winner")
    }
  }

  test("pruned read translates bounds through column mapping after rename chains") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("snap_prunemap").toString
    // two clustered files: a in [0,9] / [100,109]; b is always a+1000
    val df = spark.range(0, 10).select(col("id").as("a"), (col("id") + 1000L).as("b"))
      .union(spark.range(100, 110).select(col("id").as("a"), (col("id") + 1000L).as("b")))
    Snapshots.commitVersionWithStats(
      spark, df.repartitionByRange(2, col("a")), dir, Seq("a", "b"))
    // rename chain REUSING a prior name: b->c then a->b — today's logical
    // "b" is physically "a", while the sidecar's min_b/max_b describe the
    // OLD b. A lookup keyed by the logical name consults the wrong
    // column's stats and silently drops files containing matching rows.
    Snapshots.renameColumn(spark, dir, "b", "c")
    Snapshots.renameColumn(spark, dir, "a", "b")
    val v = Snapshots.versions(spark, dir).max
    // bounds on today's b = old a: [100,109] lives only in the high file,
    // whose old-b stats are [1100,1109] — the logical-name lookup would
    // reject BOTH files (their old-b mins exceed 109) and return nothing
    val hi = Snapshots.readVersionPruned(spark, dir, v, Map("b" -> (100L, 109L)))
    assert(hi.filter(col("b").between(100L, 109L)).count() == 10L)
    // and the translation still PRUNES (not a silent unpruned fallback)
    val lo = Snapshots.readVersionPruned(spark, dir, v, Map("b" -> (0L, 9L)))
    assert(lo.select(input_file_name()).distinct().count() == 1L)
    assert(lo.filter(col("b").between(0L, 9L)).count() == 10L)
  }

  test("segmentCount resolves through retraction churn, never reporting 0") {
    val dir = Files.createTempDirectory("snap_segcnt").toString
    Snapshots.commitVersion(spark, Seq(1L).toDF("x"), dir)
    Snapshots.appendRows(spark, dir, Seq(2L).toDF("x")) // v1: 2 segments
    Snapshots.appendRows(spark, dir, Seq(3L).toDF("x")) // v2: 3 segments
    // simulate a racing idempotent writer retracting the latest manifest:
    // the fresh listing must resolve v1's 2 segments — a 0 would tell a
    // maintenance loop "no fragmentation" and skip a needed compaction
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(s"$dir/_manifests/2"), false)
    assert(Snapshots.segmentCount(spark, dir) == 2)
  }

  test("idempotent append losing the v0 race to a MAPPED table lands physical names") {
    import org.apache.spark.sql.functions._
    import java.util.concurrent.{Executors, TimeUnit}
    val dir = Files.createTempDirectory("snap_mapwin").toString
    // B sees the EMPTY table (declared0 = None), then stalls inside its
    // segment write — exactly the window in which A lands a table whose
    // declared schema carries a column mapping
    val block = udf { (x: Long) =>
      MapWinGate.started.countDown()
      MapWinGate.proceed.await(60, TimeUnit.SECONDS)
      x
    }
    val dfB = spark.range(0, 1).select(block(lit(100L)).as("z"), lit(200L).as("y"))
    val pool = Executors.newFixedThreadPool(1)
    val res = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
      def call(): Option[Long] =
        Snapshots.appendRowsIdempotent(spark, dir, dfB, "txn_mapped_v0race")
    })
    assert(MapWinGate.started.await(60, TimeUnit.SECONDS))
    // A: creates the table and renames x->z — logical z now maps to
    // physical x, so B's raw logically-named segment would store bytes
    // reads never resolve (silent null-fill on z)
    Snapshots.commitVersion(spark, Seq((1L, 2L)).toDF("x", "y"), dir)
    Snapshots.renameColumn(spark, dir, "x", "z")
    MapWinGate.proceed.countDown()
    assert(res.get(120, TimeUnit.SECONDS).isDefined)
    pool.shutdown()
    val got = Snapshots.read(spark, dir).orderBy("y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (100L, 200L)),
      s"B's rows must resolve under the mapping, got $got")
  }
}

/** Latches for the mapped-v0-race spec, held in a static object so the
  * blocking UDF's closure captures nothing non-serializable.
  */
private[io] object MapWinGate {
  import java.util.concurrent.CountDownLatch
  val started = new CountDownLatch(1)
  val proceed = new CountDownLatch(1)
}
