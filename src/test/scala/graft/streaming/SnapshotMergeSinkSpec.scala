package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming MERGE → versioned-table contract (the CDC-apply pattern):
  * each micro-batch is ONE atomic upsert (update matched / insert
  * unmatched / delete on the batch predicate), replays are exactly-once
  * via the appId#batchId txn, and a restart applies only new batches.
  */
class SnapshotMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("merge sink applies batches atomically, exactly-once, restart-safe") {
    val in = Files.createTempDirectory("smsink_in")
    val ckpt = Files.createTempDirectory("smsink_ckpt").toString
    val table = Files.createTempDirectory("smsink_tbl").toString
    Snapshots.commitVersion(
      spark, (1L to 10L).map(i => (i, 0L)).toDF("k", "v"), table)
    // two upsert batches: updates on distinct keys + inserts + one delete
    // row (v < 0) — final state is order-independent, so the file-source
    // batch order never matters
    Seq((1L, 11L), (21L, 21L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$in/a.parquet")
    Seq((2L, -1L), (22L, 22L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$in/b.parquet")
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    def runStream(): Unit =
      FileWatch.runAvailableNow(
        SnapshotSink.mergeWriter(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$in/*.parquet"),
          table, appId = "smsink_spec", keyCols = Seq("k"),
          deleteWhen = Some(col("v") < 0)),
        ckpt)

    runStream()
    assert(Snapshots.versions(spark, table).size == 3, "one version per merge batch")
    def state(): Map[Long, Long] =
      Snapshots.read(spark, table).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = state()
    assert(got(1L) == 11L && got(21L) == 21L && got(22L) == 22L)
    assert(!got.contains(2L)) // deleteWhen row removed its match
    assert(got.size == 11)    // 10 - 1 deleted + 2 inserted

    // replay of a committed batch txn: no-op regardless of content
    val replay = Snapshots.mergeInto(spark, table,
      Seq((99L, 99L)).toDF("k", "v"), Seq("k"), txnId = Some("smsink_spec#0"))
    assert(replay.isEmpty && Snapshots.versions(spark, table).size == 3)
    assert(state() == got)

    // restart with one new batch: exactly one more version, applied once
    Seq((3L, 33L)).toDF("k", "v").coalesce(1).write.parquet(s"$in/c.parquet")
    runStream()
    assert(Snapshots.versions(spark, table).size == 4)
    val after = state()
    assert(after(3L) == 33L && after.size == 11)
    // the merged table remains a first-class snapshot table: time travel
    // to the pre-stream version still reads the original rows
    assert(Snapshots.readVersion(spark, table, 0L).count() == 10)
  }
}
