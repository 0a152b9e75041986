package graft.streaming

import graft.{SparkSpec, Tables}
import graft.io.Snapshots
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming → versioned-table contract: one version per micro-batch,
  * full content parity with the input, time travel over the ingest
  * history, replayed batches committed exactly once, and a restarted
  * stream (same checkpoint) appending only NEW data.
  */
class SnapshotSinkSpec extends SparkSpec {

  test("each micro-batch becomes a version; replay + restart stay exactly-once") {
    val in = Files.createTempDirectory("ssink_in")
    val ckpt = Files.createTempDirectory("ssink_ckpt").toString
    val table = Files.createTempDirectory("ssink_tbl").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.parquet(s"$in/a.parquet")
    docs.filter(col("doc_id") % 3 === 1).coalesce(1).write.parquet(s"$in/b.parquet")
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    def runStream(): Unit =
      FileWatch.runAvailableNow(
        SnapshotSink.writer(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$in/*.parquet"),
          table, appId = "ssink_spec"),
        ckpt)

    runStream()
    val vs = Snapshots.versions(spark, table)
    assert(vs.size == 2, s"one version per micro-batch, got $vs")
    // content parity: union of versions == the two ingested files
    val ingested = Snapshots.versions(spark, table)
      .flatMap(v => Snapshots.readVersion(spark, table, v).select("doc_id")
        .collect().map(_.getLong(0))).toSet
    val expected = docs.filter(col("doc_id") % 3 =!= 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ingested == expected)

    // manual replay of an already-committed batch id: no new version
    val replay = Snapshots.commitVersionIdempotent(
      spark, Snapshots.readVersion(spark, table, vs.head), table, txnId = "ssink_spec#0")
    assert(replay.isEmpty && Snapshots.versions(spark, table).size == 2)

    // restart with the same checkpoint after new data arrives: exactly
    // one more version, containing only the new file's rows
    docs.filter(col("doc_id") % 3 === 2).coalesce(1).write.parquet(s"$in/c.parquet")
    runStream()
    val vs2 = Snapshots.versions(spark, table)
    assert(vs2.size == 3, s"restart must append exactly the new batch, got $vs2")
    val last = Snapshots.readVersion(spark, table, vs2.last)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(last == docs.filter(col("doc_id") % 3 === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet)

    // a DIFFERENT app's txn with the same batch number is NOT a replay
    val other = Snapshots.commitVersionIdempotent(
      spark, Snapshots.readVersion(spark, table, vs.head), table, txnId = "other_app#0")
    assert(other.nonEmpty && Snapshots.versions(spark, table).size == 4)
  }
}
