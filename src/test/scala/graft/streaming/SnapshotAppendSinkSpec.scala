package graft.streaming

import graft.{SparkSpec, Tables}
import graft.io.Snapshots
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Append-mode streaming → versioned-table contract: the LATEST version
  * is always the whole accumulated table (one segment per micro-batch),
  * replays are exactly-once, a restart appends only new data, and the
  * table stays a first-class Snapshots table — deletes compose on it
  * and time travel walks the ingest history.
  */
class SnapshotAppendSinkSpec extends SparkSpec {

  test("append sink accumulates; replay + restart exactly-once; deletes compose") {
    val in = Files.createTempDirectory("sasink_in")
    val ckpt = Files.createTempDirectory("sasink_ckpt").toString
    val table = Files.createTempDirectory("sasink_tbl").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.parquet(s"$in/a.parquet")
    docs.filter(col("doc_id") % 3 === 1).coalesce(1).write.parquet(s"$in/b.parquet")
    val schema = spark.read.parquet(s"$in/a.parquet").schema

    def runStream(): Unit =
      FileWatch.runAvailableNow(
        SnapshotSink.appendWriter(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$in/*.parquet"),
          table, appId = "sasink_spec"),
        ckpt)

    runStream()
    assert(Snapshots.versions(spark, table).size == 2, "one version per batch")
    // THE append-sink property: the latest version alone is the table
    val got = Snapshots.read(spark, table).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 3 =!= 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // time travel: version 0 holds only the first batch
    assert(Snapshots.readVersion(spark, table, 0L).count() < Snapshots.read(spark, table).count())

    // replay of a committed batch: no-op, no new version, content unchanged
    val replay = Snapshots.appendRowsIdempotent(
      spark, table, Snapshots.readVersion(spark, table, 0L), txnId = "sasink_spec#0")
    assert(replay.isEmpty && Snapshots.versions(spark, table).size == 2)

    // restart with new data: exactly one more version, table = everything
    docs.filter(col("doc_id") % 3 === 2).coalesce(1).write.parquet(s"$in/c.parquet")
    runStream()
    assert(Snapshots.versions(spark, table).size == 3)
    val all = Snapshots.read(spark, table).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(all == docs.select("doc_id").collect().map(_.getLong(0)).toSet)

    // the ingested table is a first-class Snapshots table: a MoR delete
    // composes on the accumulated multi-segment view
    val before = Snapshots.read(spark, table).count()
    val vd = Snapshots.deleteWhere(spark, table, col("doc_id") % 10 === 0)
    assert(vd.isDefined)
    val after = Snapshots.read(spark, table)
    assert(after.filter(col("doc_id") % 10 === 0).count() == 0)
    assert(after.count() < before)
  }
}
