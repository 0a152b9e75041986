package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE INTO on the snapshot table — the atomic upsert write path:
  * matched target rows are DV-dropped and replaced by their source row in
  * one new segment, unmatched source rows insert into the same segment,
  * `deleteWhen` source rows delete their match and vanish, ALL in ONE
  * published version. The spec bar mirrors AppendUpdateSpec: racing
  * writers, replay idempotence via txn id, change-feed delete+insert
  * pairs, checkpoint round-trip — plus read-parity with the
  * oracle-checked `Cdc.applyUpserts` classification.
  */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir: String =
    java.nio.file.Files.createTempDirectory("graft_merge").toString

  private def table(dir: String): Map[Long, Long] =
    Snapshots.read(spark, dir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merge updates matched, inserts unmatched, in ONE version") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(
      spark, (1L to 10L).map(i => (i, i * 10L)).toDF("id", "bal"), dir)
    val src = Seq((3L, 999L), (7L, 777L), (20L, 200L)).toDF("id", "bal")
    val v1 = Snapshots.mergeInto(spark, dir, src, Seq("id"))
    assert(v1.contains(v0 + 1)) // delete + insert never split across versions
    val got = table(dir)
    assert(got.size == 11)
    assert(got(3L) == 999L && got(7L) == 777L && got(20L) == 200L)
    assert(got(1L) == 10L && got(10L) == 100L) // untouched rows never copied wrong
    // pre-merge version is byte-intact
    assert(Snapshots.readVersion(spark, dir, v0).count() == 10)
  }

  test("deleteWhen deletes matched rows and skips unmatched ones") {
    val dir = freshDir
    Snapshots.commitVersion(
      spark, (1L to 6L).map(i => (i, i)).toDF("id", "bal"), dir)
    // id=2 matched+delete, id=4 matched+update, id=50 unmatched+delete
    // (no-op), id=60 unmatched+insert
    val src = Seq((2L, -1L), (4L, 44L), (50L, -1L), (60L, 66L)).toDF("id", "bal")
    val v = Snapshots.mergeInto(spark, dir, src, Seq("id"),
      deleteWhen = Some(col("bal") < 0))
    assert(v.isDefined)
    val got = table(dir)
    assert(!got.contains(2L) && !got.contains(50L))
    assert(got(4L) == 44L && got(60L) == 66L)
    assert(got.size == 6) // 6 - 1 deleted + 1 inserted
  }

  test("read-parity with Cdc.applyUpserts classification") {
    val dir = freshDir
    val base = (1L to 8L).map(i => (i, i * 10L)).toDF("id", "bal")
    Snapshots.commitVersion(spark, base, dir)
    val updates = Seq((2L, 22L), (5L, 55L), (9L, 99L)).toDF("uid", "nb")
    // the oracle-checked query-level emulation: full-outer classification
    val expect = graft.ops.Cdc
      .applyUpserts(base, updates, "id", "uid",
        Seq(("bal", col("bal"), col("nb"))))
      .select(col("__key").as("id"), col("bal"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Snapshots.mergeInto(spark, dir,
      updates.select(col("uid").as("id"), col("nb").as("bal")), Seq("id"))
    assert(table(dir) == expect)
  }

  test("effect-free merge publishes nothing; empty source is a no-op") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, Seq((1L, 1L)).toDF("id", "bal"), dir)
    // deleteWhen filters the only source row, and it matches nothing
    assert(Snapshots.mergeInto(spark, dir, Seq((9L, -1L)).toDF("id", "bal"),
      Seq("id"), deleteWhen = Some(col("bal") < 0)).isEmpty)
    assert(Snapshots.mergeInto(spark, dir,
      Seq.empty[(Long, Long)].toDF("id", "bal"), Seq("id")).isEmpty)
    assert(Snapshots.latestVersion(spark, dir).contains(v0))
  }

  test("duplicate source keys and schema drift are rejected loudly") {
    val dir = freshDir
    Snapshots.commitVersion(spark, Seq((1L, 1L)).toDF("id", "bal"), dir)
    val dup = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, dir,
        Seq((2L, 1L), (2L, 2L)).toDF("id", "bal"), Seq("id"))
    }
    assert(dup.getMessage.contains("multiple rows"))
    val drift = intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, dir,
        Seq((2L, "x")).toDF("id", "name"), Seq("id"))
    }
    assert(drift.getMessage.contains("does not match the table schema"))
  }

  test("txn id makes a replayed merge a no-op") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 4L).map(i => (i, i)).toDF("id", "bal"), dir)
    val src = Seq((1L, 100L), (9L, 900L)).toDF("id", "bal")
    val v1 = Snapshots.mergeInto(spark, dir, src, Seq("id"), txnId = Some("app#1"))
    assert(v1.isDefined)
    val before = table(dir)
    // replay: same txn id → no publish, table unchanged (exactly-once)
    assert(Snapshots.mergeInto(spark, dir, src, Seq("id"), txnId = Some("app#1")).isEmpty)
    assert(Snapshots.latestVersion(spark, dir) == v1)
    assert(table(dir) == before)
    // a NEW txn with the same content applies again (id 1 re-updated: same
    // value; id 9 matched now → replaced, not duplicated)
    assert(Snapshots.mergeInto(spark, dir, src, Seq("id"), txnId = Some("app#2")).isDefined)
    assert(table(dir) == before)
  }

  test("merge composes with a prior delete: deleted keys re-insert") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 5L).map(i => (i, i)).toDF("id", "bal"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") === 3L)
    // key 3 is gone from the MoR view → the merge sees it UNMATCHED and
    // inserts a fresh row (never resurrects the DV-dropped one)
    Snapshots.mergeInto(spark, dir, Seq((3L, 333L)).toDF("id", "bal"), Seq("id"))
    val got = table(dir)
    assert(got(3L) == 333L && got.size == 5)
  }

  test("change feed across a merge reports delete+insert pairs") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(
      spark, (1L to 6L).map(i => (i, i)).toDF("id", "bal"), dir)
    val v1 = Snapshots.mergeInto(spark, dir,
      Seq((2L, 222L), (9L, 999L)).toDF("id", "bal"), Seq("id")).get
    val ch = Snapshots.changes(spark, dir, v0, v1).collect()
    // update of id=2 → delete(2,2)+insert(2,222); insert of id=9 → one insert
    assert(ch.count(_.getString(2) == "delete") == 1)
    assert(ch.count(_.getString(2) == "insert") == 2)
  }

  test("merge survives a checkpointed log and stays readable after one") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 5L).map(i => (i, i)).toDF("id", "bal"), dir)
    Snapshots.mergeInto(spark, dir, Seq((2L, 22L)).toDF("id", "bal"), Seq("id"),
      txnId = Some("m#1"))
    Snapshots.checkpointLog(spark, dir)
    // the txn id survives compaction (replay stays a no-op) …
    assert(Snapshots.mergeInto(spark, dir, Seq((2L, 22L)).toDF("id", "bal"),
      Seq("id"), txnId = Some("m#1")).isEmpty)
    // … and a post-checkpoint merge chains off the checkpoint entry
    Snapshots.mergeInto(spark, dir, Seq((7L, 77L)).toDF("id", "bal"), Seq("id"))
    val got = table(dir)
    assert(got(2L) == 22L && got(7L) == 77L && got.size == 6)
  }

  test("racing merges on disjoint keys both land, losing no effect") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).map(i => (i, 0L)).toDF("id", "bal"), dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val a = Future(Snapshots.mergeInto(spark, dir,
      Seq((1L, 11L), (21L, 21L)).toDF("id", "bal"), Seq("id")))
    val b = Future(Snapshots.mergeInto(spark, dir,
      Seq((2L, 22L), (22L, 22L)).toDF("id", "bal"), Seq("id")))
    val (va, vb) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(va.isDefined && vb.isDefined && va != vb)
    val got = table(dir)
    assert(got(1L) == 11L && got(2L) == 22L)
    assert(got(21L) == 21L && got(22L) == 22L)
    assert(got.size == 12)
  }

  test("merge after evolution writes the evolved shape") {
    val dir = freshDir
    Snapshots.commitVersion(spark, Seq((1L, 1L)).toDF("id", "bal"), dir)
    Snapshots.addColumn(spark, dir, "tag", org.apache.spark.sql.types.StringType)
    // old-shape source is refused — the table schema is now (id, bal, tag)
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, dir, Seq((1L, 2L)).toDF("id", "bal"), Seq("id"))
    }
    Snapshots.mergeInto(spark, dir,
      Seq((1L, 2L, "hot"), (5L, 5L, "new")).toDF("id", "bal", "tag"), Seq("id"))
    val rows = Snapshots.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 2L, "hot"), (5L, 5L, "new")))
  }
}
