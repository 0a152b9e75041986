package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Merge-on-read deletion vectors on the snapshot log: a DELETE publishes
  * a new version pointing at the SAME immutable data directory plus a
  * (file, row-index) deletion vector — no data rewrite, time travel
  * untouched, deletes compose, and OPTIMIZE (compactDeletes)
  * materializes. The wire format gains an optional third manifest field
  * (`data|-|dv` with `-` the absent-txn sentinel), which the checkpoint
  * fold must round-trip — tested below across a checkpointLog.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir: String =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  private def names(dir: String, prefix: String): Set[String] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(new Path(dir)).map(_.getPath.getName).filter(_.startsWith(prefix)).toSet
  }

  test("delete removes rows without rewriting data; time travel intact") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 100L).toDF("id"), dir)
    val dataBefore = names(dir, "data_")
    val v1 = Snapshots.deleteWhere(spark, dir, col("id") % 10 === 0)
    assert(v1.contains(v0 + 1))
    val cur = Snapshots.read(spark, dir)
    assert(cur.count() == 90)
    assert(cur.filter(col("id") % 10 === 0).count() == 0)
    // merge-on-read: the data directories are byte-identical, only a dv arrived
    assert(names(dir, "data_") == dataBefore)
    assert(names(dir, "dv_").size == 1)
    // the pre-delete version still reads whole
    assert(Snapshots.readVersion(spark, dir, v0).count() == 100)
  }

  test("deletes compose on the MoR view") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 100L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") <= 10)
    val v2 = Snapshots.deleteWhere(spark, dir, col("id") > 90)
    assert(v2.isDefined)
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted
    assert(ids.toSeq == (11L to 90L))
  }

  test("a no-match delete publishes nothing") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 10L).toDF("id"), dir)
    assert(Snapshots.deleteWhere(spark, dir, col("id") > 1000).isEmpty)
    assert(Snapshots.latestVersion(spark, dir).contains(v0))
  }

  test("the change feed reports MoR deletes") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 20L).toDF("id"), dir)
    val v1 = Snapshots.deleteWhere(spark, dir, col("id") <= 3).get
    val ch = Snapshots.changes(spark, dir, v0, v1).collect()
    assert(ch.count(_.getString(1) == "delete") == 3)
    assert(ch.count(_.getString(1) == "insert") == 0)
  }

  test("checkpointLog round-trips the dv manifest field") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 50L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") % 2 === 0)
    Snapshots.checkpointLog(spark, dir) // individual manifests dropped
    assert(Snapshots.read(spark, dir).count() == 25)
    assert(Snapshots.readVersion(spark, dir, 0L).count() == 50)
    // a post-checkpoint delete composes off the checkpoint entry's dv
    Snapshots.deleteWhere(spark, dir, col("id") === 1L)
    assert(Snapshots.read(spark, dir).count() == 24)
  }

  test("vacuum keeps referenced dvs and collects dv debris") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 30L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") > 20)
    // fabricate a lost-race dv (what a losing deleteWhere attempt leaves)
    (1L to 3L).toDF("x").write.parquet(s"$dir/dv_debris00")
    val reaped = Snapshots.vacuum(spark, dir, minAgeMs = 0)
    assert(reaped == Seq("dv_debris00"))
    assert(Snapshots.read(spark, dir).count() == 20)
  }

  test("compactDeletes materializes the MoR view and clears the dv") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 40L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") <= 15)
    val vc = Snapshots.compactDeletes(spark, dir)
    assert(vc.isDefined)
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted
    assert(ids.toSeq == (16L to 40L))
    // the compacted version is a plain data dir: a second compact is a no-op
    assert(Snapshots.compactDeletes(spark, dir).isEmpty)
  }

  test("rollbackTo restores an old version as a new log entry") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 10L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") <= 5)
    assert(Snapshots.read(spark, dir).count() == 5)
    val vr = Snapshots.rollbackTo(spark, dir, v0)
    assert(vr == 2L)
    assert(Snapshots.read(spark, dir).count() == 10)
    // history intact: the deleted view is still time-travelable,
    // vacuum after the rollback reaps nothing still-referenced
    assert(Snapshots.readVersion(spark, dir, 1L).count() == 5)
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0).isEmpty)
    // a rollback of the rollback restores the MoR view, dv carried over
    val vr2 = Snapshots.rollbackTo(spark, dir, 1L)
    assert(vr2 == 3L)
    assert(Snapshots.read(spark, dir).count() == 5)
  }

  test("stats-pruned reads still apply the version's dv") {
    val dir = freshDir
    Snapshots.commitVersionWithStats(
      spark, (1L to 100L).toDF("id").repartitionByRange(4, col("id")), dir, Seq("id"))
    Snapshots.deleteWhere(spark, dir, col("id") === 5L || col("id") === 95L)
    val v = Snapshots.latestVersion(spark, dir).get
    val pruned = Snapshots.readVersionPruned(spark, dir, v, Map("id" -> (1, 10)))
    val got = pruned.as[Long].collect().sorted.toSeq
    assert(!got.contains(5L) && got.contains(6L) && got.take(1) == Seq(1L))
  }
}
