package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Multi-segment manifests + the two write paths built on them:
  * appendRows (a version = the prior segments plus one new directory —
  * incremental ingest without a table rewrite) and updateWhere
  * (merge-on-read UPDATE: DV-delete the matched rows and re-append them
  * rewritten, in ONE atomic publish, so no reader ever sees the delete
  * without the insert). The manifest `data` field becomes a '+'-joined
  * segment list; pre-existing single-dir manifests parse as the
  * one-element list, and the checkpoint fold must round-trip the joined
  * form — tested across a checkpointLog below.
  */
class AppendUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir: String =
    java.nio.file.Files.createTempDirectory("graft_seg").toString

  private def names(dir: String, prefix: String): Set[String] = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(new Path(dir)).map(_.getPath.getName).filter(_.startsWith(prefix)).toSet
  }

  test("append adds rows without touching prior segments; time travel intact") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 50L).toDF("id"), dir)
    val dataBefore = names(dir, "data_")
    val v1 = Snapshots.appendRows(spark, dir, (51L to 70L).toDF("id"))
    assert(v1 == v0 + 1)
    // the old segment directory is still there untouched, one new one arrived
    assert(dataBefore.subsetOf(names(dir, "data_")))
    assert(names(dir, "data_").size == dataBefore.size + 1)
    assert(Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq == (1L to 70L))
    assert(Snapshots.readVersion(spark, dir, v0).count() == 50)
  }

  test("appends stack, and a delete after appends spans all segments") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).toDF("id"), dir)
    Snapshots.appendRows(spark, dir, (11L to 20L).toDF("id"))
    Snapshots.appendRows(spark, dir, (21L to 30L).toDF("id"))
    assert(Snapshots.read(spark, dir).count() == 30)
    // rows 5, 15, 25 live in three DIFFERENT segments; one DV covers all
    val vd = Snapshots.deleteWhere(spark, dir, col("id") % 10 === 5)
    assert(vd.isDefined)
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq
    assert(ids == (1L to 30L).filterNot(_ % 10 == 5))
  }

  test("append after a delete carries the dv: deleted rows stay deleted") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 20L).toDF("id"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") <= 5)
    Snapshots.appendRows(spark, dir, (21L to 25L).toDF("id"))
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq
    assert(ids == (6L to 25L))
  }

  test("updateWhere rewrites matched rows atomically in one version") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(
      spark, (1L to 100L).map(i => (i, i * 10L)).toDF("id", "amount"), dir)
    val v1 = Snapshots.updateWhere(spark, dir, col("id") <= 10,
      Seq("amount" -> (col("amount") + 1L)))
    assert(v1.contains(v0 + 1)) // ONE version: delete + insert never split
    val cur = Snapshots.read(spark, dir)
    assert(cur.count() == 100)
    val updated = cur.filter(col("id") <= 10).select("amount")
      .as[Long].collect().sorted.toSeq
    assert(updated == (1L to 10L).map(_ * 10 + 1))
    val untouched = cur.filter(col("id") > 10).select("amount")
      .as[Long].collect().sorted.toSeq
    assert(untouched == (11L to 100L).map(_ * 10))
    // pre-update version still reads the old values
    assert(Snapshots.readVersion(spark, dir, v0)
      .filter(col("id") <= 10).filter(col("amount") % 10 =!= 0).count() == 0)
  }

  test("updates compose: a second update sees the first's rewrites") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).map(i => (i, 0L)).toDF("id", "n"), dir)
    Snapshots.updateWhere(spark, dir, col("id") <= 5, Seq("n" -> (col("n") + 1L)))
    Snapshots.updateWhere(spark, dir, col("id") <= 3, Seq("n" -> (col("n") + 1L)))
    val got = Snapshots.read(spark, dir).orderBy("id").select("n")
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 2L, 1L, 1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("update after delete: deleted rows cannot match") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).map(i => (i, 0L)).toDF("id", "n"), dir)
    Snapshots.deleteWhere(spark, dir, col("id") <= 8)
    // matches only the two survivors, NOT the deleted rows
    val v = Snapshots.updateWhere(spark, dir, col("id") <= 10, Seq("n" -> lit(7L)))
    assert(v.isDefined)
    val got = Snapshots.read(spark, dir).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((9L, 7L), (10L, 7L)))
  }

  test("a no-match update publishes nothing; a new SET column evolves the schema") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(spark, (1L to 5L).map(i => (i, 0L)).toDF("id", "n"), dir)
    assert(Snapshots.updateWhere(spark, dir, col("id") > 99, Seq("n" -> lit(1L))).isEmpty)
    assert(Snapshots.latestVersion(spark, dir).contains(v0))
    // SET of a new column = UPDATE-with-evolution: matched rows carry the
    // value, unmatched rows surface it as null, pre-evolution versions
    // keep their old shape
    val v1 = Snapshots.updateWhere(spark, dir, col("id") === 1L, Seq("extra" -> lit(7L))).get
    val cur = Snapshots.read(spark, dir)
    assert(cur.columns.toSeq == Seq("id", "n", "extra"))
    val byId = cur.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byId(1L).contains(7L) && byId(2L).isEmpty)
    assert(Snapshots.readVersion(spark, dir, v0).columns.toSeq == Seq("id", "n"))
    assert(v1 == v0 + 1)
  }

  test("the change feed reports an update as delete+insert pairs") {
    val dir = freshDir
    val v0 = Snapshots.commitVersion(
      spark, (1L to 20L).map(i => (i, i)).toDF("id", "v"), dir)
    val v1 = Snapshots.updateWhere(spark, dir, col("id") <= 4,
      Seq("v" -> (col("v") * 100L))).get
    val ch = Snapshots.changes(spark, dir, v0, v1).collect()
    assert(ch.count(_.getString(2) == "delete") == 4)
    assert(ch.count(_.getString(2) == "insert") == 4)
  }

  test("checkpointLog round-trips multi-segment entries") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).toDF("id"), dir)
    Snapshots.appendRows(spark, dir, (11L to 20L).toDF("id"))
    Snapshots.updateWhere(spark, dir, col("id") === 20L, Seq("id" -> lit(200L)))
    Snapshots.checkpointLog(spark, dir) // individual manifests dropped
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq
    assert(ids == (1L to 19L) :+ 200L)
    // time travel through the checkpoint sees the two-segment append view
    assert(Snapshots.readVersion(spark, dir, 1L).count() == 20)
    // and a post-checkpoint append composes off the checkpoint entry
    Snapshots.appendRows(spark, dir, Seq(300L).toDF("id"))
    assert(Snapshots.read(spark, dir).count() == 21)
  }

  test("vacuum keeps every referenced segment; compact collapses them") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 10L).toDF("id"), dir)
    Snapshots.appendRows(spark, dir, (11L to 20L).toDF("id"))
    Snapshots.updateWhere(spark, dir, col("id") === 1L, Seq("id" -> lit(100L)))
    // fabricate a lost update attempt's debris (segment + dv, unpublished)
    (1L to 3L).toDF("id").write.parquet(s"$dir/data_debris0")
    (1L to 3L).toDF("x").write.parquet(s"$dir/dv_debris00")
    val reaped = Snapshots.vacuum(spark, dir, minAgeMs = 0)
    assert(reaped.toSet == Set("data_debris0", "dv_debris00"))
    assert(Snapshots.read(spark, dir).count() == 20)
    // OPTIMIZE: compactDeletes materializes the MoR multi-segment view
    // into ONE plain directory and the read is unchanged
    assert(Snapshots.compactDeletes(spark, dir).isDefined)
    val v = Snapshots.latestVersion(spark, dir).get
    val ids = Snapshots.readVersion(spark, dir, v).as[Long].collect().sorted.toSeq
    assert(ids == (2L to 20L) :+ 100L)
  }

  test("racing appends both land, in some order, losing no rows") {
    val dir = freshDir
    Snapshots.commitVersion(spark, (1L to 5L).toDF("id"), dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val a = Future(Snapshots.appendRows(spark, dir, Seq(6L, 7L).toDF("id")))
    val b = Future(Snapshots.appendRows(spark, dir, Seq(8L, 9L).toDF("id")))
    val (va, vb) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(Set(va, vb) == Set(1L, 2L))
    val ids = Snapshots.read(spark, dir).as[Long].collect().sorted.toSeq
    assert(ids == (1L to 9L))
  }
}
