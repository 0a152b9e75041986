package graft.io

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Schema evolution on the ingest path: a long-lived corpus gains columns
  * over time (new metadata fields land mid-crawl), and the reader must
  * unify old and new batches without rewriting history. Two lanes:
  * parquet `mergeSchema` for a flat directory of heterogeneous batches,
  * and the Snapshots manifest log where each version carries its own
  * schema — old snapshots keep their exact shape (no retroactive nulls),
  * which is the auditable behavior a training-data lineage needs.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unifies batches that gained a column; filters still push down") {
    val dir = Files.createTempDirectory("evo").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", "en"), (4L, "delta", "de")).toDF("id", "text", "lang")
      .write.parquet(s"$dir/batch=2")

    val df = spark.read.option("mergeSchema", "true").parquet(s"$dir/batch=*")
    assert(df.columns.sorted.toSeq == Seq("id", "lang", "text"))
    val rows = df.select("id", "lang").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // old-batch rows surface the new column as null; new-batch values intact
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L).contains("en") && rows(4L).contains("de"))

    // pruning/pushdown still applies on the merged relation
    val plan = df.filter(col("id") > 2).select("id").queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,2"), s"filter not pushed on merged schema:\n$plan")
  }

  test("snapshot versions each keep their own schema; history is not rewritten") {
    val dir = Files.createTempDirectory("evo_snap").toString
    Snapshots.commitVersion(spark, Seq((1L, "alpha")).toDF("id", "text"), dir)
    Snapshots.commitVersion(
      spark, Seq((1L, "alpha", "en")).toDF("id", "text", "lang"), dir)
    assert(Snapshots.readVersion(spark, dir, 0L).columns.toSeq == Seq("id", "text"))
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "text", "lang"))
  }

  test("addColumn is metadata-only: old segments read null-filled, no data rewritten") {
    val dir = Files.createTempDirectory("evo_add").toString
    Snapshots.commitVersion(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val dataBefore = new java.io.File(dir).list().filter(_.startsWith("data_")).toSet
    val v1 = Snapshots.addColumn(spark, dir, "lang", org.apache.spark.sql.types.StringType)
    // zero new data directories — the evolve cost one manifest file
    assert(new java.io.File(dir).list().filter(_.startsWith("data_")).toSet == dataBefore)
    val cur = Snapshots.read(spark, dir)
    assert(cur.columns.toSeq == Seq("id", "text", "lang"))
    assert(cur.collect().forall(_.isNullAt(2)))
    // time travel keeps the pre-evolution shape; duplicate add is refused
    assert(Snapshots.readVersion(spark, dir, v1 - 1).columns.toSeq == Seq("id", "text"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, dir, "lang", org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("append validates the table schema: drifted frames fail loudly, never null-fill") {
    val dir = Files.createTempDirectory("evo_guard").toString
    Snapshots.commitVersion(spark, Seq((1L, 10L)).toDF("id", "amount"), dir)
    // missing column
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq(2L).toDF("id"))
    }
    assert(e1.getMessage.contains("does not match the table schema"))
    // renamed column
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((2L, 20L)).toDF("id", "amt"))
    }
    assert(e2.getMessage.contains("does not match the table schema"))
    // wrong type
    intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((2L, "x")).toDF("id", "amount"))
    }
    // the idempotent path enforces the same gate
    intercept[IllegalArgumentException] {
      Snapshots.appendRowsIdempotent(spark, dir, Seq(9L).toDF("id"), "t#1")
    }
    assert(Snapshots.read(spark, dir).count() == 1) // nothing leaked in
  }

  test("evolve -> append -> update -> restore -> vacuum chain") {
    val dir = Files.createTempDirectory("evo_chain").toString
    val v0 = Snapshots.commitVersion(
      spark, (1L to 4L).map(i => (i, i * 10L)).toDF("id", "amount"), dir)
    val vEvolve = Snapshots.addColumn(spark, dir, "tier", org.apache.spark.sql.types.LongType)
    // append must now carry the evolved shape (old shape is refused)
    intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((5L, 50L)).toDF("id", "amount"))
    }
    Snapshots.appendRows(spark, dir, Seq((5L, 50L, 2L)).toDF("id", "amount", "tier"))
    // update over the evolved column works on pre-evolution rows (read as null)
    Snapshots.updateWhere(spark, dir, col("tier").isNull, Seq("tier" -> lit(1L)))
    val cur = Snapshots.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(cur.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 2L)))
    // restore to the pre-evolution version brings the OLD schema back
    Snapshots.rollbackTo(spark, dir, v0)
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "amount"))
    assert(Snapshots.read(spark, dir).count() == 4)
    // the evolved versions remain time-travelable after the restore
    assert(Snapshots.readVersion(spark, dir, vEvolve).columns.length == 3)
    // vacuum keeps everything referenced (all segments are still in history)
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0).isEmpty)
    assert(Snapshots.read(spark, dir).count() == 4)
  }

  test("rename -> append -> update -> restore -> vacuum + checkpoint round-trip") {
    val dir = Files.createTempDirectory("evo_ren").toString
    val v0 = Snapshots.commitVersion(
      spark, (1L to 4L).map(i => (i, i * 10L)).toDF("id", "amount"), dir)
    val dataBefore = new java.io.File(dir).list().filter(_.startsWith("data_")).toSet
    // rename is metadata-only: no data dir appears
    val vRen = Snapshots.renameColumn(spark, dir, "amount", "value")
    assert(new java.io.File(dir).list().filter(_.startsWith("data_")).toSet == dataBefore,
      "rename rewrote data")
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "value"))
    // values ride the rename: the physical bytes are the same column
    assert(Snapshots.read(spark, dir).orderBy("id").select("value")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L))
    // append must carry the NEW logical name; the OLD one is refused
    intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((5L, 50L)).toDF("id", "amount"))
    }
    Snapshots.appendRows(spark, dir, Seq((5L, 50L)).toDF("id", "value"))
    // update through the renamed column, predicate and SET both logical
    Snapshots.updateWhere(spark, dir, col("value") >= 40L, Seq("value" -> lit(99L)))
    assert(Snapshots.read(spark, dir).orderBy("id").select("value")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 99L, 99L))
    // restore below the rename brings the old NAME back
    Snapshots.rollbackTo(spark, dir, v0)
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "amount"))
    // the renamed versions stay time-travelable; vacuum keeps history
    assert(Snapshots.readVersion(spark, dir, vRen).columns.toSeq == Seq("id", "value"))
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0).isEmpty)
    // checkpoint round-trips the mapping (metadata rides the schema JSON)
    Snapshots.checkpointLog(spark, dir)
    assert(Snapshots.readVersion(spark, dir, vRen).columns.toSeq == Seq("id", "value"))
    assert(Snapshots.readVersion(spark, dir, vRen).orderBy("id").select("value")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("dropColumn hides bytes; a re-added name never resurfaces them") {
    val dir = Files.createTempDirectory("evo_drop").toString
    Snapshots.commitVersion(
      spark, Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "legacy_amt", "tag"), dir)
    val vDrop = Snapshots.dropColumn(spark, dir, "legacy_amt")
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "tag"))
    // time travel below the drop still sees the column
    assert(Snapshots.readVersion(spark, dir, vDrop - 1).columns.contains("legacy_amt"))
    // re-add the SAME name: old segments must read it as NULL, not as the
    // stale physical bytes (fresh-physical contract)
    Snapshots.addColumn(spark, dir, "legacy_amt", org.apache.spark.sql.types.LongType)
    val rows = Snapshots.read(spark, dir).orderBy("id").collect()
    assert(rows.forall(_.isNullAt(2)),
      s"stale dropped bytes resurfaced: ${rows.mkString(",")}")
    // writes fill only the NEW column; appends carry the evolved shape
    Snapshots.appendRows(spark, dir, Seq((3L, "z", 333L)).toDF("id", "tag", "legacy_amt"))
    val after = Snapshots.read(spark, dir).orderBy("id").collect()
    assert(after(2).getLong(2) == 333L && after(0).isNullAt(2))
    // drop + rename compose: rename tag, drop nothing else breaks
    Snapshots.renameColumn(spark, dir, "tag", "label")
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "label", "legacy_amt"))
    assert(Snapshots.read(spark, dir).orderBy("id").select("label")
      .collect().map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    // the last column cannot be dropped
    Snapshots.dropColumn(spark, dir, "legacy_amt")
    Snapshots.dropColumn(spark, dir, "label")
    intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, dir, "id")
    }
  }

  test("merge and compaction write through the column mapping") {
    val dir = Files.createTempDirectory("evo_map_wr").toString
    Snapshots.commitVersion(
      spark, (1L to 6L).map(i => (i, i * 10L)).toDF("k", "amount"), dir)
    Snapshots.renameColumn(spark, dir, "amount", "value")
    // merge with the logical shape: update k=1, insert k=7, delete k=2
    Snapshots.mergeInto(spark, dir,
      Seq((1L, 111L), (7L, 70L), (2L, -1L)).toDF("k", "value"), Seq("k"),
      deleteWhen = Some(col("value") < 0L))
    val got = Snapshots.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 111L, 3L -> 30L, 4L -> 40L, 5L -> 50L, 6L -> 60L, 7L -> 70L))
    // small appends + compaction: the packed segment stores PHYSICAL names
    Snapshots.appendRows(spark, dir, Seq((8L, 80L)).toDF("k", "value"))
    Snapshots.appendRows(spark, dir, Seq((9L, 90L)).toDF("k", "value"))
    assert(Snapshots.compactSegments(spark, dir, targetBytes = 1L << 20).isDefined)
    assert(Snapshots.segmentCount(spark, dir) == 1)
    val after = Snapshots.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == got ++ Map(8L -> 80L, 9L -> 90L))
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("k", "value"))
  }

  test("widen -> append -> update -> restore -> vacuum + checkpoint round-trip") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val dir = Files.createTempDirectory("evo_widen").toString
    // the narrow era: INT columns
    val v0 = Snapshots.commitVersion(
      spark, (1 to 4).map(i => (i, i * 10)).toDF("id", "amount"), dir)
    val dataBefore = new java.io.File(dir).list().filter(_.startsWith("data_")).toSet
    // widen is metadata-only: ONE manifest file, zero data dirs
    val vW = Snapshots.widenColumn(spark, dir, "amount", LongType)
    assert(new java.io.File(dir).list().filter(_.startsWith("data_")).toSet == dataBefore,
      "widen rewrote data")
    // the scan up-converts the old INT32 bytes to LONG (no cast layer —
    // the parquet reader itself widens, so pushdown survives)
    val sch = Snapshots.read(spark, dir).schema
    assert(sch("amount").dataType == LongType && sch("id").dataType == IntegerType)
    assert(Snapshots.read(spark, dir).orderBy("id").select("amount")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L))
    // appends must carry the WIDE type: the narrow shape is refused
    // loudly (implicit re-narrowing is how silent truncation happens)
    intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((5, 50)).toDF("id", "amount"))
    }
    Snapshots.appendRows(spark, dir, Seq((5, 50L)).toDF("id", "amount"))
    // the widened column now holds values the narrow type cannot
    Snapshots.appendRows(spark, dir, Seq((6, 5000000000L)).toDF("id", "amount"))
    // update across three heterogeneous segments (int, long, long)
    Snapshots.updateWhere(spark, dir, col("amount") === 40L,
      Seq("amount" -> lit(9999999999L)))
    assert(Snapshots.read(spark, dir).orderBy("id").select("amount")
      .collect().map(_.getLong(0)).toSeq ==
      Seq(10L, 20L, 30L, 9999999999L, 50L, 5000000000L))
    // non-widening promotions are refused: narrowing and cross-family
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, dir, "amount", IntegerType)
    }
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, dir, "id", StringType)
    }
    // restore below the widen brings the NARROW type back
    Snapshots.rollbackTo(spark, dir, v0)
    assert(Snapshots.read(spark, dir).schema("amount").dataType == IntegerType)
    // widened versions stay time-travelable; vacuum keeps history
    assert(Snapshots.readVersion(spark, dir, vW).schema("amount").dataType == LongType)
    assert(Snapshots.vacuum(spark, dir, minAgeMs = 0).isEmpty)
    // checkpoint round-trips the widened declared schema
    Snapshots.checkpointLog(spark, dir)
    assert(Snapshots.readVersion(spark, dir, vW).schema("amount").dataType == LongType)
    assert(Snapshots.readVersion(spark, dir, vW).orderBy("id").select("amount")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("widening composes with rename, decimal precision-up, and compaction") {
    import org.apache.spark.sql.types.DecimalType
    val dir = Files.createTempDirectory("evo_widen2").toString
    val base = Seq((1, "19.99"), (2, "250.50")).toDF("id", "p")
      .select(col("id"), col("p").cast("decimal(5,2)").as("price"))
    Snapshots.commitVersion(spark, base, dir)
    // decimal precision-up at the SAME scale is a widening; a scale
    // change is a rewrite and must be refused
    intercept[IllegalArgumentException] {
      Snapshots.widenColumn(spark, dir, "price", DecimalType(12, 4))
    }
    Snapshots.widenColumn(spark, dir, "price", DecimalType(12, 2))
    // rename after widen: mapping pins physical 'price' under logical 'amount'
    Snapshots.renameColumn(spark, dir, "price", "amount")
    // a value past decimal(5,2)'s range lands fine post-widen
    Snapshots.appendRows(spark, dir, Seq((3, "1234567890.12")).toDF("id", "p")
      .select(col("id"), col("p").cast("decimal(12,2)").as("amount")))
    // compaction packs the heterogeneous segments through mapping + widening
    assert(Snapshots.compactSegments(spark, dir, targetBytes = 1L << 20).isDefined)
    assert(Snapshots.segmentCount(spark, dir) == 1)
    val got = Snapshots.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getDecimal(1).toPlainString)).toSeq
    assert(got == Seq((1, "19.99"), (2, "250.50"), (3, "1234567890.12")), got.toString)
    assert(Snapshots.read(spark, dir).schema("amount").dataType == DecimalType(12, 2))
  }

  test("checkpoint compaction round-trips the declared schema") {
    val dir = Files.createTempDirectory("evo_ck").toString
    Snapshots.commitVersion(spark, Seq((1L, "a")).toDF("id", "text"), dir)
    Snapshots.addColumn(spark, dir, "score", org.apache.spark.sql.types.DoubleType)
    Snapshots.appendRows(spark, dir, Seq((2L, "b", 0.5)).toDF("id", "text", "score"))
    Snapshots.checkpointLog(spark, dir) // individual manifests dropped
    val cur = Snapshots.read(spark, dir).orderBy("id").collect()
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "text", "score"))
    assert(cur(0).isNullAt(2) && cur(1).getDouble(2) == 0.5)
    // pre-evolution time travel through the checkpoint keeps the old shape
    assert(Snapshots.readVersion(spark, dir, 0L).columns.toSeq == Seq("id", "text"))
    // post-checkpoint writes still validate against the evolved schema
    intercept[IllegalArgumentException] {
      Snapshots.appendRows(spark, dir, Seq((3L, "c")).toDF("id", "text"))
    }
  }
}
