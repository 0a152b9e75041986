package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** SOAK: the streaming MERGE sink's exactly-once + atomicity claims hold
  * over 300 micro-batches with TWO checkpoint restarts, and the segment /
  * DV debris a per-batch merge produces stays BOUNDED when paired with
  * [[Snapshots.compactSegments]] — the production CDC-apply loop (merge
  * stream + periodic OPTIMIZE) run end-to-end. The change-set is
  * deliberately ORDER-FREE (each key's final state is independent of the
  * file-source's batch ordering): updates write a per-key constant,
  * inserts use batch-unique keys, deletes target keys no other batch
  * touches — so the final-table assertion is exact, not racy.
  */
class SnapshotMergeSoakSpec extends SparkSpec {
  import spark.implicits._

  test("merge sink: 300 micro-batches, 2 restarts, compaction keeps reads bounded") {
    val in = Files.createTempDirectory("msoak_in").toString
    val ckpt = Files.createTempDirectory("msoak_ckpt").toString
    val table = Files.createTempDirectory("msoak_tbl").toString

    // initial dimension table: keys 0..149, v=0
    Snapshots.commitVersion(spark,
      spark.range(150).select(col("id").as("k"), lit(0L).as("v"), lit(false).as("del")), table)

    // batch i: update k=i%100 to v=1000+k (constant per key — order-free),
    // insert k=1000+i (batch-unique), and every 6th batch delete initial
    // key 100+i/6 (disjoint from the update range, each deleted once)
    def mkFiles(lo: Int, hi: Int): Unit =
      spark.range(lo, hi, 1, hi - lo).select(col("id").as("i"))
        .select(explode(array(
          struct((col("i") % 100).as("k"), (lit(1000L) + col("i") % 100).as("v"),
            lit(false).as("del")),
          struct((lit(1000L) + col("i")).as("k"), col("i").as("v"), lit(false).as("del")),
          struct(expr("100L + i div 6").as("k"), lit(0L).as("v"),
            (col("i") % 6 === 0).as("del")))).as("r"), col("i"))
        // the non-delete filler row on non-6th batches would collide with
        // the update key's row (dup-key guard) — drop it instead
        .filter(col("r.del") || col("r.k") < 100 || col("r.k") >= 1000)
        .select(col("r.k").as("k"), col("r.v").as("v"), col("r.del").as("del"), col("i"))
        .repartition(hi - lo, col("i"))
        .write.partitionBy("i").mode("append").parquet(in)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("del", org.apache.spark.sql.types.BooleanType)))
    def run(): Unit = FileWatch.runAvailableNow(
      SnapshotSink.mergeWriter(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/i=*"),
        table, appId = "msoak", keyCols = Seq("k"),
        deleteWhen = Some(col("del"))),
      ckpt)
    def liveSegments(): Int = Snapshots.segmentCount(spark, table)

    mkFiles(0, 100)
    run() // phase 1
    val seg1 = liveSegments()
    assert(seg1 > 50, s"soak produced only $seg1 live segments") // one per insert-bearing batch
    Snapshots.compactSegments(spark, table, targetBytes = 4L << 20)
    assert(liveSegments() <= 2, s"compaction left ${liveSegments()} segments")

    mkFiles(100, 200)
    run() // restart 1 from checkpoint
    Snapshots.compactSegments(spark, table, targetBytes = 4L << 20)

    mkFiles(200, 300)
    run() // restart 2 from checkpoint
    Snapshots.compactSegments(spark, table, targetBytes = 4L << 20)
    val segFinal = liveSegments()
    assert(segFinal <= 2, s"debris unbounded: $segFinal live segments after 300 batches")

    // exactly-once across restarts: one merge version per batch + the
    // initial commit + exactly 3 compaction publishes
    val nVersions = Snapshots.versions(spark, table).size
    assert(nVersions == 1 + 300 + 3, s"expected 304 versions, got $nVersions")

    // a replayed committed txn is a no-op regardless of content
    assert(Snapshots.mergeInto(spark, table,
      Seq((0L, 77L, false)).toDF("k", "v", "del"), Seq("k"),
      txnId = Some("msoak#5")).isEmpty)

    // final state == the batch Cdc.applyUpserts ground truth over the
    // (order-free) effective change-set: updates win for 0..99, deletes
    // remove 100..149, inserts add 1000..1299
    val changes = spark.range(100)
      .select(col("id").as("uk"), (lit(1000L) + col("id")).as("uv"))
      .unionByName(spark.range(300)
        .select((lit(1000L) + col("id")).as("uk"), col("id").as("uv")))
    val expected = graft.ops.Cdc.applyUpserts(
        spark.range(150).select(col("id").as("k"), lit(0L).as("v")),
        changes, "k", "uk",
        Seq(("v", col("v"), col("uv"))))
      .filter(!(col("__key") >= 100 && col("__key") < 150)) // the deleted band
      .select(col("__key").as("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Snapshots.read(spark, table)
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == 400, s"expected 400 live keys, got ${got.size}")
    assert(got == expected,
      s"soaked table diverged from batch fold: missing=${(expected -- got).take(5)} " +
        s"extra=${(got -- expected).take(5)}")

    // time travel survives the whole soak: the initial version is intact
    assert(Snapshots.readVersion(spark, table, 0L).count() == 150L)
    info(s"soak: 300 merge batches, 2 restarts, $nVersions versions, " +
      s"live segments $seg1 -> $segFinal after compaction")
  }
}
