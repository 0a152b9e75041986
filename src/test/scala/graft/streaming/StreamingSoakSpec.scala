package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** SOAK: the bounded-state claims hold over hundreds of micro-batches,
  * not just the few the functional specs drive. 300 one-file micro-batches
  * spanning ~128 calendar weeks stream through the decayed leaderboard in
  * three phases with TWO checkpoint restarts between them; a listener
  * records the state-store series (rows, bytes) per batch. Flatness is
  * asserted exactly where exact bounds exist — state rows == |keys| once
  * all keys are seen (flatMapGroupsWithState keeps one row per key),
  * every emitted snapshot ≤ 9 weeks at EVERY version over the 128-week
  * history — plus a loose monotony guard on memoryUsedBytes (2.5×: the
  * HDFS-backed store's bookkeeping is not byte-stable, the content bound
  * is the two exact assertions). Final scores must still equal the batch
  * fold, so 300 batches of pruning never dropped a week that mattered.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  test("decayed leaderboard: 300 micro-batches, 2 restarts, state flat, fold exact") {
    val in = Files.createTempDirectory("soak_in").toString
    val ckpt = Files.createTempDirectory("soak_ckpt").toString
    val out = Files.createTempDirectory("soak_out").toString
    val nKeys = 50L
    // file i (i = 0..299) carries day 3i for every key: 900 days ≈ 128
    // calendar weeks — the 9-week window turns over ~14 times
    def mkFiles(lo: Int, hi: Int, dir: String): Unit =
      // range with EXPLICIT numPartitions: one fid per partition, so the
      // write emits exactly hi−lo files (a hash repartition on fid
      // collides and merges files — measured 187/300; round-robin from 32
      // input partitions overlaps target offsets — measured 207/300)
      spark.range(lo, hi, 1, hi - lo).select(col("id").as("fid"))
        .crossJoin(broadcast(spark.range(nKeys).select(col("id").as("part"))))
        .select(col("part"), (col("fid") * 3).as("day"), col("fid"))
        .write.parquet(s"$in/$dir.parquet")

    val rows = ArrayBuffer.empty[(Long, Long)] // (numRowsTotal, memoryUsedBytes)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val so = e.progress.stateOperators
        if (so.nonEmpty && e.progress.numInputRows > 0)
          rows.synchronized { rows += ((so(0).numRowsTotal, so(0).memoryUsedBytes)) }
      }
    }
    spark.streams.addListener(listener)
    try {
      mkFiles(0, 100, "p0")
      val schema = spark.read.parquet(s"$in/p0.parquet").schema
      def run(): Unit = FileWatch.runAvailableNow(
        StreamingDecayedLeaderboard.weekly(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$in/*.parquet")
            .select(col("part"), col("day"))
            .as[StreamingDecayedLeaderboard.In])
          .writeStream.format("parquet").option("path", out).outputMode("append"),
        ckpt)
      run()                      // phase 1: ~100 micro-batches
      mkFiles(100, 200, "p1")
      run()                      // restart 1 from checkpoint
      mkFiles(200, 300, "p2")
      run()                      // restart 2 from checkpoint

      // the soak actually soaked: ~300 data-carrying micro-batches
      assert(rows.size >= 250, s"only ${rows.size} data micro-batches observed")
      // exact state-row bound: one state row per key, never more — and
      // once every key is seen (every file carries all keys) exactly |keys|
      assert(rows.forall(_._1 <= nKeys), s"state rows exceeded $nKeys: ${rows.map(_._1).max}")
      assert(rows.takeRight(100).forall(_._1 == nKeys),
        s"late-phase state rows drifted: ${rows.takeRight(100).map(_._1).distinct}")
      // loose byte-flatness guard on top of the exact content bounds
      val early = rows.slice(10, 60).map(_._2).max
      val late = rows.takeRight(50).map(_._2).max
      assert(late <= early * 5 / 2,
        s"state bytes grew: early max $early, late max $late over ${rows.size} batches")

      val changelog = spark.read.parquet(out)
      // payload bound at EVERY version across the 128-week history
      val maxWeeks = changelog.groupBy("part", "version").count()
        .agg(max("count")).first().getLong(0)
      assert(maxWeeks <= 9L, s"a snapshot carried $maxWeeks weeks")
      // versions advanced through all three phases (restarts carried state)
      val maxVersion = changelog.agg(max("version")).first().getLong(0)
      assert(maxVersion >= 250, s"state version only reached $maxVersion")

      // after ~14 window turnovers the fold still equals batch truth
      val horizon = 299L * 3 / 7
      val got = StreamingDecayedLeaderboard.scoresAt(changelog, horizon)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = spark.range(300).select((col("id") * 3).as("day"))
        .join(spark.range(nKeys).select(col("id").as("part")))
        .withColumn("dw", lit(horizon) - expr("day div 7"))
        .withColumn("wt",
          when(col("dw").between(0, 8),
            expr("shiftleft(1L, cast(8 - dw as int))")).otherwise(0L))
        .groupBy("part").agg(sum("wt").cast("long").as("score"))
        .filter(col("score") > 0)
        .orderBy(desc("score"), asc("part")).limit(10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"soaked leaderboard $got != batch fold $want")
      info(s"soak: ${rows.size} micro-batches, state rows ${rows.map(_._1).max} (bound $nKeys), " +
        s"bytes early $early late $late, max version $maxVersion")
    } finally spark.streams.removeListener(listener)
  }
}
