package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** SOAK #2: the gap-session lane's bounded-state claim over 300
  * micro-batches with TWO checkpoint restarts — the sibling of
  * [[StreamingSoakSpec]] for the ORDER-SENSITIVE state shape (sessions
  * assemble from event adjacency; the leaderboard's sums are
  * order-free). Every user has exactly one open session at any time, so
  * state rows are pinned at |users| once all are seen, for the entire
  * run. The event timeline closes a session every 10 files (delta 5 600
  * ms > gap 1 000 ms at i ≡ 5 mod 10), which puts session [95..104]
  * ACROSS restart 1 and [195..204] across restart 2 — the spec asserts
  * those exact sessions assembled as ONE each, i.e. open-session state
  * survived the checkpoint round-trips intact. The full closed-session
  * multiset must equal the analytic ground truth: 30 closed sessions
  * per user with exact (start, end, n).
  */
class StreamingSessionSoakSpec extends SparkSpec {
  import spark.implicits._

  private def ms(i: Long): Long = i * 600L + ((i + 5L) / 10L) * 5000L

  test("gap sessions: 300 micro-batches, 2 restarts, state pinned, sessions exact") {
    val in = Files.createTempDirectory("ssoak_in").toString
    val ckpt = Files.createTempDirectory("ssoak_ckpt").toString
    val out = Files.createTempDirectory("ssoak_out").toString
    val nUsers = 50L

    // one directory per micro-batch file with an EXPLICIT monotone
    // mtime: the file source's processing order is modification time
    // (path ties are arbitrary), and sessions — unlike the leaderboard's
    // order-free sums — require in-order delivery, the same event-time
    // contract a real session stream gets from its log. Bulk-written
    // part files tie on mtime (measured: scrambled sessions), so each
    // batch's files are stamped fid minutes apart.
    def mkFiles(lo: Int, hi: Int): Unit = {
      val f = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (lo until hi).foreach { i =>
        val dir = f"$in/f$i%03d.parquet"
        spark.range(nUsers).select(col("id").as("user_id"))
          .select(col("user_id"), lit(ms(i.toLong)).as("ms"), lit(0.0).as("value"))
          .coalesce(1).write.parquet(dir)
        val t = 1700000000000L + i * 60000L
        f.listStatus(new org.apache.hadoop.fs.Path(dir))
          .foreach(st => f.setTimes(st.getPath, t, t))
      }
    }

    val rows = ArrayBuffer.empty[(Long, Long)]
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
      mkFiles(0, 100)
      val schema = spark.read.parquet(s"$in/f000.parquet").schema
      def run(): Unit = FileWatch.runAvailableNow(
        StatefulSessions.sessionize(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$in/*.parquet")
            .as[StatefulSessions.Ev],
          gapMs = 1000L)
          .toDF()
          .writeStream.format("parquet").option("path", out).outputMode("append"),
        ckpt)
      run()                      // phase 1: ~100 micro-batches
      mkFiles(100, 200)
      run()                      // restart 1 — session [95..104] is OPEN here
      mkFiles(200, 300)
      run()                      // restart 2 — session [195..204] is OPEN here

      assert(rows.size >= 250, s"only ${rows.size} data micro-batches observed")
      // exactly one open session per user, forever
      assert(rows.forall(_._1 <= nUsers), s"state rows exceeded $nUsers: ${rows.map(_._1).max}")
      assert(rows.takeRight(100).forall(_._1 == nUsers),
        s"late-phase state rows drifted: ${rows.takeRight(100).map(_._1).distinct}")
      val early = rows.slice(10, 60).map(_._2).max
      val late = rows.takeRight(50).map(_._2).max
      assert(late <= early * 5 / 2,
        s"state bytes grew: early max $early, late max $late")

      // analytic ground truth: session index boundaries 0, 5, 15, ..., 295
      val starts = 0L +: (0L until 30L).map(k => 5L + 10L * k)
      val sessAll = starts.zip(starts.tail :+ 300L)
        .map { case (a, b) => (ms(a), ms(b - 1), (b - a).toInt) }
      val closed = sessAll.dropRight(1) // the [295..299] session is still open
      val want = (0L until nUsers).flatMap(u => closed.map { case (s0, s1, n) => (u, s0, s1, n) })
        .sorted

      val got = spark.read.parquet(out)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSeq.sorted
      assert(got == want,
        s"soaked sessions diverge: got ${got.size} rows, want ${want.size}; " +
          s"first diff ${got.zip(want).find(p => p._1 != p._2)}")

      // the two restart-spanning sessions assembled as ONE each
      val span1 = (ms(95L), ms(104L), 10)
      val span2 = (ms(195L), ms(204L), 10)
      assert(closed.contains(span1) && closed.contains(span2))
      info(s"session soak: ${rows.size} micro-batches, state rows pinned at $nUsers, " +
        s"${got.size} closed sessions exact incl. both restart-spanning ones")
    } finally spark.streams.removeListener(listener)
  }
}
