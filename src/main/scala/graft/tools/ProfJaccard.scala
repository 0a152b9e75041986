package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage-level profile of `item_item_jaccard` — the round-6 verdict's one
  * >10× decade lane (13.0× time for 10× data at sf1→sf10, BENCH_sf10.md).
  * The full query is decomposed into its cumulative prefixes, each run to
  * a noop sink with per-step wall time, shuffle-write bytes, and output
  * row count, so the decade excess can be attributed to a STAGE instead
  * of a parenthetical. Mirrors the ProfPq methodology that root-caused
  * sim_topk_pq in round 6.
  *
  * Usage: runMain graft.tools.ProfJaccard <sfDir> [reps]
  */
object ProfJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()

    val tally = new SparkListener {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(tally)
    def drain(): Unit = org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)

    // The query's own building blocks, reproduced exactly (AnalyticsQueries
    // keeps them private; any drift here would show up as a total-time
    // mismatch against TimeOne, which is checked in the writeup).
    def lineitem: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def items: DataFrame = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    def edges: DataFrame = {
      val i = items
      val b = i.select(col("ok"), col("pk").as("pk2"))
      i.join(b, Seq("ok")).filter(col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b"))
    }
    def pairs: DataFrame = edges
      .groupBy("a", "b").agg(count(lit(1)).cast(LongType).as("n_ab"))
      .filter(col("n_ab") >= 2)
    def deg: DataFrame = items.groupBy("pk")
      .agg(count(lit(1)).cast(LongType).as("dv"))
    def joined: DataFrame = pairs
      .join(deg.select(col("pk").as("a"), col("dv").as("da")), Seq("a"))
      .join(deg.select(col("pk").as("b"), col("dv").as("db")), Seq("b"))
      .withColumn("jaccard_micros", expr("n_ab * 1000000 div (da + db - n_ab)"))
      .select(col("a"), col("b"), col("n_ab"), col("jaccard_micros"))
    def full: DataFrame = joined
      .orderBy(desc("jaccard_micros"), asc("a"), asc("b")).limit(20)

    val steps: Seq[(String, () => DataFrame)] = Seq(
      "scan_distinct_items" -> (() => items),
      "self_join_edges" -> (() => edges),
      "pairs_agg_minsup" -> (() => pairs),
      "deg_agg_alone" -> (() => deg),
      "joined_no_topk" -> (() => joined),
      "full_query" -> (() => full),
    )
    steps.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        drain(); tally.bytes.set(0L)
        val t0 = System.nanoTime()
        fn().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        (dt, tally.bytes.get() / 1e6)
      }
      val (t, mb) = times.minBy(_._1)
      val rows = fn().count()
      println(f"[prof] $name%-22s ${t}%8.2f s  ${mb}%10.1f MB shuffle  $rows%12d rows")
    }
    spark.stop()
  }
}
