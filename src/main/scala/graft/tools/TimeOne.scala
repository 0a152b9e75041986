package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time a single named query (after warmup), printing seconds per run.
  * Usage: runMain graft.tools.TimeOne <sfDir> <name> [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // decade-gate parity with Bench: partitions scale with data so the
    // per-partition working set stays comparable across decades
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // Same action as Bench: noop-format write consumes every row of the
      // final plan (count() would let Catalyst prune top-level sorts and
      // report times Bench can never reproduce).
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache() // Bench-parity: in-plan caches die per rep
    }
    spark.stop()
  }
}
