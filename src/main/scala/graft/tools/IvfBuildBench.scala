package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Vectors}

/** Split-timing for the IVF lane's three phases — centroid training,
  * routing-tree MODEL build, corpus assignment — so the decade gate can
  * attribute growth to the right phase (the round-9 verdict's ask: show
  * the routed-insertion build sub-quadratic in k, separately from the
  * O(n·log k) corpus side).
  *
  * Usage: runMain graft.tools.IvfBuildBench <sfDir> [cpus=32]
  * Prints one line: n, k, start, and seconds per phase (assignment is
  * materialized through a count of the probe-1 index — same rows the
  * sim_topk_ivf lane builds).
  */
object IvfBuildBench {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = args.lift(1).getOrElse("32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val vec = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.l2Norm(col("v")))
    val n = vec.count()
    val k = IvfIndex.cellCount(n)
    val (cent, tTrain) = timed(IvfIndex.materialize(
      spark, IvfIndex.trainCentroidsK(vec, "vec_id", 64, n, k, iters = 2)))
    val (tree, tBuild) = timed(IvfIndex.buildTree(spark, cent))
    val (cnt, tAssign) = timed(
      IvfIndex.assignCellsTree(vec, "vec_id", tree, probes = 1).count())
    println(f"n=$n k=$k cells=${cent.count()} start=${tree.start} " +
      f"train_s=$tTrain%.2f build_s=$tBuild%.2f assign_s=$tAssign%.2f assigned=$cnt")
    spark.stop()
  }
}
