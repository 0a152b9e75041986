package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Vectors}

/** Scratch: sweep (beam, probes) for trained-IVF recall@3 vs brute at a
  * SF. Beam covers both the insertion beam (buildTree) and the descent
  * beam (assignCellsTree) — they share the routing contract — so the
  * table is the recall/cost frontier for the tree's own knobs (the
  * round-9 verdict's item 6), not just the fine probe count.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vec = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.l2Norm(col("v")))
    val n = vec.count()
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    // brute truth
    val q0 = vec.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c0 = vec.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wb = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    val truth = topk(
      q0.join(c0, col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rk", row_number().over(wb)).filter(col("rk") <= 3)
        .select("query_id", "neighbor_id"))
    val k = IvfIndex.cellCount(n)
    val cent = IvfIndex.materialize(
      spark, IvfIndex.trainCentroidsK(vec, "vec_id", 64, n, k, iters = 2))
    val nCells = cent.count()
    for (beam <- Seq(8, 12, 16); probes <- Seq(1, 2, 4, 5)) {
      val t0 = System.nanoTime()
      val tree = IvfIndex.buildTree(spark, cent, beam)
      val asg = IvfIndex.assignCellsTree(vec, "vec_id", tree, 1, beam)
      val nAsg = asg.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val q = IvfIndex.assignCellsTree(
        vec.filter(col("vec_id") < 10), "vec_id", tree, probes, beam)
        .select(col("vec_id").as("query_id"), col("cell"), col("v").as("qv"), col("nrm").as("qn"))
      val c = asg.select(col("vec_id").as("neighbor_id"), col("cell"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
      val ivf = topk(
        q.join(c, Seq("cell")).filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("cos", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .select("query_id", "neighbor_id"))
      val hits = truth.map { case (qq, t) => (t & ivf.getOrElse(qq, Set.empty)).size }.sum
      val recall = hits.toDouble / truth.values.map(_.size).sum
      spark.catalog.clearCache() // one corpus cache per grid point, not twelve
      println(f"k=$k%4d cells=$nCells start=${tree.start} beam=$beam%2d " +
        f"probes=$probes recall@3=$recall%.3f assigned=$nAsg build_assign_s=$secs%.1f")
    }
    spark.stop()
  }
}
