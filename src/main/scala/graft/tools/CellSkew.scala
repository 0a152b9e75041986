package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Vectors}

/** Scratch diagnostic: cell-size distribution of the IVF tree assignment
  * at a SF — in-cell pair work for SemDeDup-class lanes is Σ cell², so a
  * routing change that skews cell sizes shows up here before it shows up
  * as a decade-ratio surprise. Usage: runMain graft.tools.CellSkew <sfDir>
  */
object CellSkew {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
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
    val cent = IvfIndex.materialize(
      spark, IvfIndex.trainCentroids(vec, "vec_id", 64, n, iters = 2))
    val tree = IvfIndex.buildTree(spark, cent)
    def stats(tag: String, asg: org.apache.spark.sql.DataFrame): Unit = {
      val st = asg.groupBy("cell").count().agg(
        count(lit(1)).as("n_cells"), min("count").as("mn"),
        expr("percentile(count, 0.5)").as("p50"),
        expr("percentile(count, 0.99)").as("p99"), max("count").as("mx"),
        sum(col("count") * col("count")).as("pair_mass")).first()
      println(s"$tag n=$n cells=${st.get(0)} min=${st.get(1)} p50=${st.get(2)} " +
        s"p99=${st.get(3)} max=${st.get(4)} sum_sq=${st.get(5)}")
    }
    stats("tree", IvfIndex.assignCellsTree(vec, "vec_id", tree, probes = 1))
    // flat (exhaustive nearest-cell) baseline: whatever skew THIS shows is
    // the data's own k-means imbalance, not a routing artifact
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(desc("cos_c"), asc("cid"))
    stats("flat", vec
      .crossJoin(broadcast(cent))
      .withColumn("cos_c", Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell")))
    spark.stop()
  }
}
