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
}
