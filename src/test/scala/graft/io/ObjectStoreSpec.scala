package graft.io

import graft.{SparkSpec, Tables}
import java.net.URI
import java.nio.file.Files
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

/** Minimal object-store stand-in: a Hadoop FileSystem registered under the
  * `graftstore://` scheme, backed by local disk. Like s3a, it is resolved
  * by scheme from the Hadoop conf (`fs.graftstore.impl`) and paths carry a
  * bucket authority (`graftstore://loan-output/...`) that is not a local
  * `file:` URI, so the full DataSource write path — committer, _temporary
  * rename protocol, part-file naming — runs against a non-default
  * FileSystem implementation exactly as it would against an object store.
  */
class GraftStoreFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftstore://loan-output/")
  override def getScheme: String = "graftstore"
}

/** S4 — object-store sink (reference `spark_etl_dag.py:80-108`: walk the
  * local parquet dir, upload every part file to MinIO bucket `loan-output`
  * keeping relative keys). Spark-first equivalent: write directly to the
  * bucket URI through the scheme-resolved FileSystem; the committer
  * replaces the os.walk+boto3 copy. No object store exists in this
  * environment, so the spec proves the writer is scheme-agnostic via a
  * registered non-`file:` FileSystem rather than asserting it.
  */
class ObjectStoreSpec extends SparkSpec {

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftstore.impl", classOf[GraftStoreFileSystem].getName)

  test("parquet sink writes through a non-file: scheme (s3a-shaped path)") {
    registerScheme()
    val backing = Files.createTempDirectory("graft_store").toString
    val bucketPath = s"graftstore://loan-output$backing/etl/output"

    // scheme resolves to our FileSystem, not the local default
    val hc = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new URI("graftstore://loan-output/"), hc)
    assert(fs.isInstanceOf[GraftStoreFileSystem], s"resolved ${fs.getClass}")

    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice", "o_orderstatus")
    Sinks.parquetOverwrite(o, bucketPath)

    // the committer left finished part files (no _temporary) under the key
    val listed = fs.listStatus(new Path(bucketPath)).map(_.getPath.getName)
    assert(listed.exists(_.startsWith("part-")), s"listed: ${listed.mkString(",")}")
    assert(!listed.contains("_temporary"), s"uncommitted dir left: ${listed.mkString(",")}")
    assert(listed.contains("_SUCCESS"))

    // round-trip through the same scheme
    val back = spark.read.parquet(bucketPath)
    assert(back.count() == o.count())
    assert(back.columns.toSeq == o.columns.toSeq)

    // overwrite semantics hold across the scheme boundary (S2 contract)
    Sinks.parquetOverwrite(o.limit(5), bucketPath)
    assert(spark.read.parquet(bucketPath).count() == 5)
  }

  test("gzip CSV artifact writes through the bucket scheme (O4 analogue)") {
    registerScheme()
    val backing = Files.createTempDirectory("graft_store_csv").toString
    val bucketPath = s"graftstore://loan-output$backing/artifacts/daily"
    val n = Tables.nation(spark, sf)
    Sinks.csvGzip(n, bucketPath)
    val back = spark.read.option("header", "true").csv(bucketPath)
    assert(back.count() == n.count())
    val hc = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(new URI("graftstore://loan-output/"), hc)
    val parts = fs.listStatus(new Path(bucketPath)).map(_.getPath.getName)
    assert(parts.exists(p => p.startsWith("part-") && p.endsWith(".csv.gz")),
      s"parts: ${parts.mkString(",")}")
  }
}
