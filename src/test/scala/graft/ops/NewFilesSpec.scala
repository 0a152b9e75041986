package graft.ops

import graft.SparkSpec

class NewFilesSpec extends SparkSpec {
  import spark.implicits._

  test("anti-join returns listing rows absent from seen; update accumulates") {
    val listing = Seq(("f1", "a.csv"), ("f2", "b.csv"), ("f3", "c.csv")).toDF("id", "name")
    val seen = Seq("f1").toDF("id")
    val fresh = NewFiles.newFiles(listing, seen, "id")
    assert(fresh.select("id").collect().map(_.getString(0)).toSet == Set("f2", "f3"))
    val seen2 = NewFiles.updateSeen(seen, fresh.select("id"), "id")
    assert(seen2.count() == 3)
    // second poke: nothing new (sensor reschedule semantics)
    assert(NewFiles.newFiles(listing, seen2, "id").count() == 0)
  }

  test("empty seen set => everything is new") {
    val listing = Seq("f1", "f2").toDF("id")
    val seen = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      listing.schema)
    assert(NewFiles.newFiles(listing, seen, "id").count() == 2)
  }
}
