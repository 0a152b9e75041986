package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class ModeFillSpec extends SparkSpec {
  import spark.implicits._

  test("fills nulls with the most frequent value") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None)
      .toDF("c")
    val out = ModeFill.fillNullsWithMode(df).collect().map(_.getString(0))
    // mode: a (2) vs null (2) — tie broken nulls-first, so mode is null => no-op?
    // counts: a=2, b=1, null=2. Tie a vs null -> null first -> no-op.
    assert(out.count(_ == null) == 2)
  }

  test("null-is-mode => fill is a no-op (reference semantics)") {
    val df = Seq(Some("x"), None, None, None).toDF("c")
    val out = ModeFill.fillNullsWithMode(df).collect().map(_.getString(0))
    assert(out.count(_ == null) == 3)
  }

  test("clear non-null mode fills every null") {
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None, None).toDF("c")
    val out = ModeFill.fillNullsWithMode(df).collect().map(_.getString(0))
    assert(out.count(_ == "a") == 5)
    assert(!out.contains(null))
  }

  test("tie between two values breaks to the smaller value") {
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), None).toDF("c")
    val out = ModeFill.fillNullsWithMode(df).collect().map(_.getString(0))
    assert(out.count(_ == "a") == 3) // a wins the 2-2 tie over b
  }

  test("never changes a non-null cell; numeric columns fill with own type") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, 10.0), (3L, null), (4L, 20.0)
    ).toDF("id", "v")
    val out = ModeFill.fillNullsWithMode(df, Seq("v")).orderBy("id").collect()
    assert(out.map(r => r.getDouble(1)).toSeq == Seq(10.0, 10.0, 10.0, 20.0))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("single-pass variant agrees with per-column on tie-free data") {
    val df = Seq(
      (Some("a"), Some(1.5)), (Some("a"), Some(1.5)), (Some("b"), None),
      (None, Some(2.5)), (Some("a"), None), (None, Some(1.5))
    ).toDF("s", "d")
    val a = ModeFill.fillNullsWithMode(df).orderBy("s", "d").collect().toSeq
    val b = ModeFill.fillNullsWithModeSinglePass(df).orderBy("s", "d").collect().toSeq
    assert(a == b)
  }

  test("single-pass computes all modes in one job") {
    val df = Seq((1L, "x", 2.0), (1L, "x", 3.0), (2L, "y", 3.0)).toDF("a", "b", "c")
    val modes = ModeFill.modesSinglePass(df)
    assert(modes("a") == Some("1"))
    assert(modes("b") == Some("x"))
    assert(modes("c") == Some("3.0"))
  }
}
