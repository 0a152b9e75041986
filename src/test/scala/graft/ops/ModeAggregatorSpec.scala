package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

class ModeAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with the unpivot single-pass on mixed types with planted nulls") {
    val ev = Tables
      .events(spark, sf)
      .withColumn(
        "v",
        when(col("event_id") % 10 === 0, lit(null).cast(StringType))
          .otherwise(col("event_type")))
      .withColumn(
        "w",
        when(col("event_id") % 7 === 0, lit(null).cast(LongType))
          .otherwise(col("user_id") % 5))
      .select("v", "w", "value", "ts")
    val a = ModeAggregator.modes(ev)
    val b = ModeFill.modesSinglePass(ev)
    assert(a == b)
  }

  test("value-vs-value count tie breaks to the smaller string") {
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), None).toDF("c")
    assert(ModeAggregator.modes(df)("c") == Some("a"))
  }

  test("supplementary-plane tie breaks in UTF-8 byte order, matching Spark") {
    // U+FF21 FULLWIDTH A sorts BELOW U+1F600 emoji in code-point/UTF-8
    // order, but ABOVE it in UTF-16 code-unit order (the emoji's lead
    // surrogate is 0xD83D < 0xFF21). The Aggregator must agree with
    // Spark's UTF8String order, i.e. pick the fullwidth letter.
    val df = Seq(Some("Ａ"), Some("Ａ"), Some("😀"), Some("😀")).toDF("c")
    assert(ModeAggregator.modes(df)("c") == Some("Ａ"))
    assert(ModeAggregator.modes(df) == ModeFill.modesSinglePass(df))
  }

  test("null-vs-value count tie: null wins (nulls-first), fill is a no-op") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None).toDF("c")
    assert(ModeAggregator.modes(df)("c") == None)
    val out = ModeAggregator.fillNullsWithMode(df).collect().map(_.getString(0))
    assert(out.count(_ == null) == 2)
  }

  test("empty input yields no modes; fill is identity") {
    val df = Seq.empty[(Option[String], Option[Long])].toDF("s", "l")
    assert(ModeAggregator.modes(df) == Map("s" -> None, "l" -> None))
    assert(ModeAggregator.fillNullsWithMode(df).count() == 0L)
  }

  test("plan is one object-hash aggregate with no Expand") {
    val ev = Tables.events(spark, sf).select("event_type", "user_id", "value")
    val strs = ev.select(ev.columns.toSeq.map(c => col(c).cast("string")): _*)
    val plan = strs
      .select(new ModeAggregator.AllColumnsMode(3).toColumn)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Expand"), plan)
  }
}
