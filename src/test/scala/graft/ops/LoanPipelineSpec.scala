package graft.ops

import graft.SparkSpec
import java.nio.file.Files

class LoanPipelineSpec extends SparkSpec {

  test("end-to-end: loans_basic.csv -> parquet + insights (golden)") {
    val out = Files.createTempDirectory("graft_etl").toString
    val r = LoanPipeline.runEtl(
      spark, resource("loans_basic.csv"), s"$out/parquet",
      insightsJsonPath = Some(s"$out/insights.json"))
    assert(r.insights.total_loans == 10)
    // post-fill: loan_amount nulls (rows 4,9) filled with mode 1000.0
    // -> avg = (1000*4 + 2000 + 1000 + 3000 + 2500 + 1000 + 4000)/10
    assert(r.insights.avg_loan_amount.contains(1750.0))
    // loan_type null (row 5) filled with mode "personal"
    val byType = r.insights.by_loan_type.get.map(t => t.loan_type.get -> t.count).toMap
    assert(byType == Map("personal" -> 6, "auto" -> 3, "mortgage" -> 1))
    // parquet round-trips with date/time string columns
    val back = spark.read.parquet(s"$out/parquet")
    assert(back.count() == 10)
    assert(back.columns.contains("date") && back.columns.contains("time"))
    // timestamp values are all distinct: the 1-count tie includes the null
    // group and ties break nulls-first, so the fill is a no-op and row 8
    // keeps a null timestamp => exactly one null date
    assert(back.filter(back("date").isNull).count() == 1)
    val json = Files.readString(java.nio.file.Path.of(s"$out/insights.json"))
    assert(json.contains("\"total_loans\": 10"))
    assert(json.contains("\"avg_loan_amount\": 1750.0"))
  }

  test("null-mode column stays null through the pipeline") {
    val out = Files.createTempDirectory("graft_etl2").toString
    val r = LoanPipeline.runEtl(spark, resource("loans_null_mode.csv"), s"$out/parquet")
    assert(r.insights.total_loans == 6)
    val back = spark.read.parquet(s"$out/parquet")
    assert(back.filter(back("loan_type").isNull).count() == 4)
  }

  test("bad timestamps yield null date/time; insights skip missing columns") {
    val out = Files.createTempDirectory("graft_etl3").toString
    val r = LoanPipeline.runEtl(spark, resource("loans_bad_ts.csv"), s"$out/parquet")
    assert(r.insights.avg_loan_amount.isEmpty)
    assert(r.insights.by_loan_type.isEmpty)
    val back = spark.read.parquet(s"$out/parquet").orderBy("loan_id")
    val dates = back.select("date").collect().map(_.getString(0))
    // rows 1-3 unparseable => null date; row 4 parses
    assert(dates.count(_ == null) == 3)
    assert(dates.contains("2024-01-15"))
  }

  test("insights JSON golden shape matches the reference document") {
    val s = Insights.Summary(100, None, None)
    assert(Insights.toJson(s) == "{\n  \"total_loans\": 100\n}")
  }
}
