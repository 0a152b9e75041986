package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.io.{Sinks, Sources}

/** The reference's flagship end-to-end ETL (`pyspark_etl.py:48-64`,
  * `run_etl`): CSV (header + inferSchema) -> mode null-fill -> timestamp
  * split -> overwrite parquet + insights JSON.
  *
  * Scale departure from the reference: the cleaned frame is cached before
  * the write + three insight actions — the reference re-executes the scan
  * and projection pipeline once per action (SURVEY.md §3 step 6), which at
  * 100 TB means four full input scans.
  */
object LoanPipeline {
  case class Result(insights: Insights.Summary, cleaned: DataFrame)

  def runEtl(
      spark: SparkSession,
      inputPath: String,
      outputPath: String,
      timestampCol: String = "timestamp",
      insightsJsonPath: Option[String] = None,
      singlePassModeFill: Boolean = false): Result = {
    val raw = Sources.csvInferred(spark, inputPath)
    val filled =
      if (singlePassModeFill) ModeFill.fillNullsWithModeSinglePass(raw)
      else ModeFill.fillNullsWithMode(raw)
    val cleaned = Timestamps.splitTimestamp(filled, timestampCol).cache()
    Sinks.parquetOverwrite(cleaned, outputPath)
    val insights = Insights.compute(cleaned)
    insightsJsonPath.foreach(p => Sinks.writeTextFile(Insights.toJson(insights), p))
    Result(insights, cleaned)
  }
}
