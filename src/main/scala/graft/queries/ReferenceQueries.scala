package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.ops.{ModeFill, NewFiles, Timestamps}

/** Reference-derived operator queries (SURVEY.md §2A) over the driver's
  * test tables, each mirrored by DuckDB oracle SQL. Numeric determinism:
  * decimal-exact sums rendered as double (see [[graft.Tables]]).
  */
object ReferenceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** A1 — total count (pyspark_etl.py:38). */
  private val loanTotal: Q = (s, d) =>
    lineitem(s, d).agg(count(lit(1)).as("total_loans"))

  /** A2 — global mean (pyspark_etl.py:40-41), events.value as the
    * loan_amount analogue; exact decimal sum / count for parity.
    */
  private val loanAvg: Q = (s, d) =>
    events(s, d).agg(davg(col("value")).as("avg_loan_amount"))

  /** A3/A4 — group-by frequency with deterministic ordering
    * (pyspark_etl.py:43-45); o_orderpriority as the loan_type analogue.
    */
  private val loanByType: Q = (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_orderpriority"))

  /** F1 — mode null-fill (pyspark_etl.py:14-21). The test tables carry no
    * nulls, so nulls are injected deterministically (every 10th event) and
    * the filled distribution is emitted.
    */
  private val modeFill: Q = (s, d) => {
    val ev = events(s, d).withColumn(
      "v",
      when(col("event_id") % 10 === 0, lit(null).cast(StringType))
        .otherwise(col("event_type")))
    ModeFill
      .fillNullsWithMode(ev, Seq("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("v"))
  }

  /** F1 scale variant — single aggregation pass for all columns; must agree
    * with the per-column fill on tie-free data.
    */
  private val modeFillSinglePass: Q = (s, d) => {
    val ev = events(s, d).withColumn(
      "v",
      when(col("event_id") % 10 === 0, lit(null).cast(StringType))
        .otherwise(col("event_type")))
    ModeFill
      .fillNullsWithModeSinglePass(ev, Seq("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("v"))
  }

  /** F1 typed-Aggregator variant — ALL target columns' modes in ONE
    * object-hash aggregation pass with no row expansion
    * ([[graft.ops.ModeAggregator]], SURVEY §4's declared custom-agg
    * candidate). Two columns of different types are nulled on co-prime
    * strides and filled together; the emitted per-group counts and the
    * filled numeric sum pin both modes cross-engine.
    */
  private val modeFillTypedAgg: Q = (s, d) => {
    val ev = events(s, d)
      .withColumn(
        "v",
        when(col("event_id") % 10 === 0, lit(null).cast(StringType))
          .otherwise(col("event_type")))
      .withColumn(
        "w",
        when(col("event_id") % 7 === 0, lit(null).cast(LongType))
          .otherwise(col("user_id") % 5))
    graft.ops.ModeAggregator
      .fillNullsWithMode(ev, Seq("v", "w"))
      .groupBy("v")
      .agg(count(lit(1)).as("n"), sum("w").cast(LongType).as("sum_w"))
      .orderBy(asc_nulls_first("v"))
  }

  /** F2/F3 — multi-format timestamp parse + date/time split
    * (pyspark_etl.py:23-33). Source strings are rendered from events.ts in
    * all three reference formats (round-robin by event_id), parsed back
    * first-match-wins, then aggregated by the derived date string.
    */
  private val tsSplitDaily: Q = (s, d) => {
    val f = Timestamps.Formats
    val ev = events(s, d).withColumn(
      "ts_str",
      when(col("event_id") % 3 === 0, date_format(col("ts"), f(0)))
        .when(col("event_id") % 3 === 1, date_format(col("ts"), f(1)))
        .otherwise(date_format(col("ts"), f(2))))
    Timestamps
      .splitTimestamp(ev.drop("ts"), "ts_str")
      .groupBy("date")
      .agg(count(lit(1)).as("n"), countDistinct(col("time")).as("n_times"))
      .orderBy("date")
  }

  /** J1 — new-files anti-join (google_drive_sensor.py:39,45-46): orders
    * whose key is not in the synthetic seen-set (keys divisible by 3).
    */
  private val newFilesQ: Q = (s, d) => {
    val o = orders(s, d)
    val seen = o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
    NewFiles
      .newFiles(o, seen, "o_orderkey")
      .agg(
        count(lit(1)).as("n_new"),
        min("o_orderkey").as("min_id"),
        max("o_orderkey").as("max_id"),
        sum("o_orderkey").cast(LongType).as("id_sum"))
  }

  /** TPC-H Q1-style pricing summary — the flagship aggregate: filters push
    * to the parquet scan, partial+final hash aggregation, no driver loops.
    */
  private val q1Pricing: Q = (s, d) => {
    val oneMinus = (lit(1) - rate2(col("l_discount"))).cast(DecimalType(4, 2))
    val onePlus = (lit(1) + rate2(col("l_tax"))).cast(DecimalType(4, 2))
    lineitem(s, d)
      // to_timestamp resolves in the UTC session timezone — a
      // java.sql.Timestamp literal would parse in the JVM default TZ and
      // shift the cutoff on non-UTC hosts
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dmsum(dec2(col("l_extendedprice")) * oneMinus).as("sum_disc_price"),
        dmsum(dec2(col("l_extendedprice")) * oneMinus * onePlus).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** The same pricing summary through the SQL front end (spark.sql over a
    * temp view) — exercises the parser/analyzer path; the SQL text is the
    * shared ANSI dialect, near-identical to the DuckDB oracle.
    */
  private val q1Sql: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """WITH x AS (SELECT l_returnflag, l_linestatus,
        |  CAST(l_quantity AS DECIMAL(12,2)) AS qty,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        |  CAST(l_discount AS DECIMAL(12,2)) AS disc,
        |  CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS omd,
        |  CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS opt
        |FROM lineitem_v WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(qty) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(price) AS DOUBLE) AS sum_base_price,
        |  CAST(round(SUM(price * omd), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(SUM(price * omd * opt), 2) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(qty) AS DOUBLE) / COUNT(qty) AS avg_qty,
        |  CAST(SUM(price) AS DOUBLE) / COUNT(price) AS avg_price,
        |  CAST(SUM(disc) AS DOUBLE) / COUNT(disc) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM x GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Data-profiling pass (the QA shape of the reference's insights doc):
    * per-column null counts + distinct counts + a numeric summary in ONE
    * aggregation job over orders.
    */
  private val profile: Q = (s, d) =>
    orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nulls_status"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nulls_price"),
      countDistinct(col("o_orderstatus")).as("d_status"),
      countDistinct(col("o_orderpriority")).as("d_priority"),
      countDistinct(col("o_custkey")).as("d_cust"),
      min("o_totalprice").as("min_price"),
      max("o_totalprice").as("max_price"),
      davg(col("o_totalprice")).as("avg_price"))

  val queries: Map[String, Q] = Map(
    "profile_orders" -> profile,
    "q1_sql_frontend" -> q1Sql,
    "loan_total" -> loanTotal,
    "loan_avg_amount" -> loanAvg,
    "loan_by_type" -> loanByType,
    "mode_fill_value" -> modeFill,
    "mode_fill_single_pass" -> modeFillSinglePass,
    "mode_fill_typed_agg" -> modeFillTypedAgg,
    "ts_split_daily" -> tsSplitDaily,
    "new_files_anti_join" -> newFilesQ,
    "q1_pricing_summary" -> q1Pricing
  )

  /** q1_sql_frontend shares q1's oracle SQL (identical semantics). */
  private val q1OracleSql: String =
    """WITH x AS (SELECT l_returnflag, l_linestatus,
      |  CAST(l_quantity AS DECIMAL(12,2)) AS qty,
      |  CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |  CAST(l_discount AS DECIMAL(12,2)) AS disc,
      |  CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS omd,
      |  CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS opt
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
      |SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(qty) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(price) AS DOUBLE) AS sum_base_price,
      |  CAST(round(SUM(price * omd), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(SUM(price * omd * opt), 2) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(qty) AS DOUBLE) / COUNT(qty) AS avg_qty,
      |  CAST(SUM(price) AS DOUBLE) / COUNT(price) AS avg_price,
      |  CAST(SUM(disc) AS DOUBLE) / COUNT(disc) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM x GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  val oracle: Map[String, String] = Map(
    "profile_orders" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_status,
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_price,
        |  COUNT(DISTINCT o_orderstatus) AS d_status,
        |  COUNT(DISTINCT o_orderpriority) AS d_priority,
        |  COUNT(DISTINCT o_custkey) AS d_cust,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
        |FROM orders""".stripMargin,
    "q1_sql_frontend" -> q1OracleSql,
    "loan_total" -> "SELECT COUNT(*) AS total_loans FROM lineitem",
    "loan_avg_amount" ->
      """SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(value) AS avg_loan_amount FROM events""",
    "loan_by_type" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority ASC""",
    "mode_fill_value" ->
      """WITH v AS (SELECT CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS v FROM events),
        |c AS (SELECT v, COUNT(*) AS cnt FROM v GROUP BY v),
        |m AS (SELECT v FROM c ORDER BY cnt DESC, v ASC NULLS FIRST LIMIT 1)
        |SELECT COALESCE(v.v, m.v) AS v, COUNT(*) AS n FROM v CROSS JOIN m GROUP BY 1 ORDER BY v ASC NULLS FIRST""".stripMargin,
    "mode_fill_single_pass" ->
      """WITH v AS (SELECT CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS v FROM events),
        |c AS (SELECT v, COUNT(*) AS cnt FROM v GROUP BY v),
        |m AS (SELECT v FROM c ORDER BY cnt DESC, v ASC NULLS FIRST LIMIT 1)
        |SELECT COALESCE(v.v, m.v) AS v, COUNT(*) AS n FROM v CROSS JOIN m GROUP BY 1 ORDER BY v ASC NULLS FIRST""".stripMargin,
    "mode_fill_typed_agg" ->
      """WITH b AS (SELECT
        |  CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END AS v,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS w
        |FROM events),
        |cv AS (SELECT v, COUNT(*) AS cnt FROM b GROUP BY v),
        |mv AS (SELECT v FROM cv ORDER BY cnt DESC, v ASC NULLS FIRST LIMIT 1),
        |cw AS (SELECT w, COUNT(*) AS cnt FROM b GROUP BY w),
        |mw AS (SELECT w FROM cw
        |       ORDER BY cnt DESC, CAST(w AS VARCHAR) ASC NULLS FIRST LIMIT 1)
        |SELECT COALESCE(b.v, mv.v) AS v, COUNT(*) AS n,
        |  CAST(SUM(COALESCE(b.w, mw.w)) AS BIGINT) AS sum_w
        |FROM b CROSS JOIN mv CROSS JOIN mw
        |GROUP BY 1 ORDER BY v ASC NULLS FIRST""".stripMargin,
    "ts_split_daily" ->
      """WITH s AS (SELECT CASE
        |  WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |  WHEN event_id % 3 = 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
        |  ELSE strftime(ts, '%d-%m-%Y %H:%M:%S') END AS ts_str FROM events),
        |p AS (SELECT COALESCE(
        |  try_strptime(ts_str, '%Y-%m-%d %H:%M:%S'),
        |  try_strptime(ts_str, '%m/%d/%Y %H:%M:%S'),
        |  try_strptime(ts_str, '%d-%m-%Y %H:%M:%S')) AS pt FROM s)
        |SELECT strftime(pt, '%Y-%m-%d') AS date, COUNT(*) AS n,
        |  COUNT(DISTINCT strftime(pt, '%H:%M:%S')) AS n_times
        |FROM p GROUP BY 1 ORDER BY date""".stripMargin,
    "new_files_anti_join" ->
      """SELECT COUNT(*) AS n_new, MIN(o_orderkey) AS min_id, MAX(o_orderkey) AS max_id,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS id_sum
        |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin,
    "q1_pricing_summary" -> q1OracleSql
  )
}
