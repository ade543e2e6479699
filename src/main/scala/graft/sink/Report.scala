package graft.sink

import graft.model.{DetailedStat, RunContext}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Observability report table + alert summaries.
  *
  * The reference builds this by regex-parsing stringified row dumps
  * (sinks/utils/report.py:38-364 — `=\[(.*)\]` extraction, brace
  * stripping, FULL JOIN over normalized keys, success% via
  * least/greatest/abs/coalesce, DecimalType(20,2) cast). Here the same
  * output schema is produced structurally from the typed detailed stats
  * and query outputs — the regex surgery exists in the reference only
  * because its inputs were already stringified.
  *
  * Report columns: run_id, product_id, table_name, rule, column_name,
  * rule_type, source_output, target_output, total_records,
  * failed_records, valid_records, success_percentage, status, dq_time.
  */
object Report {

  /** Rows from row/agg detailed stats: totals come from the run counts. */
  def fromDetailedStats(spark: SparkSession, ctx: RunContext,
                        details: Seq[DetailedStat], inputCount: Long): DataFrame = {
    import spark.implicits._
    if (details.isEmpty) return emptyReport(spark)
    details.toDF()
      .select(
        col("runId").as("run_id"),
        col("productId").as("product_id"),
        col("tableName").as("table_name"),
        col("rule"), col("columnName").as("column_name"),
        col("ruleType").as("rule_type"),
        col("actualValue").as("source_output"),
        col("expectedValue").as("target_output"),
        lit(inputCount).as("total_records"),
        col("failedRowCount").as("failed_records"),
        (lit(inputCount) - col("failedRowCount")).as("valid_records"),
        successPct(lit(inputCount), col("failedRowCount")),
        col("status"),
        date_format(lit(ctx.runDate), "yyyy-MM-dd HH:mm:ss").as("dq_time"))
  }

  /** The reference's `<compare>_<suffix>` alias pairing
    * (writer.py:455-500): within one rule's captured sub-query outputs,
    * an alias `source_X` pairs with `target_X` (self left-outer join on
    * the suffix; a source alias without a target partner keeps a null
    * target side, non-`source_`-prefixed aliases don't emit rows).
    * Pairing happens per capture side (dqType), like the reference's
    * separate source/target frames.
    */
  def pairQueryOutputs(outputs: Seq[graft.orchestrator.QueryOutput])
      : Seq[(String, String, String, String)] =
    outputs.groupBy(o => (o.rule, o.columnName, o.dqType)).toSeq
      .sortBy(_._1).flatMap { case ((rule, column, _), group) =>
        val byAlias = group.map(o => o.alias -> o.output).toMap
        group.filter(_.alias.startsWith("source_")).map { src =>
          val suffix = src.alias.stripPrefix("source_")
          (rule, column, src.output, byAlias.get(s"target_$suffix").orNull)
        }
      }

  /** Rows from query-DQ custom outputs: source vs target sub-query counts
    * (the reference pairs `<compare>_<alias>` rows via a self left-outer
    * join, writer.py:420-502; [[pairQueryOutputs]] performs that pairing
    * over captured [[graft.orchestrator.QueryOutput]]s).
    */
  def fromQueryOutputs(spark: SparkSession, ctx: RunContext,
                       rows: Seq[(String, String, String, String)] /* (rule, column, srcOut, tgtOut) */)
      : DataFrame = {
    import spark.implicits._
    if (rows.isEmpty) return emptyReport(spark)
    rows.toDF("rule", "column_name", "source_output", "target_output")
      .select(
        lit(ctx.runId).as("run_id"),
        lit(ctx.productId).as("product_id"),
        lit(ctx.targetTable).as("table_name"),
        col("rule"), col("column_name"),
        lit("query_dq").as("rule_type"),
        col("source_output"), col("target_output"),
        col("source_output").cast("long").as("total_records"),
        (abs(coalesce(col("source_output").cast("long"), lit(0L)) -
          coalesce(col("target_output").cast("long"), lit(0L)))).as("failed_records"),
        col("target_output").cast("long").as("valid_records"),
        successPct(col("source_output").cast("long"),
          abs(coalesce(col("source_output").cast("long"), lit(0L)) -
            coalesce(col("target_output").cast("long"), lit(0L)))),
        when(coalesce(col("source_output").cast("long"), lit(-1L)) ===
             coalesce(col("target_output").cast("long"), lit(-2L)), "pass")
          .otherwise("fail").as("status"),
        date_format(lit(ctx.runDate), "yyyy-MM-dd HH:mm:ss").as("dq_time"))
  }

  /** success% = 100 * valid/total clamped to [0,100] as DECIMAL(20,2)
    * (reference: report.py least/greatest/abs/coalesce + DecimalType(20,2)).
    */
  private def successPct(total: org.apache.spark.sql.Column,
                         failed: org.apache.spark.sql.Column) =
    least(lit(100.0), greatest(lit(0.0),
      (lit(100.0) * (total - coalesce(failed, lit(0L))) /
        when(total === 0, lit(1)).otherwise(total)).cast(DoubleType)))
      .cast(DecimalType(20, 2)).as("success_percentage")

  private def emptyReport(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "run_id string, product_id string, table_name string, rule string, " +
        "column_name string, rule_type string, source_output string, " +
        "target_output string, total_records bigint, failed_records bigint, " +
        "valid_records bigint, success_percentage decimal(20,2), status string, " +
        "dq_time string"))

  /** Combined report (detailed-stats rows ∪ query-output rows),
    * `unionByName` like the reference (report.py:340).
    */
  def build(spark: SparkSession, ctx: RunContext, details: Seq[DetailedStat],
            queryRows: Seq[(String, String, String, String)], inputCount: Long): DataFrame =
    fromDetailedStats(spark, ctx, details, inputCount)
      .unionByName(fromQueryOutputs(spark, ctx, queryRows))

  /** The three alert aggregation queries over the report
    * (reference: notifications/push/alert.py:32-48).
    */
  def headerSummary(spark: SparkSession, report: DataFrame): DataFrame = {
    report.createOrReplaceTempView("temp_dq_obs_report")
    spark.sql("""
      SELECT dq_time AS snapshot_date, product_id,
        CASE WHEN SUM(CASE WHEN status = 'fail' THEN 1 ELSE 0 END) >= 1
             THEN 'FAIL' ELSE 'PASS' END AS status
      FROM temp_dq_obs_report GROUP BY dq_time, product_id""")
  }

  def ruleSummary(spark: SparkSession, report: DataFrame): DataFrame = {
    report.createOrReplaceTempView("temp_dq_obs_report")
    spark.sql("""
      SELECT product_id, rule, COUNT(rule) AS no_of_rules_executed,
        CASE WHEN SUM(CASE WHEN status = 'fail' THEN 1 ELSE 0 END) >= 1
             THEN 'FAIL' ELSE 'PASS' END AS overall_status,
        CONCAT('Pass:', SUM(CASE WHEN status = 'pass' THEN 1 ELSE 0 END),
               ' / Fail:', SUM(CASE WHEN status = 'fail' THEN 1 ELSE 0 END)) AS status_summary
      FROM temp_dq_obs_report GROUP BY product_id, rule""")
  }

  def detailedReport(spark: SparkSession, report: DataFrame): DataFrame = {
    report.createOrReplaceTempView("temp_dq_obs_report")
    spark.sql("""
      SELECT DISTINCT rule, column_name, status AS validation_status,
        total_records, failed_records, valid_records, success_percentage
      FROM temp_dq_obs_report ORDER BY rule""")
  }

  /** The composed three-section observability alert body — subject as
    * h2, then header / scenario / data-rule summaries joined with <br>,
    * the reference's section titles verbatim (alert.py:118-137). Hand
    * the result to an EmailNotifier with contentType="html" for the
    * reference's detailed email alert.
    */
  def alertEmailHtml(spark: SparkSession, report: DataFrame, subject: String): String = {
    val sections = Seq(
      ("Summary by product ID for the run_id ", headerSummary(spark, report)),
      ("Summary by Scenario :", ruleSummary(spark, report)),
      ("Summary by data_rule:", detailedReport(spark, report)))
    s"<h2>$subject</h2>" + sections.map { case (t, df) => renderHtml(t, df) }.mkString("<br>")
  }

  /** Minimal HTML rendering of a report section (reference renders via
    * Jinja templates; plain string templating here — not a Spark concern).
    */
  def renderHtml(title: String, df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val header = cols.map(c => s"<th>$c</th>").mkString
    val body = rows.map(r =>
      "<tr>" + cols.indices.map(i => s"<td>${Option(r.get(i)).getOrElse("")}</td>").mkString + "</tr>")
      .mkString("\n")
    s"""<h3>$title</h3>\n<table border="1"><tr>$header</tr>\n$body\n</table>"""
  }
}
