package graft.sink

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the one-row-per-run stats record and its DataFrame form
  * (reference: sinks/utils/writer.py:801-966).
  */
object StatsBuilder {

  def pct(part: Long, whole: Long): Double =
    if (whole == 0) 0.0
    else math.round(part.toDouble / whole * 100.0 * 100.0) / 100.0

  def build(
      ctx: RunContext,
      inputCount: Long,
      errorCount: Long,
      outputCount: Long,
      rules: Map[RuleType, Seq[Rule]],
      sourceAgg: Seq[Map[String, String]],
      sourceQuery: Seq[Map[String, String]],
      rowSummaries: Seq[RuleFailureSummary],
      targetAgg: Seq[Map[String, String]],
      targetQuery: Seq[Map[String, String]],
      statuses: Map[String, String],
      timings: Map[String, Double],
      jobMetadata: Option[String] = None): DqStats = {

    val rulesCount: Map[String, Map[String, Long]] = RuleType.all.map { t =>
      val rs = rules.getOrElse(t, Seq.empty)
      t.name -> Map(
        "num_rules" -> rs.size.toLong,
        "num_fail_action" -> rs.count(_.actionIfFailed == "fail").toLong,
        "num_drop_action" -> rs.count(_.actionIfFailed == "drop").toLong,
        "num_ignore_action" -> rs.count(_.actionIfFailed == "ignore").toLong)
    }.toMap

    val rowSummaryMaps = rowSummaries.filter(_.failedRowCount > 0).map { s =>
      Map("rule" -> s.rule, "rule_type" -> s.ruleType,
        "action_if_failed" -> s.actionIfFailed, "tag" -> s.tag,
        "description" -> s.description, "column_name" -> s.columnName,
        "failed_row_count" -> s.failedRowCount.toString)
    }

    DqStats(
      productId = ctx.productId,
      tableName = ctx.targetTable,
      inputCount = inputCount,
      errorCount = errorCount,
      outputCount = outputCount,
      outputPercentage = pct(outputCount, inputCount),
      successPercentage = pct(inputCount - errorCount, inputCount),
      errorPercentage = pct(errorCount, inputCount),
      sourceAggDqResults = sourceAgg.filter(_.get("status").contains("fail")),
      sourceQueryDqResults = sourceQuery.filter(_.get("status").contains("fail")),
      rowDqResSummary = rowSummaryMaps,
      rowDqErrorThreshold = ErrorWriter.thresholds(rowSummaries, inputCount),
      dqStatus = statuses,
      dqRunTime = timings,
      dqRulesCount = rulesCount,
      targetAggDqResults = targetAgg.filter(_.get("status").contains("fail")),
      targetQueryDqResults = targetQuery.filter(_.get("status").contains("fail")),
      runId = ctx.runId,
      runDate = ctx.runDate,
      jobMetadata = jobMetadata)
  }

  /** Stats as a one-row DataFrame ready for the stats-table sink. */
  def toDataFrame(spark: SparkSession, s: DqStats): DataFrame = {
    import spark.implicits._
    Seq(s).toDF()
      .withColumn("output_percentage", round(col("outputPercentage"), 2))
  }

  /** One JSON value per stats row (reference:
    * sinks/plugins/kafka_writer.py:59-61 `to_json(struct(*)) AS value`).
    * A job-metadata STRING column holding JSON is first parsed into a
    * struct so the payload nests it as an object instead of a
    * double-escaped string (kafka_writer.py:47-57); schema comes from
    * the first row, exactly like the reference's `first()` sample, and
    * non-JSON metadata passes through unchanged. Streaming frames skip
    * the conversion (sampling a stream is not possible pre-start).
    */
  def toKafkaPayload(statsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val metaCols =
      Seq("se_job_metadata", "jobMetadata").filter(c =>
        statsDf.columns.contains(c) &&
          statsDf.schema(c).dataType == StringType)
    val converted =
      if (statsDf.isStreaming) statsDf
      else metaCols.foldLeft(statsDf) { (df, c) =>
        scala.util.Try {
          val sample = df.select(c).head()
          val s = if (sample.isNullAt(0)) null else sample.getString(0)
          if (s == null || s.trim.isEmpty || !s.trim.startsWith("{")) df
          else df.withColumn(c, from_json(col(c), schema_of_json(lit(s))))
        }.getOrElse(df)
      }
    converted.selectExpr("to_json(struct(*)) AS value")
  }

  /** The stats row in the REFERENCE's stats-table schema
    * (sinks/utils/writer.py:887-956: snake_case names, float
    * percentages rounded to 2, meta_dq_run_id/date/datetime, dq_env +
    * se_job_metadata trailers) — so dashboards and downstream jobs
    * built on the reference's stats table consume this engine's runs
    * unchanged. `dq_rules` carries the reference's nested-map key shape
    * with the counts this engine tracks (num_row/agg/query_dq_rules and
    * the num_dq_rules total).
    */
  def toReferenceDataFrame(spark: SparkSession, s: DqStats,
                           dqEnv: String = ""): DataFrame = {
    val n = (t: String, k: String) =>
      s.dqRulesCount.getOrElse(t, Map.empty).getOrElse(k, 0L).toInt
    val total = Seq("row_dq", "agg_dq", "query_dq").map(n(_, "num_rules")).sum
    val dqRules: Map[String, Map[String, Int]] = Map(
      "rules" -> Map(
        "num_row_dq_rules" -> n("row_dq", "num_rules"),
        "num_dq_rules" -> total),
      "agg_dq_rules" -> Map("num_agg_dq_rules" -> n("agg_dq", "num_rules")),
      "query_dq_rules" -> Map("num_query_dq_rules" -> n("query_dq", "num_rules")))
    toDataFrame(spark, s).select(
      col("productId").as("product_id"),
      col("tableName").as("table_name"),
      col("inputCount").as("input_count"),
      col("errorCount").as("error_count"),
      col("outputCount").as("output_count"),
      round(col("outputPercentage"), 2).cast("float").as("output_percentage"),
      round(col("successPercentage"), 2).cast("float").as("success_percentage"),
      round(col("errorPercentage"), 2).cast("float").as("error_percentage"),
      col("sourceAggDqResults").as("source_agg_dq_results"),
      col("targetAggDqResults").as("final_agg_dq_results"),
      col("sourceQueryDqResults").as("source_query_dq_results"),
      col("targetQueryDqResults").as("final_query_dq_results"),
      col("rowDqResSummary").as("row_dq_res_summary"),
      col("rowDqErrorThreshold").as("row_dq_error_threshold"),
      col("dqStatus").as("dq_status"),
      col("dqRunTime").cast("map<string,float>").as("dq_run_time"),
      typedLit(dqRules).as("dq_rules"),
      col("runId").as("meta_dq_run_id"),
      to_date(col("runDate")).as("meta_dq_run_date"),
      col("runDate").as("meta_dq_run_datetime"),
      lit(dqEnv).as("dq_env"),
      col("jobMetadata").as("se_job_metadata"))
  }

  /** Detailed per-rule stats rows (reference: sinks/utils/writer.py:504-622
    * builds source and target sides then full-outer joins on 6 keys).
    */
  def detailedStats(
      spark: SparkSession,
      sourceDetails: Seq[DetailedStat],
      targetDetails: Seq[DetailedStat],
      jobMetadata: Option[String] = None): DataFrame = {
    import spark.implicits._
    val keys = Seq("runId", "productId", "tableName", "ruleType", "rule", "columnName")
    val src = sourceDetails.toDF()
    val tgt = targetDetails.toDF()
      .withColumnRenamed("status", "targetStatus")
      .withColumnRenamed("actualValue", "targetActualValue")
      .withColumnRenamed("failedRowCount", "targetFailedRowCount")
      .drop("tag", "description", "expectation", "expectedValue",
        "actualOutcome", "expectedOutcome")
    val joined =
      if (targetDetails.isEmpty) src
      else if (sourceDetails.isEmpty) tgt
      else src.join(tgt, keys, "full_outer")
    // reference stamps dq_job_metadata_info on every detailed row
    // (sinks/utils/writer.py:619)
    joined.withColumn("jobMetadataInfo", lit(jobMetadata.orNull).cast("string"))
  }
}
