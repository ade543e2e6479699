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
      timings: Map[String, Double]): DqStats = {

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
      runDate = ctx.runDate)
  }

  /** Stats as a one-row DataFrame ready for the stats-table sink. */
  def toDataFrame(spark: SparkSession, s: DqStats): DataFrame = {
    import spark.implicits._
    Seq(s).toDF()
      .withColumn("output_percentage", round(col("outputPercentage"), 2))
  }

  /** Kafka-shaped payload: the whole stats row as one JSON value column
    * (reference: sinks/plugins/kafka_writer.py:59-61
    * `to_json(struct(*)) AS value`).
    */
  def toKafkaPayload(statsDf: DataFrame): DataFrame =
    statsDf.selectExpr("to_json(struct(*)) AS value")

  /** Detailed per-rule stats rows (reference: sinks/utils/writer.py:504-622
    * builds source and target sides then full-outer joins on 6 keys).
    */
  def detailedStats(
      spark: SparkSession,
      sourceDetails: Seq[DetailedStat],
      targetDetails: Seq[DetailedStat]): DataFrame = {
    import spark.implicits._
    val keys = Seq("runId", "productId", "tableName", "ruleType", "rule", "columnName")
    val src = sourceDetails.toDF()
    val tgt = targetDetails.toDF()
      .withColumnRenamed("status", "targetStatus")
      .withColumnRenamed("actualValue", "targetActualValue")
      .withColumnRenamed("failedRowCount", "targetFailedRowCount")
      .drop("tag", "description", "expectation", "expectedValue",
        "actualOutcome", "expectedOutcome")
    if (targetDetails.isEmpty) src
    else if (sourceDetails.isEmpty) tgt
    else src.join(tgt, keys, "full_outer")
  }
}
