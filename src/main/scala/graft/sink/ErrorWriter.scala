package graft.sink

import graft.model.{Rule, RuleFailureSummary, RunContext}
import graft.eval.RowDqEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Error-row extraction, error-table shaping, and per-rule failure
  * summarization (reference: sinks/utils/writer.py:1011-1158).
  */
object ErrorWriter {

  val RunIdCol   = "meta_dq_run_id"
  val RunDateCol = "meta_dq_run_datetime"

  /** Rows with at least one failed row rule, plus run metadata columns —
    * the error-table shape (reference: sinks/utils/writer.py:1031-1049).
    * `exists(meta, m -> m.status == 'fail')` replaces the reference's
    * OR-chain over per-rule size() checks; since `meta_row_dq_results`
    * already holds only failed maps, a size check suffices.
    */
  def errorRows(rowDqDf: DataFrame, ctx: RunContext): DataFrame =
    rowDqDf
      .filter(size(col(RowDqEvaluator.metaColName)) > 0)
      .withColumn(RunIdCol, lit(ctx.runId))
      .withColumn(RunDateCol, lit(ctx.runDate))

  /** Error rows rebuilt from the bitmask evaluation: filter on the mask
    * (codegen), attach the reference-shaped meta maps only to this small
    * subset, drop the mask columns.
    */
  def errorRowsMasked(masked: DataFrame, rules: Seq[Rule], ctx: RunContext): DataFrame = {
    import graft.eval.MaskedRowDqEvaluator._
    masked
      .filter(anyFailed(rules))
      .withColumn(RowDqEvaluator.metaColName, metaColumn(rules))
      .drop(maskColNames(rules.size): _*)
      .withColumn(RunIdCol, lit(ctx.runId))
      .withColumn(RunDateCol, lit(ctx.runDate))
  }

  /** All pipeline counts + zero-filled per-rule summaries in ONE
    * aggregate over the masked frame (no explode/groupBy shuffle, no
    * separate input/output count jobs).
    */
  def pipelineSummaries(masked: DataFrame, rules: Seq[Rule])
      : (graft.eval.MaskedRowDqEvaluator.PipelineCounts, Seq[RuleFailureSummary]) = {
    val pc = graft.eval.MaskedRowDqEvaluator.pipelineCounts(masked, rules)
    (pc, summariesFromCounts(pc, rules))
  }

  /** Zero-filled per-rule summaries from already-computed counts (shared
    * by the fused-aggregate and observe-on-write counting paths).
    */
  def summariesFromCounts(pc: graft.eval.MaskedRowDqEvaluator.PipelineCounts,
                          rules: Seq[Rule]): Seq[RuleFailureSummary] =
    rules.map { r =>
      RuleFailureSummary(
        rule = r.rule, ruleType = r.ruleType, actionIfFailed = r.actionIfFailed,
        tag = r.tag, description = r.description, columnName = r.columnName,
        failedRowCount = pc.perRule.getOrElse(r.rule, 0L),
        errorDropThreshold = r.errorDropThreshold,
        enableErrorDropAlert = r.enableErrorDropAlert)
    }

  /** Error count + per-rule summaries (see pipelineSummaries). */
  def summarizeMasked(masked: DataFrame, rules: Seq[Rule])
      : (Long, Seq[RuleFailureSummary]) = {
    val (pc, summaries) = pipelineSummaries(masked, rules)
    (pc.errorRows, summaries)
  }

  /** Per-rule failed-row counts via explode + groupBy
    * (reference: sinks/utils/writer.py:1071-1158), zero-filled for rules
    * with no failures.
    */
  def summarize(errorDf: DataFrame, rules: Seq[Rule]): Seq[RuleFailureSummary] = {
    val counts: Map[String, Long] =
      if (rules.isEmpty) Map.empty
      else errorDf
        .select(explode(col(RowDqEvaluator.metaColName)).as("m"))
        .select(element_at(col("m"), "rule").as("rule"))
        .groupBy(col("rule")).count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
    rules.map { r =>
      RuleFailureSummary(
        rule = r.rule, ruleType = r.ruleType, actionIfFailed = r.actionIfFailed,
        tag = r.tag, description = r.description, columnName = r.columnName,
        failedRowCount = counts.getOrElse(r.rule, 0L),
        errorDropThreshold = r.errorDropThreshold,
        enableErrorDropAlert = r.enableErrorDropAlert)
    }
  }

  /** Threshold check rows for stats + alerting
    * (reference: sinks/utils/writer.py:1160-1209).
    */
  def thresholds(summaries: Seq[RuleFailureSummary], inputCount: Long)
      : Seq[Map[String, String]] =
    summaries.map { s =>
      Map(
        "rule"              -> s.rule,
        "action_if_failed"  -> s.actionIfFailed,
        "description"       -> s.description,
        "rule_type"         -> s.ruleType,
        "error_drop_threshold" -> s.errorDropThreshold.toString,
        "error_drop_percentage" -> f"${s.failedPct(inputCount)}%.2f",
        "failed_row_count"  -> s.failedRowCount.toString,
        "threshold_breached" -> s.thresholdBreached(inputCount).toString)
    }
}

/** Batch table sink — a thin, config-driven `DataFrameWriter` chain
  * (reference: sinks/utils/writer.py:242-292).
  */
final case class WriterConfig(
    format: String = "parquet",
    mode: String = "append",
    partitionBy: Seq[String] = Seq.empty,
    bucketBy: Option[(Int, Seq[String])] = None,
    sortBy: Seq[String] = Seq.empty,
    options: Map[String, String] = Map.empty)

/** Bounded retry with exponential backoff (x2 per attempt, capped) —
  * the reference's streaming-table wait loop
  * (sinks/utils/writer.py:46-128). The sleeper is injectable so specs
  * prove the backoff schedule without real waits.
  */
object Backoff {
  def retry[T](maxRetries: Int = 3, initialWaitMs: Long = 500,
               maxWaitMs: Long = 10000, sleep: Long => Unit = Thread.sleep)
              (attempt: () => Option[T]): Option[T] = {
    var wait = initialWaitMs
    var tries = 0
    while (tries < maxRetries) {
      attempt() match {
        case some @ Some(_) => return some
        case None =>
          tries += 1
          if (tries < maxRetries) {
            sleep(wait)
            wait = math.min(wait * 2, maxWaitMs)
          }
      }
    }
    None
  }
}

object TableWriter {

  /** Formats that address the target table as a WRITER OPTION + save()
    * instead of the catalog's saveAsTable — the reference's BigQuery
    * branch (sinks/utils/writer.py:264-267:
    * `.format("bigquery").option("table", t).save()`). The marker
    * option lets tests (and other external-catalog connectors with the
    * same shape) opt into the branch without being named here.
    */
  private val optionTableFormats = Set("bigquery")
  val OptionTableSinkMarker = "graft.option_table_sink"

  private def usesOptionTable(cfg: WriterConfig): Boolean =
    optionTableFormats.contains(cfg.format.toLowerCase) ||
      cfg.options.get(OptionTableSinkMarker).contains("true")

  def write(df: DataFrame, table: String, cfg: WriterConfig): Unit = {
    var w = df.write.mode(cfg.mode).format(cfg.format)
      .options(cfg.options - OptionTableSinkMarker)
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    if (usesOptionTable(cfg)) {
      w.option("table", table).save()
    } else {
      cfg.bucketBy.foreach { case (n, cols) =>
        w = w.bucketBy(n, cols.head, cols.tail: _*)
        if (cfg.sortBy.nonEmpty) w = w.sortBy(cfg.sortBy.head, cfg.sortBy.tail: _*)
      }
      w.saveAsTable(table)
    }
  }

  def writePath(df: DataFrame, path: String, cfg: WriterConfig): Unit = {
    var w = df.write.mode(cfg.mode).format(cfg.format).options(cfg.options)
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    w.save(path)
  }

  /** Post-write table property stamp
    * (reference: sinks/utils/writer.py:146-158 ALTER TABLE ... SET TBLPROPERTIES).
    */
  def stampProductId(spark: SparkSession, table: String, productId: String): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('product_id' = '$productId')")

  /** Streaming-safe property stamp: a just-started stream's target table
    * may not exist until its first micro-batch commits, so wait for it
    * with capped exponential backoff, then stamp product_id only when
    * absent or different; gives up quietly after `maxRetries` like the
    * reference (sinks/utils/writer.py:46-128 never fails the run over a
    * property stamp). Returns true when the property is in place.
    */
  def stampProductIdWithRetry(spark: SparkSession, table: String, productId: String,
                              maxRetries: Int = 3, initialWaitMs: Long = 500,
                              maxWaitMs: Long = 10000,
                              sleep: Long => Unit = Thread.sleep): Boolean =
    Backoff.retry(maxRetries, initialWaitMs, maxWaitMs, sleep) { () =>
      try {
        val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        if (!props.get("product_id").contains(productId))
          stampProductId(spark, table, productId)
        Some(true)
      } catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(false)

  /** Stats-table write with `mergeSchema=true` defaulted (unless the
    * caller set it) so the stats schema can evolve across library
    * versions without breaking the sink
    * (reference: sinks/utils/writer.py:146-158 auto-mergeSchema).
    */
  def writeStatsPath(df: DataFrame, path: String, cfg: WriterConfig): Unit =
    writePath(df, path, withMergeSchema(cfg))

  def writeStats(df: DataFrame, table: String, cfg: WriterConfig): Unit =
    write(df, table, withMergeSchema(cfg))

  private def withMergeSchema(cfg: WriterConfig): WriterConfig =
    if (cfg.options.contains("mergeSchema")) cfg
    else cfg.copy(options = cfg.options + ("mergeSchema" -> "true"))
}
