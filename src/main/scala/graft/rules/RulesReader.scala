package graft.rules

import graft.model.{ExecutionSettings, Rule, RuleType}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Reads and prepares the rules table.
  *
  * Reference: utils/reader.py:261-417 — filter on product/table/is_active,
  * substitute `{param}` placeholders, collect to the driver grouped by
  * rule type, and derive the execution settings.
  */
object RulesReader {

  /** Filter the rules DF for one run (reference: utils/reader.py:307-311). */
  def filterRules(rulesDf: DataFrame, productId: String, targetTable: String): DataFrame =
    rulesDf.filter(
      col("product_id") === lit(productId) &&
      col("table_name") === lit(targetTable) &&
      col("is_active") === lit(true))

  /** `{param}` substitution on expectation / table_name / product_id
    * (reference: utils/reader.py:297-305,324-331). Driver-side string
    * interpolation — rules are already collected.
    */
  def substituteParams(r: Rule, params: Map[String, String]): Rule =
    if (params.isEmpty) r
    else {
      def sub(s: String): String =
        params.foldLeft(Option(s).getOrElse("")) { case (acc, (k, v)) =>
          acc.replace(s"{$k}", v)
        }
      r.copy(
        productId = sub(r.productId),
        tableName = sub(r.tableName),
        expectation = sub(r.expectation))
    }

  /** Collect + group rules per type (reference: utils/reader.py:329-374). */
  def collectRules(rulesDs: Dataset[Rule], params: Map[String, String] = Map.empty)
      : Map[RuleType, Seq[Rule]] = {
    val rules = rulesDs.collect().toSeq.map(substituteParams(_, params))
    RuleType.all.map(t => t -> rules.filter(_.ruleType == t.name)).toMap
  }

  /** DLT-style `{rule -> expectation}` map of active row rules
    * (reference: utils/reader.py:321-327, `get_rules_from_df(is_dlt=True)`).
    */
  def rulesToDict(rules: Seq[Rule], ruleType: String = "row_dq"): Map[String, String] =
    rules.filter(r => r.isActive && r.ruleType == ruleType)
      .map(r => r.rule -> r.expectation).toMap

  /** Delta-Live-Tables dict mode (reference: utils/reader.py:265-327,
    * `get_rules_from_df(rules_df, target, is_dlt=True, tag, params)`):
    * filter on product/table/is_active, optionally narrow to one `tag`
    * (the KPI the DLT job runs), and return `rule -> expectation` with
    * `{param}` placeholders substituted — ALL rule types, matching the
    * reference's is_dlt branch which doesn't split by type. The map is
    * what a DLT pipeline hands to `@dlt.expect_all`.
    */
  def rulesMap(rulesDf: DataFrame, productId: String, targetTable: String,
               tag: Option[String] = None,
               params: Map[String, String] = Map.empty): Map[String, String] = {
    // table_name placeholders substitute BEFORE the target filter
    // (reader.py:298-306), so `{env}`-templated rows match their target
    val resolved = params.foldLeft(rulesDf) { case (df, (k, v)) =>
      df.withColumn("table_name",
        call_function("replace", col("table_name"), lit(s"{$k}"), lit(v)))
    }
    val filtered = tag.foldLeft(filterRules(resolved, productId, targetTable)) {
      (df, t) => df.filter(col("tag") === lit(t))
    }
    def sub(s: String): String =
      params.foldLeft(Option(s).getOrElse("")) { case (acc, (k, v)) =>
        acc.replace(s"{$k}", v)
      }
    filtered.select(col("rule"), col("expectation")).collect()
      .map(r => r.getString(0) -> sub(r.getString(1))).toMap
  }

  /** Rules DF → typed Dataset[Rule] (snake_case columns → camelCase fields). */
  def toDataset(spark: SparkSession, rulesDf: DataFrame): Dataset[Rule] = {
    import spark.implicits._
    rulesDf.select(
      col("product_id").as("productId"),
      col("table_name").as("tableName"),
      col("rule_type").as("ruleType"),
      col("rule"),
      coalesce(col("column_name"), lit("")).as("columnName"),
      coalesce(col("expectation"), lit("")).as("expectation"),
      coalesce(col("action_if_failed"), lit("ignore")).as("actionIfFailed"),
      coalesce(col("tag"), lit("")).as("tag"),
      coalesce(col("description"), lit("")).as("description"),
      coalesce(col("enable_for_source_dq_validation"), lit(true)).as("enableForSourceDqValidation"),
      coalesce(col("enable_for_target_dq_validation"), lit(true)).as("enableForTargetDqValidation"),
      coalesce(col("is_active"), lit(true)).as("isActive"),
      coalesce(col("enable_error_drop_alert"), lit(false)).as("enableErrorDropAlert"),
      coalesce(col("error_drop_threshold"), lit(100)).as("errorDropThreshold"),
      coalesce(col("query_dq_delimiter"), lit("@")).as("queryDqDelimiter"),
      coalesce(col("enable_querydq_custom_output"), lit(false)).as("enableQuerydqCustomOutput"),
      coalesce(col("priority"), lit("medium")).as("priority")
    ).as[Rule]
  }

  /** Execution-settings derivation. The reference runs one Spark aggregate
    * of `max(when(rule_type == t, true))` per stage flag
    * (utils/reader.py:381-417); with rules already on the driver this is a
    * pure computation.
    */
  def executionSettings(rules: Map[RuleType, Seq[Rule]]): ExecutionSettings = {
    def any(t: RuleType, p: Rule => Boolean) = rules.getOrElse(t, Seq.empty).exists(p)
    ExecutionSettings(
      rowDq         = any(RuleType.RowDq, _ => true),
      sourceAggDq   = any(RuleType.AggDq, _.enableForSourceDqValidation),
      targetAggDq   = any(RuleType.AggDq, _.enableForTargetDqValidation),
      sourceQueryDq = any(RuleType.QueryDq, _.enableForSourceDqValidation),
      targetQueryDq = any(RuleType.QueryDq, _.enableForTargetDqValidation))
  }

  /** The Spark-side variant of the execution-settings aggregate — kept for
    * parity with the reference's single-pass `max(when(...))` job
    * (utils/reader.py:381-417); used when rules stay distributed.
    */
  def executionSettingsAgg(rulesDf: DataFrame): ExecutionSettings = {
    def flag(t: String, enableCol: String): org.apache.spark.sql.Column =
      coalesce(max(when(col("rule_type") === t && col(enableCol), lit(true))), lit(false))
    val row = rulesDf.agg(
      coalesce(max(when(col("rule_type") === "row_dq", lit(true))), lit(false)).as("row_dq"),
      flag("agg_dq", "enable_for_source_dq_validation").as("source_agg_dq"),
      flag("agg_dq", "enable_for_target_dq_validation").as("target_agg_dq"),
      flag("query_dq", "enable_for_source_dq_validation").as("source_query_dq"),
      flag("query_dq", "enable_for_target_dq_validation").as("target_query_dq")
    ).head()
    ExecutionSettings(row.getBoolean(0), row.getBoolean(1), row.getBoolean(2),
      row.getBoolean(3), row.getBoolean(4))
  }

  /** Null/empty audit over required key columns in ONE pass
    * (reference: core/expectations.py:147-172).
    */
  def nullEmptyAudit(rulesDf: DataFrame,
                     requiredCols: Seq[String] = Seq("product_id", "table_name", "rule", "rule_type"))
      : Map[String, Long] = {
    val aggs = requiredCols.map(c =>
      sum(when(col(c).isNull || trim(col(c)) === "", 1L).otherwise(0L)).alias(c))
    val row = rulesDf.select(aggs: _*).head()
    requiredCols.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }

  /** Persist the rules table across the run
    * (reference: core/expectations.py:191-207).
    */
  def persistRules(rulesDf: DataFrame): DataFrame = {
    rulesDf.persist(StorageLevel.MEMORY_AND_DISK)
    rulesDf
  }

  /** Append the id/expectation hash columns to a rules DF — the Spark-side
    * twin of Rule.idHash (reference: core/expectations.py:106-126).
    */
  def withHashColumns(rulesDf: DataFrame): DataFrame =
    rulesDf
      .withColumn("id_hash", md5(concat_ws("|",
        Seq("product_id", "table_name", "rule", "rule_type")
          .map(c => coalesce(trim(col(c)), lit(""))): _*)))
      .withColumn("expectation_hash", md5(coalesce(trim(col("expectation")), lit(""))))
}

/** Composite query-DQ splitting: a query_dq expectation may bundle a base
  * expectation plus named sub-queries, delimited by `@` (configurable),
  * with `{alias}` placeholders substituted into the base
  * (reference: utils/reader.py:183-259).
  *
  * Format: `base_expectation@alias1@sql1@alias2@sql2...`
  */
object CompositeQuerySplitter {

  final case class SplitQuery(baseExpectation: String, subQueries: Map[String, String])

  def split(expectation: String, delimiter: String = "@"): SplitQuery = {
    val parts = expectation.split(java.util.regex.Pattern.quote(delimiter)).map(_.trim)
    if (parts.length < 3) return SplitQuery(expectation.trim, Map.empty)
    val base = parts.head
    val subs = parts.tail.grouped(2).collect {
      case Array(alias, sql) => alias -> sql
    }.toMap
    val substituted = subs.foldLeft(base) { case (acc, (alias, sql)) =>
      acc.replace(s"{$alias}", s"($sql)")
    }
    SplitQuery(substituted, subs)
  }

  /** Balanced-parenthesis LHS/RHS extraction of `(<lhs>) <op> (<rhs>)`
    * scalar-subquery comparisons (reference: utils/actions.py:101-120).
    */
  def splitComparison(expectation: String): Option[(String, String, String)] = {
    val s = expectation.trim
    if (!s.startsWith("(")) return None
    var depth = 0
    var i = 0
    var lhsEnd = -1
    while (i < s.length && lhsEnd < 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) lhsEnd = i
        case _   =>
      }
      i += 1
    }
    if (lhsEnd < 0) return None
    val rest = s.substring(lhsEnd + 1).trim
    val opRe = """^(>=|<=|!=|<>|==|=|>|<)\s*(.*)$""".r
    rest match {
      case opRe(op, rhs) => Some((s.substring(1, lhsEnd), op, rhs.trim))
      case _             => None
    }
  }
}
