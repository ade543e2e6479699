package graft.eval

import graft.model.{Rule, RuleType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Row-level rule evaluation — the engine's core distributed operator.
  *
  * All row rules are applied in ONE projection over the input
  * (reference: utils/actions.py:497-516,598-599): Catalyst collapses the
  * N `when` chains into a single `Project` inside whole-stage codegen, so
  * evaluation costs one scan regardless of rule count.
  */
object RowDqEvaluator {

  def metaColName: String = "meta_row_dq_results"

  /** Returns the input with one extra column `meta_row_dq_results:
    * array<map<string,string>>` holding the failed-rule maps for that row
    * (empty array when the row passes everything).
    */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.forall(_.ruleType == RuleType.RowDq.name), "row_dq rules only")
    if (rules.isEmpty) return df.withColumn(metaColName, array())
    val ruleCols = rules.map(RuleCompiler.ruleColumn)
    val names    = rules.map(RuleCompiler.resultColName)
    df.select(col("*") +: ruleCols: _*)
      .withColumn(metaColName, RuleCompiler.collapseFailed(names))
      .drop(names: _*)
  }
}

/** Aggregate-level rule evaluation.
  *
  * The same when/otherwise conditions selected WITHOUT `col("*")` — an
  * expectation like `sum(l_quantity) > 20` makes Catalyst plan a single
  * global Aggregate producing one row of rule-result maps
  * (reference: utils/actions.py:580-594).
  */
object AggDqEvaluator {

  /** Evaluates all agg rules in one job; returns every rule's result map
    * (both pass and fail — the caller separates them; the reference keeps
    * only failures for `meta_agg_dq_results` but needs pass results for
    * detailed stats).
    */
  def run(df: DataFrame, rules: Seq[Rule]): Seq[Map[String, String]] = {
    require(rules.forall(_.ruleType == RuleType.AggDq.name), "agg_dq rules only")
    if (rules.isEmpty) return Seq.empty
    val ruleCols = rules.map(RuleCompiler.ruleColumn)
    val names    = rules.map(RuleCompiler.resultColName)
    val row = df.select(ruleCols: _*)
      .select(RuleCompiler.collapseAll(names).as("res"))
      .head()
    row.getSeq[scala.collection.Map[String, String]](0).map(_.toMap)
  }
}

/** Query-level rule evaluation.
  *
  * Conditions are selected against a ONE-ROW placeholder DataFrame so that
  * scalar-subquery SQL like `(select sum(x) from view) > 10` executes
  * exactly once (reference: utils/actions.py:585-587 with the placeholder
  * from core/context.py:1995-1998). Rules access data through temp views
  * registered by the orchestrator.
  */
object QueryDqEvaluator {

  def run(spark: SparkSession, rules: Seq[Rule]): Seq[Map[String, String]] = {
    require(rules.forall(_.ruleType == RuleType.QueryDq.name), "query_dq rules only")
    if (rules.isEmpty) return Seq.empty
    val ruleCols = rules.map(RuleCompiler.ruleColumn)
    val names    = rules.map(RuleCompiler.resultColName)
    val row = spark.range(1)
      .select(ruleCols: _*)
      .select(RuleCompiler.collapseAll(names).as("res"))
      .head()
    row.getSeq[scala.collection.Map[String, String]](0).map(_.toMap)
  }
}
