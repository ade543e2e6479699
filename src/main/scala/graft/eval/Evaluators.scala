package graft.eval

import graft.model.{Rule, RuleType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

/** Bitmask row-rule evaluation — the scale path used by the orchestrator.
  *
  * The map-based evaluator above matches the reference's error-table
  * shape, but building an `array<map<string,string>>` per row is
  * interpreted (higher-order functions are CodegenFallback) and bloats
  * any cache of the result (~KB/row). Rule outcomes are really just N
  * bits, so here each group of up to 64 rules compiles to ONE long
  * column: `when(expectation, 0) otherwise (1 << bit)` OR-folded — pure
  * codegen'd integer arithmetic, 8 bytes of DQ state per row. Every
  * downstream consumer (error filter, drop/fail gates, per-rule failure
  * counts) is a bitwise op, and the reference-compatible meta maps are
  * reconstructed only for the (small) error subset.
  *
  * Measured at sf0.1 (600k rows, 5 rules incl. a window rule): map-based
  * cache materialization 60 s → masked 2 s.
  */
object MaskedRowDqEvaluator {

  val MaskPrefix = "meta_dq_fail_mask_"

  def numChunks(n: Int): Int = (n + 63) / 64
  def maskColNames(n: Int): Seq[String] = (0 until numChunks(n)).map(i => s"$MaskPrefix$i")
  private def bitOf(i: Int): (String, Int) = (s"$MaskPrefix${i / 64}", i % 64)

  /** Input + one long mask column per 64 rules; bit set ⇔ rule FAILED
    * (NULL expectation result counts as failure, like the reference).
    */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.forall(_.ruleType == RuleType.RowDq.name), "row_dq rules only")
    if (rules.isEmpty) return df
    val maskCols = rules.grouped(64).zipWithIndex.map { case (chunk, ci) =>
      chunk.zipWithIndex.map { case (r, bit) =>
        when(expr(r.expectation), lit(0L)).otherwise(lit(1L << bit))
      }.reduce(_ bitwiseOR _).as(s"$MaskPrefix$ci")
    }.toSeq
    df.select(col("*") +: maskCols: _*)
  }

  /** true ⇔ at least one rule failed on the row. */
  def anyFailed(rules: Seq[Rule]): Column =
    maskColNames(rules.size).map(c => col(c) =!= 0L).reduce(_ || _)

  /** true ⇔ a failed rule on the row carries `action`. */
  def hasFailedAction(rules: Seq[Rule], action: String): Column = {
    val perChunk = rules.zipWithIndex
      .filter(_._1.actionIfFailed == action)
      .groupMap { case (_, i) => i / 64 } { case (_, i) => 1L << (i % 64) }
      .view.mapValues(_.reduce(_ | _)).toMap
    if (perChunk.isEmpty) lit(false)
    else perChunk.map { case (ci, m) =>
      col(s"$MaskPrefix$ci").bitwiseAND(lit(m)) =!= 0L
    }.reduce(_ || _)
  }

  /** The reference-shaped `meta_row_dq_results` column (failed-rule maps)
    * rebuilt from the mask — applied only where needed (error rows).
    */
  def metaColumn(rules: Seq[Rule]): Column =
    array_compact(array(rules.zipWithIndex.map { case (r, i) =>
      val (c, b) = bitOf(i)
      val props = RuleCompiler.propEntries(r) :+ ("status" -> "fail")
      when(shiftright(col(c), b).bitwiseAND(lit(1L)) === 1L,
        map(props.flatMap { case (k, v) =>
          Seq(lit(k), lit(Option(v).getOrElse(""))) }: _*))
        .otherwise(lit(null).cast("map<string,string>"))
    }: _*))

  /** Total failed-row count + per-rule failed counts in ONE global
    * aggregate over the masks (replaces the reference's explode +
    * groupBy + count shuffle, sinks/utils/writer.py:1071-1158).
    */
  def failureCounts(masked: DataFrame, rules: Seq[Rule]): (Long, Map[String, Long]) = {
    val c = pipelineCounts(masked, rules)
    (c.errorRows, c.perRule)
  }

  /** Every count the batch pipeline needs, from one scan. */
  final case class PipelineCounts(
      inputRows: Long,
      errorRows: Long,
      dropFailedRows: Long,
      perRule: Map[String, Long]) {
    def outputRows: Long = inputRows - dropFailedRows
  }

  /** The aggregate expressions behind every pipeline count — shared by
    * the dedicated fused-aggregate job (`pipelineCounts`) and the
    * zero-extra-job `Dataset.observe` path (CountsMode.OnWrite), which
    * attaches them to the final frame so the sink write itself yields
    * the counts.
    */
  def pipelineAggExprs(rules: Seq[Rule]): Seq[Column] =
    Seq(
      count(lit(1)).as("_n"),
      sum(when(anyFailed(rules), 1L).otherwise(0L)).as("_err"),
      sum(when(hasFailedAction(rules, "drop"), 1L).otherwise(0L)).as("_drop")) ++
      rules.zipWithIndex.map { case (_, i) =>
        val (c, b) = bitOf(i)
        sum(shiftright(col(c), b).bitwiseAND(lit(1L))).as(s"_c_$i")
      }

  /** Decode `pipelineAggExprs` results from a named metrics map (the
    * shape `Observation.get` returns; sums over zero rows are null).
    */
  def countsFromMetrics(rules: Seq[Rule], metrics: Map[String, Any]): PipelineCounts = {
    def l(name: String): Long = metrics.get(name) match {
      case Some(v: Long)   => v
      case Some(v: Number) => v.longValue()
      case _               => 0L
    }
    PipelineCounts(l("_n"), l("_err"), l("_drop"),
      rules.zipWithIndex.map { case (r, i) => r.rule -> l(s"_c_$i") }.toMap)
  }

  /** input/error/dropped/per-rule counts in ONE global aggregate — the
    * reference issues separate count() jobs for input, errors, and
    * output (core/expectations.py:960,660; writer.py:1061); over the
    * masks they are four flavors of the same codegen'd sum.
    */
  def pipelineCounts(masked: DataFrame, rules: Seq[Rule]): PipelineCounts = {
    if (rules.isEmpty) {
      val n = masked.count()
      return PipelineCounts(n, 0L, 0L, Map.empty)
    }
    val aggs = pipelineAggExprs(rules)
    val row = masked.agg(aggs.head, aggs.tail: _*).head()
    def l(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    PipelineCounts(l(0), l(1), l(2),
      rules.zipWithIndex.map { case (r, i) => r.rule -> l(i + 3) }.toMap)
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
