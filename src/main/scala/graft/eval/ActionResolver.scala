package graft.eval

import graft.model.DqRuleFailedException
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-row action resolution + enforcement gates.
  *
  * Reference behavior (utils/udf.py:17-42, utils/actions.py:613-690): from
  * the failed-rule maps derive the list of actions; empty → ["ignore"];
  * then enforce `fail` (abort) and `drop` (filter) actions. All of it is
  * built-in higher-order functions — no UDFs, fully codegen-friendly.
  */
object ActionResolver {

  val ActionCol = "meta_dq_actions"

  /** actions = transform(failedMaps, m -> m['action_if_failed']),
    * defaulted to ['ignore'] when no rule failed.
    */
  def actionsColumn(metaCol: String): Column = {
    val acts = transform(col(metaCol), m => element_at(m, "action_if_failed"))
    when(size(acts) === 0, array(lit("ignore"))).otherwise(acts)
  }

  def withActions(df: DataFrame, metaCol: String): DataFrame =
    df.withColumn(ActionCol, actionsColumn(metaCol))

  /** Batch fail gate: any row carrying a failed `fail`-action rule aborts
    * the run (reference: utils/actions.py:666-686). Uses `isEmpty` (one
    * cheap job with an early-out limit) instead of `count() > 0`.
    */
  def failGate(dfWithActions: DataFrame): Unit = {
    val offending = dfWithActions.filter(array_contains(col(ActionCol), "fail"))
    if (!offending.isEmpty) {
      throw new DqRuleFailedException(
        "job failed: one or more rules with action_if_failed='fail' failed",
        Seq.empty)
    }
  }

  /** Drop filter: remove rows with a failed `drop`-action rule
    * (reference: utils/actions.py:663-669). The only enforcement possible
    * on streaming DataFrames.
    */
  def dropFilter(dfWithActions: DataFrame): DataFrame =
    dfWithActions.filter(!array_contains(col(ActionCol), "drop"))
}
