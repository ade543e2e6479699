package graft.eval

import graft.SparkSpec
import graft.model.{DqRuleFailedException, Rule}
import org.apache.spark.sql.functions._

class ActionResolverSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((0, 1), (1, 2), (2, 3), (3, 50)).toDF("row_id", "col1")

  private def evaluated(rules: Seq[Rule]) = RowDqEvaluator.run(df, rules)

  test("actions default to ['ignore'] when nothing failed") {
    val rules = Seq(Rule("p", "t", "row_dq", "always", "col1", "col1 >= 0", "drop"))
    val out = ActionResolver.withActions(evaluated(rules), RowDqEvaluator.metaColName)
    out.select(col(ActionResolver.ActionCol)).collect()
      .map(_.getSeq[String](0).toList) should contain only List("ignore")
  }

  test("dropFilter removes rows with a failed drop rule") {
    val rules = Seq(
      Rule("p", "t", "row_dq", "cap", "col1", "col1 <= 10", "drop"),
      Rule("p", "t", "row_dq", "floor", "col1", "col1 > 1", "ignore"))
    val withA = ActionResolver.withActions(evaluated(rules), RowDqEvaluator.metaColName)
    val kept = ActionResolver.dropFilter(withA).select("row_id")
      .collect().map(_.getInt(0)).sorted
    kept shouldBe Array(0, 1, 2) // row 3 (col1=50) dropped; row 0 only has ignore-failure
  }

  test("failGate throws when a fail-action rule failed") {
    val rules = Seq(Rule("p", "t", "row_dq", "cap", "col1", "col1 <= 10", "fail"))
    val withA = ActionResolver.withActions(evaluated(rules), RowDqEvaluator.metaColName)
    a[DqRuleFailedException] should be thrownBy ActionResolver.failGate(withA)
  }

  test("failGate passes when only ignore/drop rules failed") {
    val rules = Seq(
      Rule("p", "t", "row_dq", "cap", "col1", "col1 <= 10", "drop"),
      Rule("p", "t", "row_dq", "floor", "col1", "col1 > 1", "ignore"))
    val withA = ActionResolver.withActions(evaluated(rules), RowDqEvaluator.metaColName)
    noException should be thrownBy ActionResolver.failGate(withA)
  }
}
