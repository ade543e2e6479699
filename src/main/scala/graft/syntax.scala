package graft

import graft.model.Rule
import graft.orchestrator.{DqConfig, DqResult, SparkExpectations}
import org.apache.spark.sql.DataFrame

/** User-facing sugar: the Scala equivalent of the reference's
  * `@se.with_expectations(...)` decorator (core/expectations.py:893-1032)
  * — wrap any DataFrame-producing expression:
  *
  * {{{
  * import graft.syntax._
  * val result = buildMyDf().withExpectations("product_1", "db.orders", rules)
  * result.finalDf.write.saveAsTable("db.orders")
  * }}}
  */
object syntax {
  implicit final class DqDataFrameOps(private val df: DataFrame) extends AnyVal {
    def withExpectations(
        productId: String,
        targetTable: String,
        rules: Seq[Rule],
        config: DqConfig = DqConfig()): DqResult =
      new SparkExpectations(productId, targetTable, rules, config).run(df)
  }
}
