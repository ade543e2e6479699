package graft.model

import graft.SparkSpec
import graft.notify.{Notification, NotificationPlugin, Notifier}

/** The reference's 10-class exception taxonomy (exceptions.py:1-55),
  * shimmed as typed subclasses: throw sites use the specific types so
  * ported catch-sites map 1:1.
  */
class DqExceptionsSpec extends SparkSpec {

  test("invalid rule_type / action_if_failed throw their typed exceptions") {
    val e1 = intercept[DqInvalidRuleTypeException] {
      RuleType.fromString("bogus_dq")
    }
    e1.getMessage should include ("bogus_dq")
    // widening contract: the invalid-input family still IS an
    // IllegalArgumentException, so pre-shim catch sites keep working
    e1 shouldBe an[IllegalArgumentException]
    e1 shouldBe a[DqUserInputOrConfigInvalidException]
    intercept[DqUserInputOrConfigInvalidException] {
      ActionIfFailed.fromString("explode")
    }
  }

  test("a null input frame throws DqDataFrameNotReturnedException") {
    val se = new graft.orchestrator.SparkExpectations("p", "t",
      Seq(Rule("p", "t", "row_dq", "r", "c", "c > 0", "drop")))
    intercept[DqDataFrameNotReturnedException] { se.run(null) }
  }

  test("a failing notification channel throws that channel's typed exception") {
    class Boom(val name: String) extends NotificationPlugin {
      def send(n: Notification): Unit = throw new RuntimeException("wire down")
    }
    def firstError(p: NotificationPlugin): DqNotificationException =
      intercept[DqNotificationException] {
        new Notifier(Seq(p)).onFailure("p", "t", "boom")
      }
    firstError(new Boom("email")) shouldBe a[DqEmailException]
    firstError(new Boom("slack")) shouldBe a[DqSlackNotificationException]
    firstError(new Boom("teams")) shouldBe a[DqTeamsNotificationException]
    firstError(new Boom("zoom")) shouldBe a[DqZoomNotificationException]
    firstError(new Boom("pagerduty")) shouldBe a[DqPagerDutyException]
    val generic = firstError(new Boom("carrier_pigeon"))
    generic.channel shouldBe "carrier_pigeon"
    generic.getCause.getMessage shouldBe "wire down"
  }

  test("validateOrThrow maps the violation to its rule-type's exception") {
    import graft.rules.RuleValidator
    intercept[DqInvalidRowDqExpectationException] {
      RuleValidator.validateOrThrow(spark, Seq(
        Rule("p", "t", "row_dq", "r", "c", "SELECT 1", "drop")))
    }
    intercept[DqInvalidAggDqExpectationException] {
      RuleValidator.validateOrThrow(spark, Seq(
        Rule("p", "t", "agg_dq", "r", "c", "c > 0", "drop"))) // no aggregate
    }
    intercept[DqInvalidQueryDqExpectationException] {
      RuleValidator.validateOrThrow(spark, Seq(
        Rule("p", "t", "query_dq", "r", "c", "not ( valid sql", "drop")))
    }
    intercept[DqUserInputOrConfigInvalidException] {
      RuleValidator.validateOrThrow(spark, Seq(
        Rule("p", "t", "row_dq", "r", "c", "c > 0", "explode")))
    }
    // clean rules pass silently
    RuleValidator.validateOrThrow(spark, Seq(
      Rule("p", "t", "row_dq", "r", "c", "c > 0", "drop")))
  }
}
