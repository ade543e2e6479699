package graft.notify

import graft.model.{Rule, RuleFailureSummary}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NotificationsSpec extends AnyFunSuite with Matchers {

  private def mkNotifier(min: String = "low") = {
    val sink = new InMemoryNotifier
    (new Notifier(Seq(sink), minPriority = min), sink)
  }

  test("onFailure always fires with high priority") {
    val (n, sink) = mkNotifier()
    n.onFailure("p", "t", "boom")
    sink.sent should have size 1
    sink.sent.head.kind shouldBe "failure"
    sink.sent.head.body should include ("boom")
  }

  test("priority filter suppresses below-threshold messages") {
    val (n, sink) = mkNotifier(min = "high")
    n.onStart("p", "t") // medium default -> suppressed
    sink.sent shouldBe empty
    n.onFailure("p", "t", "x") // high -> delivered
    sink.sent should have size 1
  }

  test("threshold breach lists each breached rule with pct") {
    val (n, sink) = mkNotifier()
    val s = RuleFailureSummary("r1", "row_dq", "ignore", "", "", "c",
      failedRowCount = 30, errorDropThreshold = 10, enableErrorDropAlert = true)
    n.onThresholdBreach("p", "t", Seq(s), inputCount = 100)
    sink.sent.head.body should include ("30.00%")
    sink.sent.head.body should include ("r1")
  }

  test("ignore-rule alert only covers failed ignore-action rules") {
    val (n, sink) = mkNotifier()
    val rules = Seq(
      Rule("p", "t", "row_dq", "ig", "c", "c>0", "ignore", priority = "high"),
      Rule("p", "t", "row_dq", "dr", "c", "c>0", "drop", priority = "high"))
    n.onIgnoreRuleFailures(rules, failedRuleNames = Set("ig", "dr"))
    sink.sent should have size 1
    sink.sent.head.body should include ("ig")
    (sink.sent.head.body should not).include("dr (")
  }

  test("webhook formats escape JSON payloads") {
    var posted = ""
    val hook = new WebhookNotifier("slack", WebhookFormats.slack, posted = _)
    hook.send(Notification("Ti\"tle", "line1\nline2"))
    posted shouldBe """{"text": "Ti\"tle\nline1\nline2"}"""
    WebhookFormats.teams(Notification("T", "b")) should include (""""@type": "MessageCard"""")
  }
}

class DqSettingsSpec extends graft.SparkSpec {
  import graft.config.DqSettings

  test("inferCast handles bool/int/double/string") {
    DqSettings.inferCast("true") shouldBe true
    DqSettings.inferCast("False") shouldBe false
    DqSettings.inferCast("42") shouldBe 42
    DqSettings.inferCast("4.5") shouldBe 4.5
    DqSettings.inferCast("hello") shouldBe "hello"
  }

  test("load layers defaults < spark.conf < user map") {
    spark.conf.set("spark.expectations.enable_detailed_stats", "true")
    spark.conf.set("spark.expectations.notifications.min_priority", "high")
    try {
      val cfg = DqSettings.load(spark, Map("notifications.min_priority" -> "medium"))
      DqSettings.bool(cfg, "enable_detailed_stats") shouldBe true       // spark.conf override
      DqSettings.str(cfg, "notifications.min_priority") shouldBe "medium" // user wins
      DqSettings.bool(cfg, "enable_error_table") shouldBe true           // default
    } finally {
      spark.conf.unset("spark.expectations.enable_detailed_stats")
      spark.conf.unset("spark.expectations.notifications.min_priority")
    }
  }

  test("secrets backends resolve from registry") {
    import graft.config.SecretsBackend
    SecretsBackend.register(new SecretsBackend.MapBackend(Map("k" -> "v")))
    SecretsBackend("static").get("k") shouldBe Some("v")
    SecretsBackend("env").get("PATH") shouldBe defined
    an[IllegalArgumentException] should be thrownBy SecretsBackend("vault")
  }
}
