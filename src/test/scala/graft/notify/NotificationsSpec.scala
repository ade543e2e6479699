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

  test("zoom payload doubles newlines and uses the fixed SE card") {
    val json = WebhookFormats.zoom(Notification("Job failed", "p: x\nt: y"))
    json should include (""""title": "SE Notification"""")
    json should include (""""themeColor": "008000"""")
    json should include ("""Job failed\n\np: x\n\nt: y""")
  }

  test("pagerduty pages only on failure kinds, with the dedup key") {
    var posted = Seq.empty[String]
    val pd = new PagerDutyNotifier("prod1", "tbl1", "rk-123", p => posted :+= p)
    pd.send(Notification("started", "x", kind = "start"))
    pd.send(Notification("done", "x", kind = "completion"))
    pd.send(Notification("ignored rules", "x", kind = "ignore_rules"))
    posted shouldBe empty // informational kinds never page (pagerduty.py:95-99)
    pd.send(Notification("Spark expectations job failed", "error: boom", kind = "failure"))
    pd.send(Notification("Error drop threshold breached", "r1 30%", kind = "threshold"))
    posted should have size 2
    val json = posted.head
    json should include (""""routing_key": "rk-123"""")
    json should include (""""dedup_key": "spark_expectations_prod1_tbl1_failure"""")
    json should include (""""event_action": "trigger"""")
    json should include (""""source": "Spark Expectations"""")
    json should include (""""severity": "error"""")
    json should include ("""Spark expectations job failed\nerror: boom""")
  }

  test("email renders a MIME multipart with headers and plain body") {
    var sent = Seq.empty[EmailMessage]
    val cfg = EmailConfig(from = "dq@example.com",
      to = "a@example.com, b@example.com", subject = "DQ report")
    val mail = new EmailNotifier(cfg, sent :+= _)
    mail.send(Notification("Job completed", "input_count: 10\nerror_count: 1"))
    sent should have size 1
    val m = sent.head
    m.from shouldBe "dq@example.com"
    m.recipients shouldBe Seq("a@example.com", "b@example.com") // split like email.py:186
    m.mime should include ("From: dq@example.com\r\n")
    m.mime should include ("To: a@example.com, b@example.com\r\n")
    m.mime should include ("Subject: DQ report\r\n")
    m.mime should include ("MIME-Version: 1.0\r\n")
    m.mime should include ("""Content-Type: multipart/mixed; boundary=""")
    m.mime should include ("Content-Type: text/plain")
    m.mime should include ("Job completed\ninput_count: 10\nerror_count: 1")
  }

  test("email basic template renders title + k:v rows as an HTML table") {
    val cfg = EmailConfig(from = "f@x", to = "t@x", subject = "Subj",
      templatedBasicBody = true)
    val m = EmailNotifier.render(cfg,
      Notification("Job <done>", "input_count: 10\nnot a row\nerror_count: 1"))
    m.mime should include ("Content-Type: text/html")
    m.mime should include ("<h2>Subj</h2>")
    m.mime should include ("<h3>Job &lt;done&gt;</h3>")
    m.mime should include ("<tr><td>input_count</td><td>10</td></tr>")
    m.mime should include ("<tr><td>error_count</td><td>1</td></tr>")
    (m.mime should not).include("not a row") // rows need a colon (email.py:141-144)
  }

  test("email basic template golden render matches the reference default structure") {
    // golden: the reference's shipped basic_email_alert_template.jinja
    // element tree — h2 subject, style block, h3 title, bordered table
    // with tbody of two-cell rows (email.py:127-149)
    val body = EmailNotifier.basicHtmlBody("Subj",
      "Run summary\nproduct_id: p1\nstatus: pass")
    body shouldBe
      "<h2>Subj</h2>" + EmailNotifier.DefaultStyle + "<h3>Run summary</h3>" +
        "<table border=1><tbody>" +
        "<tr><td>product_id</td><td>p1</td></tr>" +
        "<tr><td>status</td><td>pass</td></tr>" +
        "</tbody></table>"
    EmailNotifier.DefaultStyle should include ("border-collapse: collapse")
    EmailNotifier.DefaultStyle should include ("width: 60%")
    EmailNotifier.DefaultStyle should include ("tr:nth-child(even)")
  }

  test("notifier fans a completion out to email + pagerduty + zoom together") {
    val sink = new InMemoryNotifier
    var mails = 0; var pages = 0; var zooms = 0
    val plugins = Seq(
      sink,
      new EmailNotifier(EmailConfig("f@x", "t@x", "s"), _ => mails += 1),
      new PagerDutyNotifier("p", "t", "rk", _ => pages += 1),
      new WebhookNotifier("zoom", WebhookFormats.zoom, _ => zooms += 1))
    val n = new Notifier(plugins)
    val stats = graft.model.DqStats("p", "t", 10, 1, 9, 90.0, 90.0, 10.0,
      Nil, Nil, Nil, Nil, Map.empty, Map.empty, Map.empty, Nil, Nil,
      "run1", new java.sql.Timestamp(0L))
    n.onCompletion(stats)
    n.onFailure("p", "t", "boom")
    mails shouldBe 2
    zooms shouldBe 2
    pages shouldBe 1 // completion is not a failure scenario
    sink.sent should have size 2
  }

  test("custom email body renders the declared stats keys as JSON") {
    val sink = new InMemoryNotifier
    val stats = graft.model.DqStats("p7", "t7", 10, 1, 9, 90.0, 90.0, 10.0,
      Nil, Nil, Nil, Nil, Map("run_status" -> "Passed"), Map.empty, Map.empty,
      Nil, Nil, "run1", new java.sql.Timestamp(0L))
    val template = "Stats are: 'product_id': {} and 'input_count': {} " +
      "and 'no_such_key': {} and 'error_percentage': {}"
    new Notifier(Seq(sink), customBody = Some(template)).onCompletion(stats)
    val body = sink.sent.head.body
    body should startWith ("CUSTOM EMAIL\n")
    // declared keys in template order, json.dumps-style separators
    // ("k": v with a space — the form the reference's tests pin); the
    // unknown key skipped (with a warning)
    body should include ("\"product_id\": \"p7\"")
    body should include ("\"input_count\": 10")
    body should include ("\"error_percentage\": 10.0")
    body should not include "no_such_key"
    // nested dicts render with the same spaced separators
    val tmpl2 = "'dq_status': {}"
    new Notifier(Seq(sink), customBody = Some(tmpl2)).onCompletion(stats)
    sink.sent.last.body should include ("{\"run_status\": \"Passed\"}")
    // a template with no placeholders raises, like the reference
    an[IllegalArgumentException] should be thrownBy
      new Notifier(Seq(sink), customBody = Some("no placeholders here"))
        .onCompletion(stats)
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
