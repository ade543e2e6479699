package graft.sink

import graft.SparkSpec
import graft.model.{DetailedStat, RunContext}

class ReportSpec extends SparkSpec {

  private val ctx = RunContext.create("p", "t")
  private def det(rule: String, status: String, failed: Long) = DetailedStat(
    ctx.runId, "p", "t", "row_dq", rule, "c", "c > 0", "tag", "d",
    status, "actual", "expected", "", "", failed)

  test("report rows derive totals and success percentage") {
    val rep = Report.build(spark, ctx,
      details = Seq(det("r1", "pass", 0), det("r2", "fail", 25)),
      queryRows = Seq(("q1", "c", "100", "98")),
      inputCount = 100)
    rep.count() shouldBe 3
    val byRule = rep.collect().map(r => r.getAs[String]("rule") -> r).toMap
    byRule("r1").getAs[java.math.BigDecimal]("success_percentage").doubleValue() shouldBe 100.0
    byRule("r2").getAs[java.math.BigDecimal]("success_percentage").doubleValue() shouldBe 75.0
    byRule("r2").getAs[Long]("valid_records") shouldBe 75
    byRule("q1").getAs[String]("status") shouldBe "fail" // 100 != 98
    byRule("q1").getAs[Long]("failed_records") shouldBe 2
    byRule("q1").getAs[java.math.BigDecimal]("success_percentage").doubleValue() shouldBe 98.0
  }

  test("alert summaries aggregate pass/fail per product and rule") {
    val rep = Report.build(spark, ctx,
      details = Seq(det("r1", "pass", 0), det("r2", "fail", 25)),
      queryRows = Seq.empty, inputCount = 100)
    val header = Report.headerSummary(spark, rep).collect()
    header should have size 1
    header.head.getAs[String]("status") shouldBe "FAIL"
    val rules = Report.ruleSummary(spark, rep).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[String]("overall_status")).toMap
    rules shouldBe Map("r1" -> "PASS", "r2" -> "FAIL")
    val detailed = Report.detailedReport(spark, rep)
    detailed.columns should contain ("success_percentage")
    Report.renderHtml("t", detailed) should include ("<table")
  }

  test("alertEmailHtml composes subject + the three reference sections") {
    val rep = Report.build(spark, ctx,
      details = Seq(det("r1", "pass", 0), det("r2", "fail", 25)),
      queryRows = Seq.empty, inputCount = 100)
    val html = Report.alertEmailHtml(spark, rep, "dq report")
    html should startWith ("<h2>dq report</h2>")
    html should include ("Summary by product ID for the run_id ")
    html should include ("Summary by Scenario :")
    html should include ("Summary by data_rule:")
    html.split("<br>") should have length 3
  }

  test("empty inputs yield an empty report with the fixed schema") {
    val rep = Report.build(spark, ctx, Seq.empty, Seq.empty, 0)
    rep.count() shouldBe 0
    rep.columns should contain allOf ("run_id", "success_percentage", "dq_time")
  }

  test("pairQueryOutputs joins source_/target_ aliases like the reference self-join") {
    import graft.orchestrator.QueryOutput
    def qo(rule: String, alias: String, out: String, side: String = "source_dq") =
      QueryOutput(ctx.runId, "p", "t", rule, "c", alias, side, out, ctx.runDate)
    val paired = Report.pairQueryOutputs(Seq(
      qo("r1", "source_count", "10"),
      qo("r1", "target_count", "9"),
      qo("r1", "source_sum", "55"),        // no target partner -> null
      qo("r1", "expected", "3"),           // unprefixed alias -> no row
      qo("r2", "source_count", "7"),
      qo("r2", "target_count", "7")))
    paired should contain theSameElementsAs Seq(
      ("r1", "c", "10", "9"),
      ("r1", "c", "55", null),
      ("r2", "c", "7", "7"))
    // rows from different capture sides never cross-pair
    val sides = Report.pairQueryOutputs(Seq(
      qo("r3", "source_count", "1", side = "source_dq"),
      qo("r3", "target_count", "2", side = "target_dq")))
    sides shouldBe Seq(("r3", "c", "1", null))
  }
}
