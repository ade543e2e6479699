package graft.orchestrator

import graft.SparkSpec
import graft.model.Rule
import graft.notify.{EmailConfig, EmailMessage, EmailNotifier, InMemoryNotifier, Notifier, PagerDutyNotifier}
import graft.sink.{Report, StatsBuilder, TableWriter, WriterConfig}
import org.apache.spark.sql.functions._

/** The reference's "wrap-and-write" happy path, end-to-end: one
  * `withExpectations` call driving EVERY sink at once — error table,
  * target table, stats row, detailed-stats table, report + alert
  * summary, Kafka-shaped stats payload, and the notification fan-out
  * (reference: the decorator composition in core/expectations.py:893-1032
  * + sinks/utils/writer.py + notifications/push).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("withExpectations drives error/target/stats/report/notify sinks in one run") {
    import graft.syntax._
    val root = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val input = Seq((1, "a", 4), (2, "b", 5), (3, "c", 6))
      .toDF("col1", "col2", "col3")

    val inMem = new InMemoryNotifier
    var mails = Seq.empty[EmailMessage]
    var pages = Seq.empty[String]
    val notifier = new Notifier(Seq(
      inMem,
      new EmailNotifier(EmailConfig("dq@x", "team@x", "DQ run"), mails :+= _),
      new PagerDutyNotifier("p1", "e2e_tbl", "rk", pages :+= _)))

    val rules = Seq(
      Rule("p1", "e2e_tbl", "row_dq", "col1_gt1", "col1", "col1 > 1", "drop",
        enableErrorDropAlert = true, errorDropThreshold = 10),
      Rule("p1", "e2e_tbl", "row_dq", "col3_gt4", "col3", "col3 > 4", "ignore"),
      Rule("p1", "e2e_tbl", "agg_dq", "sum_col1", "col1", "sum(col1) > 3",
        enableForSourceDqValidation = true, enableForTargetDqValidation = true),
      Rule("p1", "e2e_tbl", "query_dq", "src_count", "",
        "(select count(*) from e2e_tbl_source) = 3"))

    val res = input.withExpectations("p1", "e2e_tbl", rules, DqConfig(
      writeErrorTablePath = Some(s"$root/error"),
      writeTargetTablePath = Some(s"$root/target"),
      notifier = Some(notifier),
      enableDetailedStats = true))

    // target table: drop-filtered survivors with the input schema
    val target = spark.read.parquet(s"$root/target")
    target.select("col1").collect().map(_.getInt(0)).toSet shouldBe Set(2, 3)
    target.columns.toSeq shouldBe Seq("col1", "col2", "col3")

    // error table: any-failure rows + meta + run-id columns
    val error = spark.read.parquet(s"$root/error")
    error.count() shouldBe 1 // row (1,a,4) fails both rules; rows 2/3 pass
    error.columns should contain allOf ("meta_row_dq_results",
      "meta_dq_run_id", "meta_dq_run_datetime")

    // stats: the one-aggregate pipeline counts
    res.stats.inputCount shouldBe 3
    res.stats.outputCount shouldBe 2
    res.stats.successPercentage shouldBe 66.67 +- 0.01

    // stats table write (mergeSchema-defaulted) + Kafka-shaped payload
    val statsDf = StatsBuilder.toDataFrame(spark, res.stats)
    TableWriter.writeStatsPath(statsDf, s"$root/stats", WriterConfig(mode = "append"))
    spark.read.parquet(s"$root/stats").count() shouldBe 1
    val kafka = StatsBuilder.toKafkaPayload(statsDf)
    kafka.columns.toSeq shouldBe Seq("value")
    kafka.head().getString(0) should include (""""productId":"p1"""")

    // detailed stats table: row rules + agg rule, source+target joined
    res.detailedStatsDf(spark).count() should be >= 3L

    // report + alert summary over the run's detailed stats
    val ctx = graft.model.RunContext.create("p1", "e2e_tbl")
    val report = Report.build(spark, ctx, res.sourceDetailedStats,
      queryRows = Seq.empty, inputCount = res.stats.inputCount)
    report.filter($"rule" === "col1_gt1").head()
      .getAs[Long]("failed_records") shouldBe 1L

    // notifications: start + completion in-memory; email got both; the
    // pager stayed quiet (run passed, no threshold breach at 33%>10 ... )
    inMem.sent.map(_.kind) should contain allOf ("start", "completion")
    mails.size shouldBe inMem.sent.size
    // threshold: col1_gt1 failed 33% > 10% with alert enabled -> paged
    inMem.sent.map(_.kind) should contain ("threshold")
    pages should have size 1

    res.unpersist()
  }

  test("statsTable auto-persists the stats row, detailed table, and query outputs") {
    import graft.syntax._
    val tables = Seq("e2e_stats", "e2e_stats_detailed", "e2e_stats_querydq_output")
    try {
      val input = Seq((1, "a"), (2, "b"), (3, "c")).toDF("col1", "col2")
      val rules = Seq(
        Rule("p1", "e2e_st", "row_dq", "pos", "col1", "col1 > 1", "ignore"),
        Rule("p1", "e2e_st", "agg_dq", "n", "col1", "count(col1) = 3",
          enableForSourceDqValidation = true),
        Rule("p1", "e2e_st", "query_dq", "cmp", "col1",
          "({src}) = 3@src@select count(*) from e2e_st_source",
          enableQuerydqCustomOutput = true))
      val res = input.withExpectations("p1", "e2e_st", rules, DqConfig(
        statsTable = Some("e2e_stats"),
        enableDetailedStats = true,
        enableQueryDqDetailedResult = true))
      spark.table("e2e_stats").count() shouldBe 1
      spark.table("e2e_stats").select("productId").head().getString(0) shouldBe "p1"
      spark.table("e2e_stats_detailed").count() should be >= 2L
      // captured on BOTH stages (source_dq + target_dq), reference-style
      spark.table("e2e_stats_querydq_output").count() shouldBe 2
      spark.table("e2e_stats_querydq_output").select("dqType")
        .collect().map(_.getString(0)).sorted shouldBe Array("source_dq", "target_dq")
      res.unpersist()

      // abort path still appends a stats row (collect_statistics contract)
      val failRules = Seq(Rule("p1", "e2e_st", "row_dq", "never", "col1",
        "col1 > 99", "fail"))
      intercept[DqRunAbortedException] {
        input.withExpectations("p1", "e2e_st", failRules,
          DqConfig(statsTable = Some("e2e_stats")))
      }
      spark.table("e2e_stats").count() shouldBe 2
    } finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("failing run still writes stats and pages on the failure") {
    import graft.syntax._
    val input = Seq((1, "a"), (2, "b")).toDF("col1", "col2")
    val inMem = new InMemoryNotifier
    var pages = Seq.empty[String]
    val notifier = new Notifier(Seq(inMem, new PagerDutyNotifier("p1", "t", "rk", pages :+= _)))
    val rules = Seq(Rule("p1", "t", "row_dq", "never", "col1", "col1 > 99", "fail"))
    val ex = intercept[DqRunAbortedException] {
      input.withExpectations("p1", "t", rules, DqConfig(notifier = Some(notifier)))
    }
    ex.stats.inputCount shouldBe 2
    ex.stats.errorCount shouldBe 2
    inMem.sent.map(_.kind) should contain ("failure")
    pages.size should be >= 1 // job failure pages the on-call
  }

  test("obs report flag builds the report table; alert flag fans out the HTML") {
    import graft.syntax._
    val inMem = new InMemoryNotifier
    val input = Seq((1, "a"), (2, "b"), (3, "c")).toDF("col1", "col2")
    val rules = Seq(
      Rule("p1", "e2e_obs", "row_dq", "col1_gt1", "col1", "col1 > 1", "ignore"),
      Rule("p1", "e2e_obs", "agg_dq", "n", "col1", "count(col1) = 3"))
    val res = input.withExpectations("p1", "e2e_obs", rules, DqConfig(
      notifier = Some(new Notifier(Seq(inMem))),
      enableObsReport = true,
      enableObsAlert = true))
    // report rows exist even though enableDetailedStats was NOT set:
    // the report flag implies the detailed rows it is built from
    val rep = res.reportDf.getOrElse(fail("reportDf missing"))
    rep.filter($"rule" === "col1_gt1").head()
      .getAs[Long]("failed_records") shouldBe 1L
    // the alert went through the notifier as rendered HTML
    val alert = inMem.sent.filter(_.kind == "obs_report")
    alert should have size 1
    alert.head.body should include ("<table")
    alert.head.title should include ("p1")
    res.unpersist()

    // report off -> no frame, no alert
    val off = input.withExpectations("p1", "e2e_obs", rules, DqConfig(
      notifier = Some(new Notifier(Seq(new InMemoryNotifier)))))
    off.reportDf shouldBe None
    off.unpersist()
  }
}
