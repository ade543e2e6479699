package graft.orchestrator

import graft.SparkSpec
import graft.model.Rule

/** Table-driven port of the highest-value cases from the reference's
  * parametrized integration matrix
  * (reference tests/integration/core/conftest.py:164-2963): each case
  * pins the expected FINAL rows, input/error/output counts, per-stage
  * statuses, and (where applicable) per-rule agg/query result maps —
  * the exact surface where enforcement-fidelity bugs hide.
  *
  * Reference status semantics under test: a stage is Failed only when
  * its fail-action enforcement aborts the run; ignore/drop rule
  * failures leave the stage Passed (regulate_flow.py:150-156).
  */
class GoldenMatrixSpec extends SparkSpec {
  import spark.implicits._

  // the canonical 3-row fixture (conftest.py:45-55 + col3 variants)
  private def input = Seq((1, "a", 4), (2, "b", 5), (3, "c", 6))
    .toDF("col1", "col2", "col3")

  private val P = "product1"
  private val T = "golden_tbl"

  private def row(name: String, exp: String, action: String,
                  srcV: Boolean = true, tgtV: Boolean = true) =
    Rule(P, T, "row_dq", name, "col1", exp, action,
      enableForSourceDqValidation = srcV, enableForTargetDqValidation = tgtV)
  private def agg(name: String, exp: String, action: String,
                  srcV: Boolean = true, tgtV: Boolean = false) =
    Rule(P, T, "agg_dq", name, "col1", exp, action,
      enableForSourceDqValidation = srcV, enableForTargetDqValidation = tgtV)
  private def qry(name: String, exp: String, action: String,
                  srcV: Boolean = true, tgtV: Boolean = false) =
    Rule(P, T, "query_dq", name, "col1", exp, action,
      enableForSourceDqValidation = srcV, enableForTargetDqValidation = tgtV)

  /** One golden case: expected final col1 set (None = run aborts),
    * counts, and the per-stage status sextet like the reference matrix.
    */
  private final case class Golden(
      name: String,
      rules: Seq[Rule],
      finalCol1: Option[Set[Int]],
      inputCount: Long, errorCount: Long, outputCount: Long,
      statuses: Map[String, String],
      check: DqResult => Unit = _ => ())

  private def statusMap(row: String = "Skipped", srcAgg: String = "Skipped",
                        finAgg: String = "Skipped", run: String = "Passed",
                        srcQry: String = "Skipped", finQry: String = "Skipped") =
    Map("row_dq" -> row, "source_agg_dq" -> srcAgg, "final_agg_dq" -> finAgg,
      "run_status" -> run, "source_query_dq" -> srcQry, "final_query_dq" -> finQry)

  private def ruleStatus(res: Seq[Map[String, String]]): Map[String, String] =
    res.map(m => m("rule") -> m("status")).toMap

  private val cases = Seq(
    // conftest case 0: ignore keeps all rows, logs 1 error, stage Passed
    Golden("row ignore: all rows survive, one error logged",
      Seq(row("col1_threshold", "col1 > 1", "ignore")),
      Some(Set(1, 2, 3)), 3, 1, 3, statusMap(row = "Passed")),

    // conftest case 1: drop removes the failing row from final only
    Golden("row drop: failing row removed from final",
      Seq(row("col1_threshold", "col1 > 1", "drop")),
      Some(Set(2, 3)), 3, 1, 2, statusMap(row = "Passed")),

    // conftest case 2: fail aborts the run, stats still assembled
    Golden("row fail: aborts with row_dq Failed",
      Seq(row("col1_threshold", "col1 > 1", "fail")),
      None, 3, 1, 0, statusMap(row = "Failed", run = "Failed")),

    // conftest case 3: ignore + drop combine; error rows = any-failure rows
    Golden("row ignore+drop: drop filters, ignore only logs",
      Seq(row("col3_gt5_ig", "col3 > 5", "ignore"),
        row("col1_ge2_dr", "col1 >= 2", "drop")),
      Some(Set(2, 3)), 3, 2, 2, statusMap(row = "Passed")),

    // conftest case 4: ignore + fail where the fail rule passes
    Golden("row ignore+fail(passing): no abort",
      Seq(row("col3_gt5_ig", "col3 > 5", "ignore"),
        row("col1_gt0_fl", "col1 > 0", "fail")),
      Some(Set(1, 2, 3)), 3, 2, 3, statusMap(row = "Passed")),

    // conftest case 5: drop + fail where the fail rule fails -> abort
    Golden("row drop+fail(failing): abort wins over drop",
      Seq(row("col1_ge2_dr", "col1 >= 2", "drop"),
        row("col3_gt5_fl", "col3 > 5", "fail")),
      None, 3, 2, 0, statusMap(row = "Failed", run = "Failed")),

    // conftest case 7: ignore + drop + fail(passing) all at once
    Golden("row ignore+drop+fail(passing): drop filters, rest log",
      Seq(row("col3_gt4_ig", "col3 > 4", "ignore"),
        row("col1_ge2_dr", "col1 >= 2", "drop"),
        row("col1_gt0_fl", "col1 > 0", "fail")),
      Some(Set(2, 3)), 3, 1, 2, statusMap(row = "Passed")),

    // conftest case 8: source agg ignore failing -> stage still Passed,
    // result map carries the fail; output_count stays 0 (no row stage)
    Golden("source agg ignore(failing): Passed stage, fail result",
      Seq(agg("sum_col3_threshold", "sum(col3) > 20", "ignore")),
      Some(Set(1, 2, 3)), 3, 0, 0, statusMap(srcAgg = "Passed"),
      res => ruleStatus(res.sourceAggResults) shouldBe Map("sum_col3_threshold" -> "fail")),

    // conftest case 9: source agg fail failing -> abort before row stage
    Golden("source agg fail(failing): abort, input still counted",
      Seq(agg("avg_col3_threshold", "avg(col3) > 25", "fail"),
        row("col1_gt0", "col1 > 0", "drop")),
      None, 3, 0, 0,
      statusMap(srcAgg = "Failed", run = "Failed")),

    // conftest case 10: row drop + final agg ignore failing on survivors
    Golden("final agg ignore(failing) after drop",
      Seq(row("col2_in", "col2 in ('a', 'c')", "drop",
          srcV = false, tgtV = false),
        agg("min_col1_gt10", "min(col1) > 10", "ignore",
          srcV = false, tgtV = true)),
      Some(Set(1, 3)), 3, 1, 2,
      statusMap(row = "Passed", finAgg = "Passed"),
      res => ruleStatus(res.targetAggResults) shouldBe Map("min_col1_gt10" -> "fail")),

    // conftest cases 12-14 shape: row + source agg + final agg together
    Golden("row + source agg + final agg all pass/report",
      Seq(row("col1_gt1", "col1 > 1", "drop"),
        agg("sum_col1_gt3", "sum(col1) > 3", "ignore", srcV = true, tgtV = true)),
      Some(Set(2, 3)), 3, 1, 2,
      statusMap(row = "Passed", srcAgg = "Passed", finAgg = "Passed"),
      res => {
        ruleStatus(res.sourceAggResults) shouldBe Map("sum_col1_gt3" -> "pass")
        ruleStatus(res.targetAggResults) shouldBe Map("sum_col1_gt3" -> "pass") // 2+3 > 3
      }),

    // conftest case 17 shape: source query ignore failing
    Golden("source query ignore(failing): Passed stage, fail result",
      Seq(qry("min_col1_threshold",
        s"(select min(col1) from ${T}_source) > 10", "ignore")),
      Some(Set(1, 2, 3)), 3, 0, 0, statusMap(srcQry = "Passed"),
      res => ruleStatus(res.sourceQueryResults) shouldBe Map("min_col1_threshold" -> "fail")),

    // conftest case 18/21 shape: target query fail failing after row drop
    Golden("target query fail(failing): abort after row stage",
      Seq(row("col1_gt1", "col1 > 1", "drop"),
        qry("max_col1_threshold",
          s"(select max(col1) from ${T}_target) > 100", "fail",
          srcV = false, tgtV = true)),
      None, 3, 1, 2,
      statusMap(row = "Passed", finQry = "Failed", run = "Failed")),

    // conftest case 20 shape: row drop + source/target query mix
    Golden("row drop + source query ignore + target query pass",
      Seq(row("col3_mod_2", "(col3 % 2) = 0", "drop",
          srcV = false, tgtV = false),
        qry("min_col1_threshold",
          s"(select min(col1) from ${T}_source) > 10", "ignore"),
        qry("min_col3_threshold",
          s"(select min(col3) from ${T}_target) > 0", "fail",
          srcV = false, tgtV = true)),
      Some(Set(1, 3)), 3, 1, 2,
      statusMap(row = "Passed", srcQry = "Passed", finQry = "Passed"),
      res => {
        ruleStatus(res.sourceQueryResults) shouldBe Map("min_col1_threshold" -> "fail")
        ruleStatus(res.targetQueryResults) shouldBe Map("min_col3_threshold" -> "pass")
      }),

    // conftest case 26 shape: parameterized query rule
    Golden("parameterized query rule substitutes {env} table",
      Seq(qry("param_count", "(select count(*) from {src_view}) = 3", "fail")),
      Some(Set(1, 2, 3)), 3, 0, 0, statusMap(srcQry = "Passed")),

    // is_active=false rules are skipped entirely (reference reader
    // filters on is_active, utils/reader.py): the would-drop-everything
    // rule must not run, and its stage stays Skipped
    Golden("inactive rule is skipped: no drop, stage Skipped",
      Seq(row("col1_gt99_off", "col1 > 99", "drop").copy(isActive = false)),
      Some(Set(1, 2, 3)), 3, 0, 0, statusMap()),

    // source query fail(failing) aborts BEFORE the row stage (mirror of
    // the source-agg abort case at the query stage)
    Golden("source query fail(failing): abort before row stage",
      Seq(qry("count_gt99", s"(select count(*) from ${T}_source) > 99", "fail"),
        row("col1_gt0", "col1 > 0", "drop")),
      None, 3, 0, 0, statusMap(srcQry = "Failed", run = "Failed")),

    // every row fails a drop rule: final is empty, run still Passed
    Golden("drop removes ALL rows: empty final, Passed run",
      Seq(row("col1_gt99", "col1 > 99", "drop")),
      Some(Set.empty), 3, 3, 0, statusMap(row = "Passed"))
  )

  // ---- cases needing non-canonical inputs ---------------------------

  test("null expectation result counts as a row failure (when() null-as-false)") {
    // reference: F.expr(expectation) inside when() — a NULL verdict is
    // not true, so the row lands in the error set exactly like false
    val withNull = Seq((1, "a", Some(4)), (2, "b", None), (3, "c", Some(6)))
      .toDF("col1", "col2", "col3")
    val se = new SparkExpectations(P, T,
      Seq(row("col3_gt4", "col3 > 4", "drop")), DqConfig())
    val res = se.run(withNull)
    res.finalDf.select("col1").collect().map(_.getInt(0)).toSet shouldBe Set(3)
    res.stats.errorCount shouldBe 2 // row 1 fails (4 > 4 false), row 2 null
    res.unpersist()
  }

  test("empty input: zero counts, zero percentages, no NaN, stages pass") {
    val empty = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), input.schema)
    val se = new SparkExpectations(P, T, Seq(
      row("col1_gt1", "col1 > 1", "drop"),
      agg("sum_col1", "sum(col1) > 0", "ignore")), DqConfig())
    val res = se.run(empty)
    res.stats.inputCount shouldBe 0
    res.stats.errorCount shouldBe 0
    res.stats.outputCount shouldBe 0
    // reference context.py:1689-1702: percentages are 0.0 at input_count=0
    res.stats.successPercentage shouldBe 0.0
    res.stats.outputPercentage shouldBe 0.0
    res.stats.errorPercentage shouldBe 0.0
    res.statuses("row_dq") shouldBe "Passed"
    res.unpersist()
  }

  test("target-only agg fail(failing) aborts AFTER the row stage ran") {
    val ex = intercept[DqRunAbortedException] {
      new SparkExpectations(P, T, Seq(
        row("col1_gt1", "col1 > 1", "drop"),
        agg("max_col1_gt99", "max(col1) > 99", "fail", srcV = false, tgtV = true)),
        DqConfig()).run(input)
    }
    ex.stats.inputCount shouldBe 3
    ex.stats.errorCount shouldBe 1
    ex.stats.outputCount shouldBe 2 // drop survivors counted before the abort
    ex.stats.dqStatus("row_dq") shouldBe "Passed"
    ex.stats.dqStatus("final_agg_dq") shouldBe "Failed"
    ex.stats.dqStatus("run_status") shouldBe "Failed"
  }

  test("error-drop threshold breach lands in stats with the reference percentages") {
    val se = new SparkExpectations(P, T, Seq(
      Rule(P, T, "row_dq", "col1_gt2", "col1", "col1 > 2", "drop",
        enableErrorDropAlert = true, errorDropThreshold = 10)), DqConfig())
    val res = se.run(input)
    res.stats.errorCount shouldBe 2 // rows 1,2 fail -> 66.67% > 10%
    val th = res.stats.rowDqErrorThreshold
    th should have size 1
    th.head("rule") shouldBe "col1_gt2"
    th.head("error_drop_percentage").toDouble shouldBe 66.67 +- 0.01
    res.unpersist()
  }

  test("reference target_table_view naming: {table}_view default and custom override") {
    // reference core/expectations.py:941 — target query_dq SQL written
    // against `{target_table}_view` runs unchanged here
    val res = new SparkExpectations(P, T, Seq(
      row("col1_gt0", "col1 > 0", "drop"),
      qry("ref_view_count", s"(select count(*) from ${T}_view) = 3", "fail",
        srcV = false, tgtV = true)), DqConfig()).run(input)
    ruleStatus(res.targetQueryResults) shouldBe Map("ref_view_count" -> "pass")
    res.unpersist()

    val custom = new SparkExpectations(P, T, Seq(
      row("col1_gt0", "col1 > 0", "drop"),
      qry("custom_view_count", "(select count(*) from my_custom_view) = 3", "fail",
        srcV = false, tgtV = true)),
      DqConfig(targetTableView = Some("my_custom_view"))).run(input)
    ruleStatus(custom.targetQueryResults) shouldBe Map("custom_view_count" -> "pass")
    custom.unpersist()
  }

  test("agg between-form expectations evaluate pass and fail in one stage") {
    val res = new SparkExpectations(P, T, Seq(
      agg("sum_in_range", "sum(col1) between 5 and 10", "ignore"),
      agg("avg_out_of_range", "avg(col1) between 10 and 20", "ignore")),
      DqConfig()).run(input)
    ruleStatus(res.sourceAggResults) shouldBe Map(
      "sum_in_range" -> "pass", "avg_out_of_range" -> "fail")
    res.statuses("source_agg_dq") shouldBe "Passed" // ignore never fails the stage
    res.unpersist()
  }

  test("agg rules compare in their native types (reference non-int-column matrix)") {
    // reference test_agg_rule_for_non_int_column: min/max over DATE and
    // STRING columns with <, >=, > comparators must evaluate as their
    // native types in BOTH the pass/fail result and the detailed stats
    // (a driver-side numeric coercion would mark every one "fail")
    import org.apache.spark.sql.functions.{col, to_date}
    val d = Seq(("A", "2030-01-01"), ("D", "2022-01-01")).toDF("str", "dts")
      .select(col("str"), to_date(col("dts")).as("dt"))
    val res = new SparkExpectations(P, T, Seq(
      agg("r1_min_dt", "min(dt) < current_date()", "fail"),
      agg("r2_max_dt", "max(dt) >= current_date()", "fail"),
      agg("r3_min_str", "min(str) < 'B'", "fail"),
      agg("r4_max_str", "max(str) > 'B'", "fail"),
      agg("r5_max_str_fails", "max(str) > 'Z'", "ignore")),
      DqConfig(enableDetailedStats = true)).run(d)
    ruleStatus(res.sourceAggResults) shouldBe Map(
      "r1_min_dt" -> "pass", "r2_max_dt" -> "pass",
      "r3_min_str" -> "pass", "r4_max_str" -> "pass",
      "r5_max_str_fails" -> "fail")
    val detailed = res.sourceDetailedStats.map(s => s.rule -> s.status).toMap
    detailed shouldBe Map(
      "r1_min_dt" -> "pass", "r2_max_dt" -> "pass",
      "r3_min_str" -> "pass", "r4_max_str" -> "pass",
      "r5_max_str_fails" -> "fail")
    // actual values surface as the native rendering, not a coerced double
    res.sourceDetailedStats.find(_.rule == "r3_min_str").get.actualValue shouldBe "A"
    res.sourceDetailedStats.find(_.rule == "r1_min_dt").get.actualValue shouldBe "2022-01-01"
    res.unpersist()
  }

  test("invalid rules are logged, surfaced, and do not abort the run") {
    // reference test_with_expectations_invalid_rules_do_not_raise_exception
    // + _check_invalid_rules (core/expectations.py:416-441): validation is
    // non-blocking — warnings surface, valid rules still enforce
    val res = new SparkExpectations(P, T, Seq(
      row("col1_gt1", "col1 > 1", "drop"),
      row("bad_action", "col1 > 0", "warn"),            // invalid action
      agg("bad_agg_no_aggregate", "col1 > 0", "ignore")), // no aggregate fn
      DqConfig()).run(input)
    res.finalDf.select("col1").collect().map(_.getInt(0)).toSet shouldBe Set(2, 3)
    res.validationWarnings.map(_.rule.rule).toSet shouldBe
      Set("bad_action", "bad_agg_no_aggregate")
    res.statuses("run_status") shouldBe "Passed"
    res.unpersist()
  }

  test("pre-flight probe flags rules referencing missing columns without aborting") {
    // reference: validate_rules.py:331 probes df.selectExpr(e).limit(1);
    // here the probe is analysis-only and the finding is non-blocking
    val res = new SparkExpectations(P, T, Seq(
      row("col1_gt1", "col1 > 1", "drop"),
      // never evaluated by any stage, but the probe still catches it
      agg("ghost_col", "sum(no_such_col) > 0", "ignore")
        .copy(enableForSourceDqValidation = false,
          enableForTargetDqValidation = false)),
      DqConfig()).run(input)
    res.finalDf.select("col1").collect().map(_.getInt(0)).toSet shouldBe Set(2, 3)
    res.validationWarnings.map(_.rule.rule) should contain ("ghost_col")
    res.validationWarnings.find(_.rule.rule == "ghost_col").get
      .problem should include ("probe failed")
    res.statuses("run_status") shouldBe "Passed"
    res.unpersist()
  }

  cases.foreach { g =>
    test(g.name) {
      val cfg = DqConfig(params = Map("src_view" -> s"${T}_source"))
      val se = new SparkExpectations(P, T, g.rules, cfg)
      g.finalCol1 match {
        case Some(expected) =>
          val res = se.run(input)
          res.finalDf.select("col1").collect().map(_.getInt(0)).toSet shouldBe expected
          // final frame keeps the input schema (expected_output DF shape)
          res.finalDf.columns.toSeq shouldBe Seq("col1", "col2", "col3")
          res.stats.inputCount shouldBe g.inputCount
          res.stats.errorCount shouldBe g.errorCount
          res.stats.outputCount shouldBe g.outputCount
          g.statuses.foreach { case (k, v) =>
            withClue(s"status $k:") { res.statuses(k) shouldBe v }
          }
          g.check(res)
        case None =>
          val ex = intercept[DqRunAbortedException] { se.run(input) }
          ex.stats.inputCount shouldBe g.inputCount
          ex.stats.errorCount shouldBe g.errorCount
          ex.stats.outputCount shouldBe g.outputCount
          g.statuses.foreach { case (k, v) =>
            withClue(s"status $k:") { ex.stats.dqStatus(k) shouldBe v }
          }
      }
    }
  }
}
