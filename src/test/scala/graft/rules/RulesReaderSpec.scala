package graft.rules

import graft.SparkSpec
import graft.model.{Rule, RuleType}
import org.apache.spark.sql.Row

class RulesReaderSpec extends SparkSpec {

  private def rulesDf = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("p1", "t1", "row_dq", "r1", "c1", "c1 > 0", "drop", "tag", "d",
        true, true, true, false, 10, "@", false, "medium"),
      Row("p1", "t1", "agg_dq", "r2", "c1", "sum(c1) > 0", "ignore", "tag", "d",
        true, false, true, false, 10, "@", false, "high"),
      Row("p1", "t1", "row_dq", "r_off", "c1", "c1 > 5", "drop", "tag", "d",
        true, true, false, false, 10, "@", false, "medium"),
      Row("p2", "t1", "row_dq", "r3", "c1", "c1 > 9", "drop", "tag", "d",
        true, true, true, false, 10, "@", false, "medium"))),
    Rule.schema)

  test("filterRules keeps only matching active rules") {
    val out = RulesReader.filterRules(rulesDf, "p1", "t1")
    out.count() shouldBe 2
    out.select("rule").collect().map(_.getString(0)).sorted shouldBe Array("r1", "r2")
  }

  test("toDataset maps snake_case columns with defaults") {
    val ds = RulesReader.toDataset(spark, RulesReader.filterRules(rulesDf, "p1", "t1"))
    val byName = ds.collect().map(r => r.rule -> r).toMap
    byName("r1").actionIfFailed shouldBe "drop"
    byName("r2").priority shouldBe "high"
    byName("r2").enableForTargetDqValidation shouldBe false
  }

  test("substituteParams rewrites {k} in expectation/table/product") {
    val r = Rule("{env}_prod", "{env}.tbl", "row_dq", "r", "c", "c > {lo}")
    val out = RulesReader.substituteParams(r, Map("env" -> "dev", "lo" -> "5"))
    out.productId shouldBe "dev_prod"
    out.tableName shouldBe "dev.tbl"
    out.expectation shouldBe "c > 5"
  }

  test("executionSettings derives the five stage flags") {
    val grouped = Map[RuleType, Seq[Rule]](
      RuleType.RowDq -> Seq(Rule("p", "t", "row_dq", "r", "c", "c>0")),
      RuleType.AggDq -> Seq(Rule("p", "t", "agg_dq", "a", "c", "sum(c)>0",
        enableForSourceDqValidation = false)),
      RuleType.QueryDq -> Seq.empty)
    val es = RulesReader.executionSettings(grouped)
    es.rowDq shouldBe true
    es.sourceAggDq shouldBe false
    es.targetAggDq shouldBe true
    es.sourceQueryDq shouldBe false
    es.targetQueryDq shouldBe false
  }

  test("nullEmptyAudit counts nulls and blank strings per key column") {
    import spark.implicits._
    val df = Seq(
      ("p1", "t1", "r1", "row_dq"),
      (null, "t1", "r2", "row_dq"),
      ("p1", "", " ", null)).toDF("product_id", "table_name", "rule", "rule_type")
    val audit = RulesReader.nullEmptyAudit(df)
    audit shouldBe Map("product_id" -> 1L, "table_name" -> 1L, "rule" -> 1L, "rule_type" -> 1L)
  }

  test("rulesToDict yields the DLT-style rule->expectation map") {
    val rules = Seq(
      Rule("p", "t", "row_dq", "r1", "c", "c > 0"),
      Rule("p", "t", "row_dq", "r_off", "c", "c > 1", isActive = false),
      Rule("p", "t", "agg_dq", "a1", "c", "sum(c) > 0"))
    RulesReader.rulesToDict(rules) shouldBe Map("r1" -> "c > 0")
  }

  test("withHashColumns matches Rule.idHash") {
    import spark.implicits._
    val r = Rule("p1", "t1", "row_dq", "r1", "c1", "c1 > 0")
    val df = Seq((r.productId, r.tableName, r.rule, r.ruleType, r.expectation))
      .toDF("product_id", "table_name", "rule", "rule_type", "expectation")
    val row = RulesReader.withHashColumns(df).select("id_hash", "expectation_hash").head()
    row.getString(0) shouldBe r.idHash
    row.getString(1) shouldBe r.expectationHash
  }
}

/** Mirrors the reference's `test_get_rules_dlt` matrix
  * (tests/integration/utils/test_reader.py:426-461): product/table/tag
  * combinations over one rules view map to exact `rule -> expectation`
  * dicts, inactive rows excluded, empty when nothing matches.
  */
class RulesMapDltSpec extends SparkSpec {

  private def row(product: String, table: String, rule: String, tag: String,
                  active: Boolean = true, ruleType: String = "row_dq",
                  expectation: String = null) =
    Row(product, table, ruleType, rule, "c1",
      if (expectation == null) s"expectation_$rule" else expectation,
      "ignore", tag, "d", true, true, active, false, 10, "@", false, "medium")

  private def dltRules = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      row("product1", "table1", "rule1", "tag1"),
      row("product1", "table1", "rule2", "tag2"),
      row("product1", "table1", "rule3", "tag3", ruleType = "agg_dq"),
      row("product1", "table1", "rule4", "tag4", active = false),
      row("product2", "table1", "rule5", "tag5"),
      row("product1", "table1", "rule6", "tag6", ruleType = "query_dq"),
      row("product2", "table1", "rule7", "tag7"),
      row("product2", "table2", "rule8", "tag8"),
      row("product1", "table1", "rule10", "tag1"),
      row("product2", "table1", "rule12", "tag2"),
      row("product1", "table1", "rule13", "tag2"))),
    Rule.schema)

  test("tag narrows to that KPI's rules") {
    RulesReader.rulesMap(dltRules, "product1", "table1", Some("tag2")) shouldBe Map(
      "rule2" -> "expectation_rule2", "rule13" -> "expectation_rule13")
  }

  test("no tag returns every active rule for the product/table, all types") {
    RulesReader.rulesMap(dltRules, "product1", "table1") shouldBe Map(
      "rule1" -> "expectation_rule1", "rule2" -> "expectation_rule2",
      "rule3" -> "expectation_rule3", "rule6" -> "expectation_rule6",
      "rule10" -> "expectation_rule10", "rule13" -> "expectation_rule13")
    RulesReader.rulesMap(dltRules, "product2", "table1").keySet shouldBe
      Set("rule5", "rule7", "rule12")
  }

  test("unmatched tag yields an empty dict") {
    RulesReader.rulesMap(dltRules, "product2", "table2", Some("tag7")) shouldBe empty
  }

  test("params substitute into expectations and templated table names") {
    val templated = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        row("p", "{env}.orders", "r_env", "t", expectation = "amt > {lo}"))),
      Rule.schema)
    RulesReader.rulesMap(templated, "p", "dev.orders",
      params = Map("env" -> "dev", "lo" -> "5")) shouldBe Map("r_env" -> "amt > 5")
    // without params the templated table row doesn't match the target
    RulesReader.rulesMap(templated, "p", "dev.orders") shouldBe empty
  }
}

class CompositeQuerySplitterSpec extends SparkSpec {

  test("plain expectation passes through unchanged") {
    val s = CompositeQuerySplitter.split("(select count(*) from t) > 0")
    s.baseExpectation shouldBe "(select count(*) from t) > 0"
    s.subQueries shouldBe empty
  }

  test("composite expectation splits into base + aliased subqueries") {
    val e = "{src} = {tgt}@src@select count(*) from a@tgt@select count(*) from b"
    val s = CompositeQuerySplitter.split(e)
    s.subQueries shouldBe Map(
      "src" -> "select count(*) from a",
      "tgt" -> "select count(*) from b")
    s.baseExpectation shouldBe "(select count(*) from a) = (select count(*) from b)"
  }

  test("custom delimiter") {
    val e = "{x} > 1|x|select 2"
    val s = CompositeQuerySplitter.split(e, "|")
    s.baseExpectation shouldBe "(select 2) > 1"
  }

  test("splitComparison extracts balanced-paren LHS, operator, RHS") {
    CompositeQuerySplitter.splitComparison("(select max(x) from (select 1 x)) >= (select 2)") shouldBe
      Some(("select max(x) from (select 1 x)", ">=", "(select 2)"))
    CompositeQuerySplitter.splitComparison("plain > 1") shouldBe None
  }
}
