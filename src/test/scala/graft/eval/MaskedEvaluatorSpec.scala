package graft.eval

import graft.SparkSpec
import graft.model.{Rule, RunContext}
import graft.sink.ErrorWriter
import org.apache.spark.sql.functions.{col, element_at, transform}

class MaskedEvaluatorSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((0, 1, "a"), (1, 2, "b"), (2, 3, "c"))
    .toDF("row_id", "col1", "col2")

  private def rr(name: String, e: String, action: String = "ignore") =
    Rule("p", "t", "row_dq", name, "col1", e, action)

  test("mask bits match per-rule failures; NULL counts as failure") {
    val rules = Seq(rr("gt1", "col1 > 1"), rr("null_rule", "CAST(NULL AS BOOLEAN)"))
    val out = MaskedRowDqEvaluator.run(df, rules).orderBy("row_id")
      .select(col("meta_dq_fail_mask_0")).collect().map(_.getLong(0))
    // bit0 = gt1 failed, bit1 = null rule (always fails)
    out shouldBe Array(1L | 2L, 2L, 2L)
  }

  test("failureCounts matches map-based summarize") {
    val rules = Seq(rr("gt1", "col1 > 1", "drop"), rr("lt3", "col1 < 3"))
    val masked = MaskedRowDqEvaluator.run(df, rules)
    val (total, counts) = MaskedRowDqEvaluator.failureCounts(masked, rules)
    total shouldBe 2 // rows 0 and 2 each fail something
    counts shouldBe Map("gt1" -> 1L, "lt3" -> 1L)
    val ctx = RunContext.create("p", "t")
    val mapBased = ErrorWriter.summarize(
      ErrorWriter.errorRows(RowDqEvaluator.run(df, rules), ctx), rules)
      .map(s => s.rule -> s.failedRowCount).toMap
    counts shouldBe mapBased
  }

  test("metaColumn rebuilds the reference-shaped failed maps") {
    val rules = Seq(rr("gt1", "col1 > 1", "drop"), rr("lt3", "col1 < 3"))
    val masked = MaskedRowDqEvaluator.run(df, rules)
    val metas = masked
      .withColumn("meta", MaskedRowDqEvaluator.metaColumn(rules))
      .orderBy("row_id")
      .select(transform(col("meta"), m => element_at(m, "rule")))
      .collect().map(_.getSeq[String](0).toList)
    metas shouldBe Array(List("gt1"), Nil, List("lt3"))
    val m = masked.withColumn("meta", MaskedRowDqEvaluator.metaColumn(rules))
      .filter(col("row_id") === 0)
      .select(element_at(col("meta"), 1)).head().getMap[String, String](0)
    m("status") shouldBe "fail"
    m("action_if_failed") shouldBe "drop"
    m("id_hash") shouldBe rules.head.idHash
  }

  test("hasFailedAction distinguishes actions; absent action is never true") {
    val rules = Seq(rr("gt1", "col1 > 1", "drop"), rr("lt3", "col1 < 3", "ignore"))
    val masked = MaskedRowDqEvaluator.run(df, rules)
    masked.filter(MaskedRowDqEvaluator.hasFailedAction(rules, "drop"))
      .select("row_id").collect().map(_.getInt(0)) shouldBe Array(0)
    masked.filter(MaskedRowDqEvaluator.hasFailedAction(rules, "fail"))
      .count() shouldBe 0
  }

  test("chunking handles more than 64 rules") {
    // 70 rules: rule i fails exactly on rows where col1 <= i % 3
    val rules = (0 until 70).map(i => rr(s"r_$i", s"col1 > ${i % 3}"))
    val masked = MaskedRowDqEvaluator.run(df, rules)
    masked.columns should contain allOf ("meta_dq_fail_mask_0", "meta_dq_fail_mask_1")
    // rule i fails on rows with col1 <= i%3; col1 ∈ {1,2,3}
    val (total, counts) = MaskedRowDqEvaluator.failureCounts(masked, rules)
    total shouldBe 2 // col1=1 and col1=2 fail some rule; col1=3 passes all
    counts("r_0") shouldBe 0  // col1 > 0 never fails
    counts("r_1") shouldBe 1  // col1 > 1 fails col1=1
    counts("r_2") shouldBe 2  // col1 > 2 fails col1∈{1,2}
    counts("r_69") shouldBe 0 // 69%3=0 → col1 > 0 never fails
    val meta65 = masked.withColumn("meta", MaskedRowDqEvaluator.metaColumn(rules))
      .filter(col("row_id") === 0) // col1=1 fails all rules with i%3 >= 1
      .select(transform(col("meta"), m => element_at(m, "rule")))
      .head().getSeq[String](0)
    meta65 should contain ("r_65") // 65%3=2 → fails on col1=1; lives in chunk 2
  }

  test("counts on empty input are zero-filled") {
    val rules = Seq(rr("gt1", "col1 > 1"))
    val masked = MaskedRowDqEvaluator.run(df.filter(col("col1") > 100), rules)
    val (total, counts) = MaskedRowDqEvaluator.failureCounts(masked, rules)
    total shouldBe 0
    counts shouldBe Map("gt1" -> 0L)
  }
}
