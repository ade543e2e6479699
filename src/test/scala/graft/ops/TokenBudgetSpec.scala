package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBudgetGate keeps the best buckets whose cumulative tokens fit") {
    // scores 0.1..1.0, 100 tokens each; budget 350 → the top 3 buckets
    // (1.0, 0.9, 0.8) = 300 tokens fit; adding 0.7 would reach 400
    val rows = (1 to 10).map(i => (i.toLong, i / 10.0, 100L))
    val df = rows.toDF("id", "score", "tokens")
    val kept = Curation.tokenBudgetGate(df, "score", "tokens", budget = 350L)
      .select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(8L, 9L, 10L)
  }

  test("tokenBudgetGate: bucket atomicity — a bucket that would overflow is dropped whole") {
    // two docs share score 0.9 (same bucket, 120 tokens together);
    // budget 200 fits the 1.0 bucket (100) but not 1.0+0.9 (220)
    val df = Seq((1L, 1.0, 100L), (2L, 0.9, 60L), (3L, 0.9, 60L))
      .toDF("id", "score", "tokens")
    val kept = Curation.tokenBudgetGate(df, "score", "tokens", budget = 200L)
      .select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L)
  }

  test("tokenBudgetGate: nothing fits -> empty result, not a crash") {
    val df = Seq((1L, 0.5, 1000L)).toDF("id", "score", "tokens")
    Curation.tokenBudgetGate(df, "score", "tokens", budget = 10L)
      .count() shouldBe 0L
  }

  test("tokenBudgetGate: budget above total keeps everything") {
    val df = (1 to 50).map(i => (i.toLong, i / 50.0, 10L)).toDF("id", "score", "tokens")
    Curation.tokenBudgetGate(df, "score", "tokens", budget = 100000L)
      .count() shouldBe 50L
  }

  test("groupTokenCap caps each group independently at bucket granularity") {
    // group a: scores 1.0/0.9/0.8 at 100 tokens each, cap 250 → top 2;
    // group b: single doc over cap → nothing; group c: all fit
    val df = Seq(
      (1L, "a", 1.0, 100L), (2L, "a", 0.9, 100L), (3L, "a", 0.8, 100L),
      (4L, "b", 1.0, 400L),
      (5L, "c", 0.5, 50L), (6L, "c", 0.4, 50L))
      .toDF("id", "grp", "score", "tokens")
    val kept = Curation.groupTokenCap(df, "grp", "score", "tokens",
        capPerGroup = 250L)
      .select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 2L, 5L, 6L)
  }

  test("groupTokenCap with one group equals tokenBudgetGate") {
    val rows = (1 to 10).map(i => (i.toLong, "only", i / 10.0, 100L))
    val df = rows.toDF("id", "grp", "score", "tokens")
    val grouped = Curation.groupTokenCap(df, "grp", "score", "tokens",
        capPerGroup = 350L)
      .select("id").collect().map(_.getLong(0)).sorted
    val global = Curation.tokenBudgetGate(
        df.select($"id", $"score", $"tokens"), "score", "tokens",
        budget = 350L)
      .select("id").collect().map(_.getLong(0)).sorted
    grouped shouldBe global
    grouped shouldBe Array(8L, 9L, 10L)
  }

  test("tokenBudgetGate quantized=true consumes integer buckets directly") {
    // pre-quantized long scores (the qualityScoreQ contract): same
    // selection as the double path fed score/1e6
    val rows = (1 to 10).map(i => (i.toLong, i * 100000L, 100L))
    val qdf = rows.toDF("id", "q", "tokens")
    val ddf = rows.map { case (id, q, tk) => (id, q / 1000000.0, tk) }
      .toDF("id", "score", "tokens")
    val keptQ = Curation.tokenBudgetGate(qdf, "q", "tokens", budget = 350L,
        quantized = true)
      .select("id").collect().map(_.getLong(0)).sorted
    val keptD = Curation.tokenBudgetGate(ddf, "score", "tokens", budget = 350L)
      .select("id").collect().map(_.getLong(0)).sorted
    keptQ shouldBe Array(8L, 9L, 10L)
    keptQ shouldBe keptD
  }
}
