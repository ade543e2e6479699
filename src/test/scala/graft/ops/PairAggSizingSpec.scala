package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VERDICT r11 item 1: the pair-tier aggregate partition sizing,
  * promoted from the scale ladder into the ops API. Pins (a) the
  * sizing arithmetic against the measured x100 bracket, (b) the exact
  * candidate-mass measurement, (c) IDENTICAL output with and without
  * explicit sizing, and (d) the plan: an explicit `aggParts` puts a
  * hash exchange with exactly that partition count on the pair key,
  * while the auto path on a small corpus leaves the plan untouched
  * (no repartition below the session setting).
  */
class PairAggSizingSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val near = "the quick brown fox jumps over the lazy cat and runs far away today"
  private val docs = Seq(
    (1L, base), (2L, near), (3L, base),
    (4L, "completely different content about spark engines and data quality checks"))
    .toDF("doc_id", "text")

  test("sizedParts: measured x100 anchor, session floor, monotone") {
    val baseParts = spark.sessionState.conf.numShufflePartitions
    // the x100 rung's measured mass: 126,577,900 candidates → 121
    // partitions at the 2^20 keys/task budget (hand-tuned ladder: 128)
    PairAggSizing.sizedParts(spark, 126577900L) shouldBe
      math.max(baseParts, 121)
    // at-base and tiny masses never DROP below the session setting
    // (the global-128 rejection, inverted)
    PairAggSizing.sizedParts(spark, 0L) shouldBe baseParts
    PairAggSizing.sizedParts(spark, 1266000L) shouldBe baseParts
    // monotone in mass
    val ms = Seq(0L, 1L << 20, 1L << 25, 1L << 30, 1L << 35)
    val ps = ms.map(PairAggSizing.sizedParts(spark, _))
    ps shouldBe ps.sorted
  }

  test("candidatePairMass is exactly sum of C(df,2) over kept keys") {
    // keys: df=3 (3 pairs), df=2 (1 pair), df=1 (0), df=5 (capped out)
    val idx = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L),
      (3L, 300L),
      (1L, 400L), (2L, 400L), (3L, 400L), (4L, 400L), (5L, 400L))
      .toDF("id", "s")
    PairAggSizing.candidatePairMass(idx, "s", dfCap = 4) shouldBe 4L  // 3 + 1
    PairAggSizing.candidatePairMass(idx, "s", dfCap = 0) shouldBe 14L // + C(5,2)
    PairAggSizing.candidatePairMass(idx.filter(lit(false)), "s", 4) shouldBe 0L
  }

  test("explicit aggParts: identical pairs, sized exchange on the pair key") {
    val parts = spark.sessionState.conf.numShufflePartitions + 5
    val auto = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.5,
      persistIndex = false)
    val sized = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.5,
      persistIndex = false, aggParts = parts)
    val a = auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = sized.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    b shouldBe a
    a should contain((1L, 3L))
    // the sized plan carries a hash exchange with EXACTLY the requested
    // partition count on (id_a, id_b); REPARTITION_BY_NUM, so AQE never
    // coalesces it away (string-matched through the AQE wrapper)
    val sizedPlan = sized.queryExecution.executedPlan.toString
    sizedPlan should include("REPARTITION_BY_NUM")
    sizedPlan should include(s", $parts), REPARTITION_BY_NUM")
    sizedPlan.toLowerCase should include("hashpartitioning(id_a")
    // the auto path on this tiny corpus is a plan NO-OP: no repartition
    // inserted anywhere (everything stays at the session setting)
    auto.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM") shouldBe false
    spark.catalog.clearCache()
  }

  test("hashedShingleNearDup: sized form returns identical pairs") {
    val parts = spark.sessionState.conf.numShufflePartitions + 3
    val auto = Embedding.hashedShingleNearDup(docs, "doc_id", "text",
      dim = 4096, k = 3, tauSqNum = 25L, tauSqDen = 100L, persistIndex = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sized = Embedding.hashedShingleNearDup(docs, "doc_id", "text",
      dim = 4096, k = 3, tauSqNum = 25L, tauSqDen = 100L, persistIndex = false,
      aggParts = parts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sized shouldBe auto
    auto should contain((1L, 3L))
    spark.catalog.clearCache()
  }

  test("resolve rejects a non-sentinel non-positive aggParts") {
    val idx = Seq((1L, 100L)).toDF("id", "s")
    an[IllegalArgumentException] should be thrownBy
      PairAggSizing.resolve(idx, "s", 4, -2)
  }
}
