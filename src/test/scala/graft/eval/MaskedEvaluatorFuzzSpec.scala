package graft.eval

import graft.SparkSpec
import graft.model.Rule
import graft.orchestrator.{DqConfig, SparkExpectations}

/** Seeded fuzz equivalence: for random datasets × random rule subsets ×
  * random drop/ignore actions, the bitmask pipeline's fused counts must
  * equal an independent driver-side evaluation of the same expectations
  * (with the reference's null-as-failure verdict). Golden cases pin
  * known shapes; this sweeps the combinatorial space around them.
  */
class MaskedEvaluatorFuzzSpec extends SparkSpec {
  import spark.implicits._

  // (expectation, driver-side truth over (col1, col2); a NULL SQL verdict
  // must come out false here, matching when()'s null-as-failure)
  private val pool: Seq[(String, (Int, Option[Int]) => Boolean)] = Seq(
    ("col1 > 3", (c1, _) => c1 > 3),
    ("col1 <= 7", (c1, _) => c1 <= 7),
    ("col2 is not null", (_, c2) => c2.nonEmpty),
    ("col2 > 2", (_, c2) => c2.exists(_ > 2)),
    ("col1 % 2 = 0", (c1, _) => c1 % 2 == 0),
    ("col1 + coalesce(col2, 0) < 12", (c1, c2) => c1 + c2.getOrElse(0) < 12))

  test("fuzz: fused pipeline counts equal driver-side truth (25 seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(40)
      val rows = Seq.fill(n)((rnd.nextInt(10),
        if (rnd.nextBoolean()) Some(rnd.nextInt(10)) else None))
      val df = rows.toDF("col1", "col2")
      val k = 1 + rnd.nextInt(4)
      val chosen = rnd.shuffle(pool).take(k)
      val actions = chosen.map(_ => if (rnd.nextBoolean()) "drop" else "ignore")
      val rules = chosen.zip(actions).zipWithIndex.map {
        case (((e, _), a), i) => Rule("p", "t", "row_dq", s"r$i", "c", e, a)
      }

      val failsPerRow = rows.map { case (c1, c2) =>
        chosen.map { case (_, truth) => !truth(c1, c2) }
      }
      val expectedError = failsPerRow.count(_.contains(true))
      val dropIdx = actions.zipWithIndex.collect { case ("drop", i) => i }.toSet
      val expectedOutput = failsPerRow.count(fails =>
        !dropIdx.exists(fails(_)))

      withClue(s"trial $trial rules=${rules.map(r => s"${r.expectation}/${r.actionIfFailed}").mkString("; ")}: ") {
        val res = new SparkExpectations("p", "t", rules, DqConfig()).run(df)
        res.stats.inputCount shouldBe n
        res.stats.errorCount shouldBe expectedError
        res.stats.outputCount shouldBe expectedOutput
        res.finalDf.count() shouldBe expectedOutput
        res.unpersist()

        // every third trial: the observe-on-write path must produce the
        // SAME stats as the fused aggregate (all actions are drop/ignore
        // here, so OnWrite never falls back)
        if (trial % 3 == 0) {
          import graft.orchestrator.CountsMode
          val out = java.nio.file.Files.createTempDirectory("graft_fuzz_obs").toString
          val obsRes = new SparkExpectations("p", "t", rules, DqConfig(
            countsMode = CountsMode.OnWrite,
            writeTargetTablePath = Some(s"$out/target"))).run(df)
          obsRes.stats.inputCount shouldBe n
          obsRes.stats.errorCount shouldBe expectedError
          obsRes.stats.outputCount shouldBe expectedOutput
          obsRes.rowSummaries.map(s => s.rule -> s.failedRowCount).toMap shouldBe
            res.rowSummaries.map(s => s.rule -> s.failedRowCount).toMap
          spark.read.parquet(s"$out/target").count() shouldBe expectedOutput
          obsRes.unpersist()
        }
      }
    }
  }
}
