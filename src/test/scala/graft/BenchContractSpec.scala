package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the driver-facing bench stdout contract. The driver captures
  * only the LAST 2000 characters of stdout and runs `json.loads` on the
  * final line; rounds 1-3 shipped a ~4.6 KB contract line that was
  * front-truncated by that window and graded `parsed: null`. These
  * tests simulate the driver exactly: take the 2000-char tail, split
  * lines, parse the last one.
  */
class BenchContractSpec extends AnyFunSuite with Matchers {

  // every real query name with full-precision timings in the measured
  // sf0.1 range (0.1-10 s medians, one triple-digit outlier to exercise
  // wide-value formatting) — the realistic worst case the formatter
  // must fit in the window
  private def realisticResults: Seq[(String, Option[Seq[Double]])] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (k, i) =>
      val base = if (i == 0) 123.456789 else 0.123456789 + (i % 9)
      k -> Some(Seq(base, base + 1.8642, base + 0.4443))
    }

  private def lastLineOfTail(stdout: String): String = {
    val tail = stdout.takeRight(2000)
    tail.linesIterator.toSeq.last
  }

  test("contract line keeps headroom inside the driver's 2000-char tail window") {
    val out = Bench.contractLines(realisticResults, "/root/testdata/sf0.1")
    val contract = out.linesIterator.toSeq.last
    withClue(s"line length ${contract.length} for ${SparkEntry.queries.size} queries: ") {
      // hard ceiling: the driver parses the final line of the LAST 2000
      // chars of stdout — the line itself (plus its newline) must fit.
      // The budgeted assembly (slowest-first, fastest omitted past 1900
      // chars) makes this structural, not hoped-for.
      contract.length should be < 1950
    }
  }

  test("over-budget registries omit the FASTEST queries and say so") {
    // 300 synthetic queries cannot fit at ~21 chars each; the slowest
    // must survive on the contract line, the omission must be declared,
    // and the line must stay parseable and under the ceiling
    val big = (1 to 300).map(i => f"synthetic_query_$i%03d" ->
      Some(Seq(i * 0.01, i * 0.01, i * 0.01)))
    val contract = Bench.contractLines(big, "/root/testdata/sf0.1")
      .linesIterator.toSeq.last
    contract.length should be < 1950
    contract should include("\"omitted\":")
    // slowest query present, fastest gone from the contract map
    contract should include("\"synthetic_query_300\":")
    contract should not include "\"synthetic_query_001\":"
    contract.count(_ == '{') shouldBe contract.count(_ == '}')
  }

  test("driver-style 2000-char tail parse recovers the contract; omissions only ever drop the fastest") {
    // simulate sbt/log noise before the JSON lines, as in a real run
    val noise = ("[info] running graft.Bench\n" * 40)
    val full = Bench.contractLines(realisticResults, "/root/testdata/sf0.1")
    val out = noise + full
    val line = lastLineOfTail(out)
    line should startWith("{\"metric\":\"total\"")
    line should endWith("}")
    // minimal structural JSON check without a JSON library on the test
    // classpath: the contract keys all present, braces balanced
    Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
      "\"queries\":{", "\"failed\":[", "\"sf\":",
      // the box-calibration row: dq_stats median of THIS run, so
      // per-query claims can be read as box-portable ratios
      "\"calib_dq_stats\":").foreach(k => line should include(k))
    line.count(_ == '{') shouldBe line.count(_ == '}')
    line.count(_ == '[') shouldBe line.count(_ == ']')
    // included + declared-omitted must account for the WHOLE registry —
    // nothing silently vanishes (past ~85 queries the budget drops the
    // fastest from the contract map; they keep full precision on the
    // detail line)
    val included = SparkEntry.queries.keys.filter(k => line.contains("\"" + k + "\":"))
    val omitted = "\"omitted\":(\\d+)".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    included.size + omitted shouldBe SparkEntry.queries.size
    if (omitted > 0) {
      // every omitted query must be strictly faster than every included
      // one (medians here are synthetic: rank i -> 0.123 + i%9)
      val medians = realisticResults.collect { case (k, Some(t)) =>
        k -> t.sorted.apply(t.size / 2) }.toMap
      val includedMin = included.map(medians).min
      medians.filterNot { case (k, _) => included.toSet.contains(k) }
        .values.foreach(_ should be <= includedMin)
      // the slowest query is always on the contract line
      val slowest = medians.maxBy(_._2)._1
      line should include("\"" + slowest + "\":")
    }
    // every query rides the DETAIL line regardless of contract budget
    val detail = full.linesIterator.toSeq.head
    SparkEntry.queries.keys.foreach(k => detail should include("\"" + k + "\":"))
  }

  test("contract values are compact; full precision and metadata live on the earlier line") {
    val out = Bench.contractLines(realisticResults, "/root/testdata/sf0.1")
    val lines = out.linesIterator.toSeq
    lines.size shouldBe 2
    lines.head should include("\"queries_min\":{")
    lines.head should include("\"queries_median\":{")
    lines.head should include("\"isolation\":\"jvm-per-query\"")
    lines.last should not include "queries_min"
    // contract-line medians are 2-decimal (headroom: each query costs
    // ~name+8 chars); the headline total keeps 3
    val valuePat = """:(\d+\.\d+)""".r
    valuePat.findAllMatchIn(lines.last).foreach { m =>
      m.group(1).split("\\.")(1).length should be <= 3
    }
    // 3-decimal detail preserved for regression grading
    valuePat.findAllMatchIn(lines.head).foreach { m =>
      m.group(1).split("\\.")(1).length shouldBe 3
    }
  }

  test("failed queries are listed, not silently dropped") {
    val results = realisticResults.updated(0, realisticResults.head._1 -> None)
    val contract = Bench.contractLines(results, "sfdir").linesIterator.toSeq.last
    contract should include(s""""failed":["${realisticResults.head._1}"]""")
    contract should not include (s""""${realisticResults.head._1}":0""")
  }
}
