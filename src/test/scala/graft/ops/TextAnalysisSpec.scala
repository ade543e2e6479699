package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "the quick fox and the dog"),
    (2L, "der hund und die katze"),
    (3L, "xyzzy qwerty 12345")).toDF("doc_id", "text")

  test("tokenCount counts whitespace tokens") {
    df.select($"doc_id", TextAnalysis.tokenCount($"text"))
      .orderBy("doc_id").collect().map(_.getInt(1)) shouldBe Array(6, 5, 3)
  }

  test("langId picks the language with most stopword hits") {
    df.select($"doc_id", TextAnalysis.langId($"text"))
      .orderBy("doc_id").collect().map(_.getString(1)) shouldBe
      Array("en", "de", "und")
  }

  test("avgTokenLen is exact (fold of integer lengths)") {
    val out = Seq((1L, "ab cdef")).toDF("doc_id", "text")
      .select(TextAnalysis.avgTokenLen($"text")).head().getDouble(0)
    out shouldBe 3.0 // (2+4)/2
  }

  test("alphaRatio counts only [a-z]") {
    val out = Seq((1L, "ab 12")).toDF("doc_id", "text")
      .select(TextAnalysis.alphaRatio($"text")).head().getDouble(0)
    out shouldBe 0.4 // 2 of 5 chars
  }

  test("qualityScore stays within [0,1] and rewards clean text") {
    val scores = df.select($"doc_id", TextAnalysis.qualityScore($"text"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    all(scores) should (be >= 0.0 and be <= 1.0)
    scores(0) should be > scores(2) // English text beats gibberish
  }

  test("fingerprint is whitespace/punctuation-invariant") {
    val out = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    out(0) shouldBe out(1)
    out(0) should not be out(2)
  }
}
