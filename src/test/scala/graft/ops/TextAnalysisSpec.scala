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

  test("codegen forms equal the token-array folds on adversarial inputs") {
    // the operators compute token stats WITHOUT materializing the token
    // array (length arithmetic + regexp_count); prove equivalence to the
    // literal split/filter/fold semantics the DuckDB oracle uses —
    // including empty tokens (double/leading/trailing spaces), trailing
    // newlines (Java's $ vs \z trap), and adjacent stopwords
    val texts = Seq(
      "the quick fox", "the the the", "a a", "a  a", " a", "a ",
      "the\n", "the\nquick", "and", "an", "x", "", " ", "  ",
      "der hund und die katze", "the. a, of", "inn in is", "to to to to")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val F = org.apache.spark.sql.functions
    val toks = TextAnalysis.tokens($"text")
    def hofHits(lang: String) =
      F.size(F.filter(toks, t => t.isin(TextAnalysis.stopwords(lang): _*)))
    val rows = df.select(
      TextAnalysis.tokenCount($"text"),
      F.size(toks),
      TextAnalysis.stopwordHits($"text", "en"),
      hofHits("en"),
      TextAnalysis.stopwordHits($"text", "de"),
      hofHits("de"),
      TextAnalysis.avgTokenLen($"text"),
      F.aggregate(F.transform(toks, t => F.length(t)), lit(0), (a, x) => a + x)
        .cast("double") / F.size(toks)).collect()
    rows.foreach { r =>
      r.getInt(0) shouldBe r.getInt(1)
      r.getInt(2) shouldBe r.getInt(3)
      r.getInt(4) shouldBe r.getInt(5)
      r.getDouble(6) shouldBe r.getDouble(7)
    }
  }

  test("tokenCountBpe splits letter/digit/symbol runs where whitespace can't") {
    val out = Seq(
      (1L, "abc123 def!"),      // abc|123|def|! = 4 (2 whitespace tokens)
      (2L, "plain words only"), // = whitespace count on pure letters
      (3L, "v2.0-rc1"),         // v|2|.|0|-|rc|1 = 7
      (4L, "!!!"))              // one symbol run
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokenCountBpe($"text").as("n"),
        TextAnalysis.tokenCount($"text").as("ws"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    out(1L) shouldBe ((4, 2))
    out(2L) shouldBe ((3, 3))
    out(3L) shouldBe ((7, 1))
    out(4L) shouldBe ((1, 1))
  }

  test("fingerprint is whitespace/punctuation-invariant") {
    val out = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    out(0) shouldBe out(1)
    out(0) should not be out(2)
  }
}
