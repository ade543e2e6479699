package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd column functions and higher-order
  * functions — no UDFs — so the operators stay inside whole-stage codegen
  * and scale linearly with a parquet scan (no shuffle at all).
  */
object TextAnalysis {

  /** Whitespace tokenizer (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length: exact integer sum via HOF fold, one final double
    * division (deterministic).
    */
  def avgTokenLen(text: Column): Column = {
    val lens = transform(tokens(text), t => length(t))
    aggregate(lens, lit(0), (acc, x) => acc + x).cast("double") / size(lens)
  }

  /** Per-language stopword lists for the n-gram-free language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "in", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "las", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Count of tokens that belong to `lang`'s stopword list. */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(stopwords(lang): _*)))

  /** Ratio of English stopwords to all tokens (quality signal). */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") / tokenCount(text)

  /** Ratio of [a-z] characters to total length. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")).cast("double") / length(text)

  /** Composite quality score in [0,1]: length saturation + stopword
    * presence + alphabetic density. The exact op order is part of the
    * contract (oracle parity).
    */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / 100.0) * 0.4 +
      least(lit(1.0), stopwordRatio(text) * 5.0) * 0.3 +
      alphaRatio(text) * 0.3

  /** Heuristic language ID: stopword-hit argmax with fixed precedence
    * en > de > es > fr; 'und' when nothing matches.
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val de = stopwordHits(text, "de")
    val es = stopwordHits(text, "es")
    val fr = stopwordHits(text, "fr")
    when(en === 0 && de === 0 && es === 0 && fr === 0, lit("und"))
      .when(en >= greatest(de, es, fr), lit("en"))
      .when(de >= greatest(es, fr), lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Normalization fingerprint: md5 over the text with whitespace
    * stripped — the classic key-collision dedup fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))
}
