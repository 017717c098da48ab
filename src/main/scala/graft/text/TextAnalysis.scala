package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Text-analysis operators for the training-data pipeline (north star §
  * "text analysis"): tokenization, quality scoring, language ID,
  * fingerprinting. All pure column expressions — codegen'd, no UDFs —
  * so they pipeline inside whole-stage codegen over a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + standalone punctuation, the usual
    * pre-tokenizer granularity (`\w+|[^\w\s]`). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** Stopword hits among whitespace tokens. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*)))

  /** Punctuation characters (ASCII punct class, identical in Java and
    * RE2/DuckDB). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", ""))

  /** Mean token length (double division — exact cross-engine). */
  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + length(t).cast("long")).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: length prior × stopword prior.
    * Deliberately simple, deterministic, and SQL-expressible; mirrors the
    * shape of public quality heuristics (length/punct/stopword ratios). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenScore = least(n.cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(stopwordCount(text).cast("double") * lit(10.0) / n, lit(1.0))
    (lenScore + stopScore) / lit(2.0)
  }

  /** Marker-word language ID. A char-n-gram profile is the classic
    * approach; over the synthetic fixture vocabulary (English SQL-ish
    * words for every `lang` label) profiles are degenerate, so the
    * heuristic is marker-word voting with a fixed priority order —
    * deterministic and oracle-expressible. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "et", "les"))
  def langId(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), t => t.isin(markers: _*)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), elseCol) =>
      when(c === best && c > 0, lang).otherwise(elseCol)
    }
  }

  /** Distinct k-token n-grams of the text (WordShingles — one-pass,
    * codegen-friendly, deduped). */
  def distinctNgramCount(text: Column, k: Int): Column =
    size(HashFunctions.word_shingles(text, k)).cast("long")

  /** Total k-token n-gram positions: max(tokens − k + 1, 0). */
  def ngramCount(text: Column, k: Int): Column =
    greatest(tokenCount(text).cast("long") - lit(k - 1L), lit(0L))

  /** Gopher-style repetition signal: fraction of k-gram POSITIONS whose
    * k-gram also occurs elsewhere in the document
    * (1 − distinct/total; 0 for docs shorter than k tokens). Boilerplate,
    * looping generations, and template spam all push this up; it is the
    * cheapest of the published repetition filters and, being a pure
    * ratio of exact integers, bit-reproducible in any engine. */
  def dupNgramFrac(text: Column, k: Int): Column = {
    val total = ngramCount(text, k)
    when(total > 0L,
      lit(1.0) - distinctNgramCount(text, k).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Canonical form for fingerprinting: lowercase, trimmed, collapsed
    * whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprints: md5 of the normal form (exact dedup key) and
    * the rolling polynomial hash (order-sensitive, cheap to slide). */
  def md5Fingerprint(text: Column): Column = md5(normalized(text))
  def rollingFingerprint(text: Column): Column =
    HashFunctions.poly_hash(normalized(text))
}
