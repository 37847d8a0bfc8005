package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline tier:
  * tokenization, quality metrics, language-ID heuristic, fingerprints,
  * shingling. Everything is a codegen-friendly `Column` expression — no
  * UDFs — so these run inside whole-stage codegen at full scan speed and
  * need no per-executor state. Ratios divide exact integer counts once at
  * the end, keeping results bit-reproducible across partitionings (and
  * across engines, for the DuckDB oracle).
  */
object TextFunctions {

  /** Single-space tokenizer — the corpus contract here. A production
    * corpus would swap in `split(c, "\\s+")` after a trim; the downstream
    * operators only assume "array of tokens". */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  def distinctTokenCount(c: Column): Column =
    size(array_distinct(tokens(c))).cast("long")

  /** Total characters across tokens (exact: text length minus separators). */
  def tokenChars(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("long")

  /** Count of tokens found in `words` (occurrences, not distinct) —
    * fused single-pass kernel, equal to
    * `size(filter(tokens(c), t => t.isin(words)))`. */
  def countIn(c: Column, words: Seq[String]): Column =
    element_at(GraftExpressions.markerSetCounts(c, Seq(words)), 1)

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  def stopwordCount(c: Column): Column = countIn(c, stopwords)

  /** Share of [a-z] characters — a crude boilerplate/noise signal. */
  def alphaChars(c: Column): Column =
    length(regexp_replace(c, "[^a-z]", "")).cast("long")

  /** Language-ID: tiny per-language marker lexicons, argmax with
    * first-wins tie-break, "und" when nothing matches. An n-gram/lexicon
    * heuristic in the fastText spirit, deliberately SQL-expressible so the
    * oracle can replay it. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "y", "una"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** All language scores in one fused tokenize pass (array<long>, one
    * element per langMarkers entry). The repeated references projection
    * collapse produces are structurally equal, so codegen subexpression
    * elimination evaluates the kernel once per row. */
  def langScoresArray(c: Column): Column =
    GraftExpressions.markerSetCounts(c, langMarkers.map(_._2))

  def langScores(c: Column): Seq[(String, Column)] = {
    val arr = langScoresArray(c)
    langMarkers.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(arr, i + 1)
    }
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(lit(false), lit(""))) { case (acc, (l, s)) =>
      acc.when(s === best && best > 0, lit(l))
    }.otherwise(lit("und"))
  }

  /** Canonical-form document fingerprint: lowercase, collapse whitespace,
    * trim, md5 — exact-dedup key robust to spacing/case noise. */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  /** Distinct word n-gram shingles, the unit of near-dup similarity.
    * Guarded: texts shorter than n shingle to empty (Spark's `sequence`
    * would otherwise count DOWN when start > stop). */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      array_distinct(
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }
}
