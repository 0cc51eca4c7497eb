package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for the training-data pipeline —
  * SURVEY.md §7.6 north star. Built-ins only (SURVEY.md §2.8 rule:
  * zero UDFs), so everything stays codegen'd and pushdown-friendly, and
  * every function here has an exact ANSI-SQL twin for the oracle.
  */
object TextAnalysis {

  /** Stopword list shared by quality scoring and the oracle SQL. */
  val Stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenizer pattern (GPT-2 shape, RE2-safe subset —
    * no lookahead, so the same pattern runs in Java regex and DuckDB):
    * a token is an optional-space-prefixed letter run, digit run, or
    * punctuation run. Splitting letters/digits/punctuation apart is
    * what makes the count track subword-tokenizer budgets far better
    * than whitespace splitting does. */
  val BpeishPattern: String = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** BPE-ish pre-token count — the token-budget estimator. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(trim(text)), lit(BpeishPattern))

  /** Fraction of characters that are sentence punctuation. NULL for
    * empty text: under Spark 4's default ANSI mode a bare `/ length`
    * would throw DIVIDE_BY_ZERO on the first empty document — a
    * curation filter must score the rest of the corpus instead
    * (DuckDB's `/` yields the same NULL, so oracles agree). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
      nullif(length(text), lit(0))

  /** Fraction of characters that are ASCII uppercase (NULL for empty
    * text — see [[punctRatio]]). */
  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
      nullif(length(text), lit(0))

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isInCollection(Stopwords))).cast("double") / size(t)
  }

  /** Composite quality score in [0,1]: length saturation + stopword
    * presence + low punctuation noise. Deliberately simple — every term
    * is SQL-expressible for the oracle.
    */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.3 +
      stopwordRatio(text) * 0.4 +
      (lit(1.0) - punctRatio(text)) * 0.3

  /** Marker-word occurrence count — tokens equal to the word. The
    * earlier length-difference `replace` trick undercounted ADJACENT
    * repeats ("de de de" → 2, not 3: each non-overlapping " de " match
    * consumes the shared separating space), biasing langId low exactly
    * on marker-heavy text; token equality counts every occurrence and
    * has the same exact SQL twin (`list_filter` + len).
    */
  def markerHits(text: Column, word: String): Column =
    size(filter(tokens(text), w => w === word)).cast("double")

  /** Language-marker score sets (n-gram-style heuristic; deterministic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "und", "die"))

  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(markerHits(text, _)).reduce(_ + _)

  /** Heuristic language id with a fixed tie-break order (en, es, de). */
  def langId(text: Column): Column = {
    val en = langScore(text, "en")
    val es = langScore(text, "es")
    val de = langScore(text, "de")
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }
}
