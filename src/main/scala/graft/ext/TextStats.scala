package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID (stopword
  * n-gram heuristic), quality scoring, token counting, and document
  * fingerprinting. All narrow, codegen'd expressions — no UDFs — so
  * they scale linearly with input and stay inside whole-stage codegen.
  */
object TextStats {

  /** Tiny per-language stopword inventories for the heuristic
    * language ID. Counts of these as standalone words vote for the
    * language.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "una", "con"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "dans", "pour"))

  /** Count of standalone-word occurrences of `word` in lowercased
    * text. Portable: size(split) - 1 over a padded haystack.
    *
    * Documented heuristic: adjacent repeats undercount ("the the" → 1)
    * because consecutive separators share the padding space. The DuckDB
    * oracle mirrors the same formula, and for stopword RATIOS the bias
    * is negligible; an exact count would need lookarounds, which RE2
    * (DuckDB) lacks.
    */
  def wordCount(text: Column, word: String): Column =
    size(split(concat(lit(" "), lower(text), lit(" ")), s" ${word} ")) - 1

  /** Stopword votes per language. */
  def langScores(text: Column): Map[String, Column] =
    stopwords.map { case (lang, words) =>
      lang -> words.map(w => wordCount(text, w)).reduce(_ + _)
    }

  /** Heuristic language ID: argmax of stopword votes; 'und' when all
    * zero. Deterministic tie-break: en > es > fr (fixed eval order).
    */
  def langId(text: Column): Column = {
    val s = langScores(text)
    val best = Seq("en", "es", "fr").map(l => struct(s(l).as("n"), lit(l).as("lang")))
      .reduce((a, b) => when(b.getField("n") > a.getField("n"), b).otherwise(a))
    when(best.getField("n") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** ASCII punctuation regex class, portable across Java regex and RE2. */
  val PunctClass = "[!-/:-@\\[-`{-~]"

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(Dedup.tokens(text))

  /** BPE-ish subword-piece count: runs of letters, runs of digits, and
    * single other non-space chars each count as one piece.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality features + a composite score in [0,1]:
    * length band, punctuation ratio, stopword ratio, mean word length.
    */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTok = wsTokenCount(t)
    // explicit ASCII punctuation class: identical under Java regex and
    // RE2 (DuckDB oracle) — \p{Punct} is Java-only
    val punct = size(regexp_extract_all(t, lit(PunctClass), lit(0)))
    val stopHits = stopwords.values.flatten.toSeq.distinct
      .map(w => wordCount(t, w)).reduce(_ + _)
    docs
      .withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("punct_ratio",
        when(nChars === 0, 0.0).otherwise(punct.cast("double") / nChars))
      .withColumn("stopword_ratio",
        when(nTok === 0, 0.0).otherwise(stopHits.cast("double") / nTok))
      .withColumn("mean_word_len",
        when(nTok === 0, 0.0)
          .otherwise((nChars - nTok + 1).cast("double") / nTok))
      .withColumn("quality_score",
        round(
          when(col("n_tokens") >= 5, 0.4).otherwise(0.0) +
          when(col("punct_ratio") <= 0.2, 0.3).otherwise(0.0) +
          when(col("mean_word_len").between(2.0, 12.0), 0.3).otherwise(0.0), 2))
  }

  /** Stable document fingerprint: md5 of case- and whitespace-
    * normalized text (content-defined identity for dedup joins).
    */
  def fingerprint(text: Column): Column = Dedup.normalizedFingerprint(text)

  /** Rolling-hash shingle fingerprint (winnowing-style): the minimum
    * md5 over character `w`-gram windows of the normalized text — a
    * compact near-dup signature computed in one narrow expression.
    */
  def minShingleFingerprint(text: Column, w: Int = 8): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    array_min(transform(
      sequence(lit(1), greatest(length(norm) - (w - 1), lit(1))),
      i => md5(substring(norm, i, lit(w)))))
  }
}
