package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counts, quality features, deterministic language guessing, and
  * rolling-hash fingerprints. All are pure column expressions — no
  * UDFs — so they stay inside codegen / vectorized evaluation and
  * scale linearly with the corpus.
  */
object TextAnalysis {

  /** Whitespace tokens (raw). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercase alphabetic words (the unit for quality + langid). */
  def words(text: Column): Column = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish subword units: maximal vowel runs and consonant runs.
    * The two character classes are disjoint, so greedy matching gives
    * identical tokenizations in any regex engine — a deterministic
    * stand-in for learned-merge subword tokenizers, with the same
    * count-scaling behavior.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[aeiou]+|[bcdfghjklmnpqrstvwxyz]+"), lit(0)))

  /** Sum of word lengths (for mean word length). */
  def wordCharSum(text: Column): Column =
    aggregate(transform(words(text), w => length(w)), lit(0L), (acc, x) => acc + x)

  val StopWords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  def stopwordCount(text: Column): Column =
    size(filter(words(text), w => w.isin(StopWords.map(x => x: Any): _*)))

  /** Language marker sets. Real corpora would use character n-gram
    * profiles; function-word hits are the deterministic, SQL-mirrorable
    * core of that idea and behave identically at any scale.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "that", "it"),
    "es" -> Seq("el", "los", "una", "es", "por", "como", "para", "que"),
    "fr" -> Seq("le", "la", "les", "une", "est", "dans", "pour", "qui"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  def markerHits(text: Column, lang: String): Column = {
    val set = LangMarkers.toMap.apply(lang)
    // zh markers are single CJK characters — `words` extracts [a-z]+
    // only, so count marker-CHARACTER occurrences instead (otherwise
    // h_zh is always 0 and pure-Chinese text would label as the
    // first latin language)
    if (lang == "zh")
      call_function("regexp_count", text, lit(s"[${set.mkString}]")).cast("int")
    else size(filter(words(text), w => w.isin(set.map(x => x: Any): _*)))
  }

  /** Deterministic argmax over marker hits with fixed priority order
    * (first lang wins ties) — same CASE chain the oracle SQL uses.
    */
  def langGuess(text: Column): Column = {
    val hits = LangMarkers.map { case (l, _) => l -> markerHits(text, l) }
    val langs = hits.map(_._1)
    // priority chain: lang i wins if >= all later langs
    langs.zipWithIndex.init.foldRight(lit(langs.last)) { case ((l, i), elseCol) =>
      val cond = hits.drop(i + 1).map(h => hits(i)._2 >= h._2).reduce(_ && _)
      when(cond, lit(l)).otherwise(elseCol)
    }
  }

  /** Polynomial rolling hash (Rabin–Karp): acc = (acc*31 + codepoint)
    * mod 1e9+7 over the character stream. Stays within long range at
    * every step, so it is bit-identical across engines.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c)),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
}
