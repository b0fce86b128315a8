package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis building blocks for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, shingling, fingerprinting.
  *
  * Everything is pure `functions._` column algebra (codegen'd, no UDFs), so
  * it runs inside WholeStageCodegen and scales linearly with the scan —
  * the properties the reference's tokenizer pipeline gets from its native
  * code (`rust/index/src/fulltext/tokenizer.rs:183-220`: lowercase,
  * non-alnum split, length filters).
  */
object TextStats {

  /** Lowercased alphanumeric tokens (reference tokenizer semantics). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish subword count: letter runs, digit runs, single punctuation. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct word `n`-gram shingles, space-joined. Empty when < n tokens.
    *
    * `toks0` (often a full tokenize tree) is bound once through a lambda
    * slot before the per-position lambda references it: Spark's
    * subexpression elimination skips conditionally-evaluated branches, so
    * a direct reference inside the transform lambda would re-evaluate the
    * tokenizer once per shingle position (measured ~1.5 ms/row — it
    * dominated every dedup query sharing this helper).
    */
  def shingles(toks0: Column, n: Int): Column =
    element_at(transform(array(toks0), toks =>
      when(size(toks) >= n,
        array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
        .otherwise(array().cast("array<string>"))), 1)

  /** PII scrubbing patterns: (kind, regex, replacement). Conservative
    * RE2-compatible syntax (no look-around) so one pattern text runs
    * identically in Spark (java.util.regex) and engines like DuckDB/RE2
    * — the same portability constraint the reference imposes on `$regex`
    * (`rust/types/src/regex/hir.rs`).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Replace every PII pattern occurrence with its tag (training-data
    * scrubbing; codegen'd regexp_replace chain, no UDF).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Occurrences of one PII pattern kind in `text`. */
  def piiCount(text: Column, kind: String): Column = {
    val p = piiPatterns.find(_._1 == kind)
      .getOrElse(throw new IllegalArgumentException(s"unknown pii kind $kind"))._2
    size(regexp_extract_all(text, lit(p), lit(0)))
  }

  /** Count of tokens that appear in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Small per-language stopword profiles for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"))
}
