package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column combinators for LLM-training-data pipelines:
  * tokenization stats, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd higher-order functions
  * (`split`/`transform`/`filter`/`aggregate`) — no UDFs, no shuffles; a
  * 100 TB corpus pays one projection scan. North-star extension beyond the
  * reference surface (SURVEY §2.9 notes the reference has no UDF/text ops).
  */
object TextStats {

  /** Whitespace tokenization (documents are single-space word soup). */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-style pre-tokenizer regex (simplified BPE splitting: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs).
    * Kept to the regex subset Java and RE2 treat identically, so the DuckDB
    * oracle can run the same pattern. */
  val BpeTokenPattern: String = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  /** BPE-ish token list / count — the token-budget estimator a training
    * pipeline runs over every document. One codegen'd projection. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def nBpeTokens(text: Column): Column = size(bpeTokens(text)).cast("long")

  def nTokens(text: Column): Column = size(tokens(text)).cast("long")

  def nDistinctTokens(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Σ token length / token count (double division, engine-exact). */
  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, x) => acc + length(x).cast("long"))
      .cast("double") / nTokens(text)

  /** Fraction of tokens in the stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
      .cast("double") / nTokens(text)

  /** distinct/total tokens — low values indicate repetitive spam. */
  def typeTokenRatio(text: Column): Column =
    nDistinctTokens(text).cast("double") / nTokens(text)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"-]", "")).cast("double") / length(text)

  /** PII scrubbing for training corpora: emails, US-style SSNs and phone
    * numbers replaced with typed placeholder tokens. Patterns use the
    * Java/RE2-identical regex subset (literal classes, `\b`, `\d`, bounded
    * quantifiers — the q59 precedent), so a DuckDB `regexp_replace(..,
    * 'g')` re-derivation matches byte-for-byte. Email runs FIRST, and
    * intentionally so: its local-part class accepts digits and hyphens, so
    * an SSN/phone immediately adjacent to `@domain.tld` (e.g.
    * `123-45-6789@x.io`) is consumed whole by the email pass — order
    * matters in that corner, and email-first redacts the larger span. The
    * digit patterns themselves cannot overlap each other (3-2-4 vs 3-3-4
    * groups with `\b` anchors). Pure chained projections — stays inside
    * whole-stage codegen, scales as a scan. */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ssn, "<SSN>"),
      phone, "<PHONE>")
  }

  /** Order-insensitive content fingerprint: SHA-256 over the sorted distinct
    * token set. Robust to word reordering; pairs with [[Dedup]] for
    * near-dup candidate generation. */
  def fingerprint(text: Column): Column =
    sha2(concat_ws(" ", array_sort(array_distinct(tokens(text)))), 256)

  /** Intra-document repetition (Gopher-style): fraction of token w-grams
    * that are repeats of an earlier w-gram — high values flag boilerplate /
    * looping spam. Uses the native fused distinct-shingle expression, so
    * the scan stays codegen'd. */
  def repetitionRatio(text: Column, w: Int = 3): Column = {
    val total = greatest(size(tokens(text)) - (w - 1), lit(1)).cast("double")
    lit(1.0) - size(graft.functions.DistinctShingles.distinctShingles(tokens(text), w))
      .cast("double") / total
  }

  /** Stopword-vote language ID (n-gram-heuristic family). Deterministic
    * fixed-priority argmax — ties resolve en > de > fr > und. */
  def langId(text: Column): Column = {
    def votes(stops: Seq[String]): Column =
      size(filter(tokens(text), x => x.isin(stops.map(_.asInstanceOf[Any]): _*)))
    val en = votes(Seq("the", "a", "of", "and", "is"))
    val de = votes(Seq("der", "die", "das", "und", "ist"))
    val fr = votes(Seq("le", "la", "et", "les", "est"))
    when(en >= de && en >= fr && en > 0, "en")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Additive 0-100 quality score from length/stopword/diversity signals
    * (reference risk-score shape, 02:159-164, applied to text quality). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val len = length(text)
    (when(len.between(50, 2000), 25).otherwise(0)
      + when(stopwordRatio(text, stopwords) > 0.03, 25).otherwise(0)
      + when(avgTokenLen(text).between(2.0, 12.0), 25).otherwise(0)
      + when(typeTokenRatio(text) > 0.3, 25).otherwise(0)).cast("int")
  }
}
