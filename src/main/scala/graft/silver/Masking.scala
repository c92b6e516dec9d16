package graft.silver

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking/tokenization Column combinators.
  *
  * Reference behavior: `/root/reference/02_Silver_Cleanse_PII.py:67-73`
  * (`mask_card_number`, `tokenize_name`). These are plan-construction-time
  * Column builders, NOT UDFs — they stay inside WholeStageCodegen, so masking
  * a 100 TB table costs one codegen'd projection pass with zero JVM↔
  * interpreter boundary.
  */
object Masking {

  /** Keep only the last 4 characters: `****-****-****-1234`.
    * Ref: 02_Silver_Cleanse_PII.py:67-69. */
  def maskCardNumber(c: Column): Column =
    concat(lit("****-****-****-"), substring(c, -4, 4))

  /** Deterministic non-reversible join token: SHA-256 of the normalized value.
    * Deterministic ⇒ the token remains a valid equi-join/groupBy key across
    * tables, which is the whole point (group by cardholder without PII).
    * Ref: 02_Silver_Cleanse_PII.py:71-73. */
  def tokenize(c: Column): Column = sha2(lower(trim(c)), 256)

  /** Generic redaction: keep `keepLast` chars, mask the rest with `*`. */
  def redactAllButLast(c: Column, keepLast: Int): Column =
    regexp_replace(c, s".(?=.{$keepLast})", "*")
}
