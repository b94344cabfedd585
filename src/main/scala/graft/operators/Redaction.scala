package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the privacy pass every
  * LLM training pipeline runs before packing. Pattern-based (emails, IPv4
  * addresses, phone-like digit runs), implemented as codegen'd
  * `regexp_count`/`regexp_replace` — narrow per-row expressions, no shuffle,
  * no UDFs, linear in corpus size.
  *
  * Patterns deliberately use only syntax common to Java regex and RE2
  * (no lookaround, no backreferences, no `\s` — whose character classes
  * differ across engines) so the same pattern text runs in Spark and in
  * SQL engines for validation.
  */
object Redaction {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  /** Phone-like: optional +, then 9+ digits allowing separators. */
  val phonePattern: String = "\\+?[0-9][0-9 ().-]{7,}[0-9]"

  /** Per-document PII counts: `n_emails`, `n_ipv4`, `n_phones`. */
  def detect(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(emailPattern)))
      .withColumn("n_ipv4", regexp_count(col(textCol), lit(ipv4Pattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phonePattern)))

  /** Redacted text column: emails → `[EMAIL]`, IPv4 → `[IP]`, phone-like
    * runs → `[PHONE]`. Email first so its digits can't half-match the phone
    * pattern; IP before phone so dotted quads don't read as phone digits.
    */
  def redactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern, "[IP]"),
      phonePattern, "[PHONE]")

  def redact(docs: DataFrame, textCol: String = "text",
      outCol: String = "text_redacted"): DataFrame =
    docs.withColumn(outCol, redactCol(col(textCol)))
}
