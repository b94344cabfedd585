package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup/URL cleaning for web-scraped training text — the normalize pass
  * that precedes quality scoring and dedup in a corpus pipeline: strip HTML
  * tags, unescape the common entities, count/remove URLs, collapse the
  * whitespace the removals leave behind. All codegen'd `regexp_replace`/
  * `regexp_count` expressions — narrow, no shuffle, no UDFs — with patterns
  * restricted to Java-and-RE2-common syntax so the same pattern text runs
  * in SQL engines for validation.
  */
object TextCleaning {

  val tagPattern: String = "<[^>]*>"
  // negated class must exclude ALL whitespace — an end-of-line URL would
  // otherwise swallow the newline and the next line's first word
  val urlPattern: String = "https?://[^\\s<>\"']+"

  /** Basic named-entity unescape (the handful that dominate scraped text).
    * `&amp;` goes LAST so `&amp;lt;` decodes to the literal `&lt;`, not `<`.
    */
  def unescapeEntities(text: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Tags out, entities decoded, URLs dropped, spaces/tabs collapsed. */
  def cleanCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(unescapeEntities(regexp_replace(text, tagPattern, " ")),
        urlPattern, " "),
      "[ \t]+", " "))

  def urlCount(text: Column): Column = regexp_count(text, lit(urlPattern))

  /** Adds `text_clean` and `n_urls` next to the raw column. */
  def clean(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_urls", urlCount(col(textCol)))
      .withColumn("text_clean", cleanCol(col(textCol)))
}
