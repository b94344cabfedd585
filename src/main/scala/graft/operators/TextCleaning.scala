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

  // ---- homoglyph / confusable skeleton ---------------------------------

  /** Unicode confusables that spammers substitute to dodge exact dedup
    * and blocklists: Cyrillic and Greek letters whose glyphs are
    * (near-)identical to Basic Latin, mapped to their Latin skeleton —
    * the high-frequency subset of Unicode TR39's confusable table, kept
    * deliberately small and mirrored LITERALLY into the DuckDB oracle so
    * both engines run the same `translate`. Order-aligned with
    * [[confusableTo]].
    */
  val confusableFrom: String =
    "аеорсухіѕԁһј" + "οϲ" + "АВЕКМНОРСТХ"
  val confusableTo: String =
    "aeopcyxisdhj" + "oc" + "ABEKMHOPCTX"
  require(confusableFrom.length == confusableTo.length,
    "confusable map must be 1:1")

  /** Zero-width characters (ZWSP, ZWNJ, ZWJ, BOM) that make visually
    * identical strings byte-distinct. `\x{...}` hex escapes are
    * Java-and-RE2-common syntax, so the same pattern text runs in the
    * DuckDB oracle.
    */
  val zeroWidthPattern: String =
    "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"

  /** Confusable SKELETON of a text: zero-width characters stripped,
    * confusables folded to Latin, lowercased, whitespace collapsed — the
    * dedup key that catches "identical except the spammer swapped
    * Cyrillic о for Latin o" twins that byte-exact fingerprints miss.
    * All builtin expressions (translate + regexp_replace), codegen'd.
    */
  def confusableSkeleton(text: Column): Column =
    trim(regexp_replace(
      lower(translate(regexp_replace(text, zeroWidthPattern, ""),
        confusableFrom, confusableTo)),
      "\\s+", " "))

  /** Skeleton-exact dedup labels: one row per doc with its skeleton
    * fingerprint group's deterministic winner (min id) and whether the
    * doc is a confusable-spoof duplicate (same skeleton, different raw
    * bytes would also land here — the skeleton subsumes exact dedup).
    *
    * Shape: a whole-partition window min over the skeleton hash — ONE
    * scan of the text (the zero-width strip + translate kernel is the
    * dominant cost; a groupBy-then-join formulation evaluates it twice,
    * once per join side) and ONE exchange whose payload is the 16-byte
    * md5, not the document.
    */
  def homoglyphDedup(docs: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = md5(confusableSkeleton(col(textCol)))
    docs.select(col(idCol), sk.alias("__sk"))
      .withColumn("winner",
        min(col(idCol)).over(Window.partitionBy(col("__sk"))))
      .select(col(idCol), col("winner"),
        (col(idCol) =!= col("winner")).alias("is_dup"))
  }
}
