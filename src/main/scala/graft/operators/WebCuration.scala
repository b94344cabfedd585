package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the provenance dimension of web-scale
  * training data: which hosts a document cites, per-domain corpus
  * statistics (crawl-quality dashboards, licensing audits), and
  * blocklist-based document removal (spam/adult/low-quality domain lists à
  * la URL-filtered web corpora).
  *
  * Patterns stay in the Java∩RE2 syntax subset (same discipline as
  * [[TextCleaning]] / [[Redaction]]) so the identical pattern text runs in
  * SQL engines for validation. Domain extraction is a narrow codegen'd
  * `regexp_extract_all`; the only shuffles are the per-domain aggregation
  * (map-side partial) and the broadcast blocklist join — nothing wide at
  * 100 TB.
  */
object WebCuration {

  /** Capture group 1 = the host part of an http(s) URL: everything after
    * `://` up to the first `/`, whitespace, quote, or angle bracket.
    */
  val domainPattern: String = "https?://([^\\s<>\"'/]+)"

  /** Prose punctuation that ends up glued to a bare URL ("see evil.com,"
    * or "(https://evil.com)") — stripped from the captured host so a
    * blocklisted domain can't slip past [[blocklistFilter]] behind a comma
    * and [[domainStats]] doesn't fragment one host into several keys.
    * Anchored suffix class in the Java∩RE2 subset (no lookaround).
    */
  val trailingPunctPattern: String = "[.,;:!?)\\]]+$"

  /** All (lowercased, punctuation-stripped) domains mentioned in `text`,
    * in order of appearance. A URL that is *all* punctuation after the
    * scheme strips to the empty string and is dropped.
    */
  def extractDomains(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(domainPattern), lit(1)),
        d => regexp_replace(lower(d), lit(trailingPunctPattern), lit(""))),
      d => d =!= "")

  /** Whole-URL twin of [[domainPattern]]: the full http(s) URL token. */
  val urlPattern: String = "https?://[^\\s<>\"']+"

  /** All URLs mentioned in `text` (trailing prose punctuation stripped). */
  def extractUrls(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(urlPattern), lit(0)),
        u => regexp_replace(u, lit(trailingPunctPattern), lit(""))),
      u => u =!= "")

  /** URL canonicalization for web-corpus dedup by provenance: the same page
    * fetched as `https://Example.com:443/a/?utm_source=x#frag` and
    * `https://example.com/a/` must collapse to one key before URL-level
    * dedup or per-page statistics. Steps (each a Java∩RE2 regex, so the
    * identical chain replays in SQL engines for validation):
    *  1. drop the fragment;
    *  2. lowercase scheme+host (path/query case preserved — paths are
    *     case-sensitive);
    *  3. drop default ports (`:80` for http, `:443` for https);
    *  4. strip tracking parameters (`utm_*`, `gclid`, `fbclid`);
    *  5. strip dangling `?`/`&` and trailing slashes.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^(https?://[^/?#]+)", 1)),
      regexp_replace(noFrag, "^https?://[^/?#]+", ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^:/?#]+):80($|[/?].*)", "$1$2"),
      "^(https://[^:/?#]+):443($|[/?].*)", "$1$2")
    val noTrack = regexp_replace(
      regexp_replace(noPort, "(utm_[a-z0-9_]*|gclid|fbclid)=[^&#]*&", ""),
      "[?&](utm_[a-z0-9_]*|gclid|fbclid)=[^&#]*$", "")
    val cleaned = regexp_replace(
      regexp_replace(noTrack, "\\?&", "?"), "[?&]+$", "")
    regexp_replace(cleaned, "/+$", "")
  }

  /** Per-domain corpus stats: one row per domain with `n_docs` (documents
    * mentioning it) and `n_urls` (total mentions). One explode + one
    * partial+final hash aggregate keyed on domain.
    */
  def domainStats(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(extractDomains(col(textCol))).alias("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col(idCol)).alias("n_docs"), count(lit(1)).alias("n_urls"))

  /** Matches `domain` against a blocklist entry exactly or as a parent
    * domain (`evil.com` blocks `sub.evil.com` but not `notevil.com`).
    */
  private def blockedBy(domain: Column, blocked: Column): Column =
    domain === blocked || domain.endsWith(concat(lit("."), blocked))

  /** Drop every document that mentions a blocked domain (or a subdomain of
    * one). `blocklist` is a one-column (`domain`) frame — domain lists are
    * small next to a corpus, so it broadcasts and the match is a
    * broadcast theta join on the doc's distinct domains, then a left-anti
    * join back on the id.
    */
  def blocklistFilter(docs: DataFrame, blocklist: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    require(blocklist.columns.sameElements(Array("domain")),
      s"blocklist must have exactly one column 'domain', got ${blocklist.columns.mkString(",")}")
    val docDomains = docs.select(col(idCol),
      explode(array_distinct(extractDomains(col(textCol)))).alias("__d"))
    val hit = docDomains
      .join(broadcast(blocklist.select(lower(col("domain")).alias("__b"))),
        blockedBy(col("__d"), col("__b")))
      .select(col(idCol)).distinct()
    docs.join(hit, Seq(idCol), "left_anti")
  }
}
