package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequent passage (boilerplate) detection — the cross-document
  * repeated-text signal behind substring-level dedup of training corpora
  * (repeated boilerplate — headers, license blurbs, navigation text —
  * appears verbatim across many documents and is worth dropping or
  * down-weighting even when whole documents are not duplicates; cf. Lee et
  * al. 2021, "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499, which dedups at the substring level for this reason).
  *
  * Construction: distinct word-`n`-grams per document → corpus document
  * frequency per gram → each document scored by the fraction of its grams
  * that are corpus-frequent (df ≥ `minDf`). At scale the explode carries
  * 8-byte xxhash64 gram hashes, never gram text; the DF count and the
  * per-doc re-join are both partial+final hash aggregates keyed on the
  * gram hash (uniform — no hot key can exceed the corpus doc count).
  */
object PassageDedup {

  /** Distinct word-`n`-gram strings of `text` (empty array when the doc has
    * fewer than `n` tokens — unlike shingle fingerprinting, a short doc has
    * NO repeated-passage evidence, so it scores 0 rather than contributing
    * a degenerate whole-doc gram). Reference semantics for the hashed
    * kernel below; the operator itself never materializes gram strings.
    */
  def ngrams(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Per-document boilerplate stats: (`idCol`, `n_grams`, `n_frequent`,
    * `frequent_frac`, `boilerplate`). A gram is frequent when it appears in
    * at least `minDf` distinct documents; a document is flagged when at
    * least `maxFrac` of its distinct grams are frequent. Documents with
    * null/short text keep their row (n_grams = 0, not flagged).
    */
  def boilerplateStats(docs: DataFrame, idCol: String, textCol: String = "text",
      n: Int = 3, minDf: Long = 5, maxFrac: Double = 0.5): DataFrame = {
    require(minDf > 1, "minDf must exceed 1 — every gram has df >= 1")
    require(maxFrac > 0 && maxFrac <= 1, "maxFrac in (0,1]")
    // (doc, gram-hash) pairs via the single-pass codegen'd kernel — gram
    // strings are never materialized and the shuffle payload is 8-byte
    // hashes (value-equivalent to exploding [[ngrams]] and hashing, minus
    // a 2⁻⁶⁴-per-pair collision)
    val exploded = docs
      .select(col(idCol), explode_outer(
        graft.functions.TextFunctions.hashedShingles64(
          graft.functions.TextFunctions.tokens(col(textCol)), n)).alias("__gh"))
      .select(col(idCol), col("__gh"), col("__gh").isNotNull.alias("__real"))
    // document frequency per gram (distinct docs — grams are per-doc distinct
    // already, so a plain count is the doc count)
    val df = exploded.filter(col("__real"))
      .groupBy(col("__gh")).agg(count(lit(1)).alias("__df"))
    val frequent = df.filter(col("__df") >= minDf).select(col("__gh"))
    exploded
      .join(frequent.withColumn("__freq", lit(true)), Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("__real"), 1L).otherwise(0L)).alias("n_grams"),
        sum(when(col("__freq").isNotNull && col("__real"), 1L).otherwise(0L))
          .alias("n_frequent"))
      .withColumn("frequent_frac",
        when(col("n_grams") > 0, col("n_frequent").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
      .withColumn("boilerplate",
        col("n_grams") > 0 && col("frequent_frac") >= maxFrac)
  }

  /** The corpus with boilerplate-dominated documents removed. */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String = "text",
      n: Int = 3, minDf: Long = 5, maxFrac: Double = 0.5): DataFrame = {
    val kill = boilerplateStats(docs, idCol, textCol, n, minDf, maxFrac)
      .filter(col("boilerplate")).select(col(idCol))
    docs.join(kill, Seq(idCol), "left_anti")
  }

  /** Corpus-wide exact LINE dedup — the RefinedWeb / MassiveText recipe
    * (Penedo et al. 2023 §3.3; Rae et al. 2021): a line that repeats across
    * documents (headers, nav bars, cookie banners, signatures) is kept only
    * at its FIRST occurrence in (`idCol`, line-position) order and removed
    * everywhere else; each document's remaining lines are re-joined in
    * their original order. Complements [[boilerplateStats]]: that flags
    * whole gram-dominated documents, this surgically removes the repeated
    * lines themselves.
    *
    * Matching is on the md5 of the TRIMMED line; lines whose trimmed form
    * is empty are structural whitespace, not content — they never match
    * each other and always survive. A null-text document passes through
    * unchanged.
    *
    * Shape at scale: the winner-election aggregate shuffles one
    * (16-byte digest, id, pos) triple per line with map-side combine; the
    * verdict join is an equi-join on the digest (uniform — no hot key);
    * the rebuild is one hash aggregate on `idCol` whose `sort_array` sorts
    * only within a document. No window over the whole corpus, no cartesian.
    * Returns (`idCol`, `textCol`) with `textCol` rewritten.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame =
    segmentDedup(docs, idCol, textCol, splitPattern = "\n", joinSep = "\n")

  /** [[lineDedup]] at PARAGRAPH granularity (RefinedWeb also dedups whole
    * paragraphs): segments split on blank-line runs and rejoin with a
    * normalized `\n\n` — so variable blank spacing canonicalizes, a
    * documented rewrite rather than a silent one.
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame =
    segmentDedup(docs, idCol, textCol, splitPattern = "\n{2,}", joinSep = "\n\n")

  private def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      splitPattern: String, joinSep: String): DataFrame = {
    val nullDocs = docs.filter(col(textCol).isNull).select(col(idCol), col(textCol))
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), splitPattern)).as(Seq("__pos", "__line")))
      .withColumn("__key",
        when(length(trim(col("__line"))) > 0, md5(trim(col("__line")))))
    val winners = lines.filter(col("__key").isNotNull)
      .groupBy(col("__key"))
      .agg(min(struct(col(idCol).alias("id"), col("__pos").alias("pos"))).alias("__first"))
    val kept = lines
      .join(winners, Seq("__key"), "left")
      .filter(col("__key").isNull ||
        (col("__first.id") === col(idCol) && col("__first.pos") === col("__pos")))
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(concat_ws(joinSep,
        transform(
          sort_array(collect_list(struct(col("__pos"), col("__line")))),
          e => e.getField("__line"))).alias(textCol))
    // a document whose every line was a later duplicate keeps its row with
    // empty text — silently dropping it would corrupt downstream id joins
    docs.filter(col(textCol).isNotNull).select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).alias(textCol))
      .unionByName(nullDocs)
  }
}
