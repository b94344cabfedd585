package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring deduplication (north-star; Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", 2021, ExactSubstr): remove
  * every span of `gramLen`+ tokens that occurs more than once in the corpus,
  * keeping ONE surviving occurrence (the globally minimum `(doc, position)`),
  * instead of dropping whole near-duplicate documents.
  *
  * Spark-first construction (the reference paper builds a monolithic suffix
  * array — a single-machine artifact that cannot shard): the corpus expands
  * to per-occurrence gram hashes, duplicated grams are found with one hash
  * aggregation, and non-surviving occurrences are swept out of each document
  * with a codegen'd interval-merge kernel.
  *
  * 100 TB posture:
  *  - the occurrence expansion shuffles `(8-byte gram hash, id, int pos)`
  *    rows — one per token position, the irreducible cost of exact-substring
  *    dedup, as a uniform hash shuffle (no cartesian, no suffix array);
  *  - the duplicate-gram aggregation is a partial+final hash agg with
  *    map-side combine (`min(struct)` survivor + count), so a boilerplate
  *    gram repeated a billion times arrives at the reducer as one row per
  *    map partition, not a billion rows;
  *  - per-doc kill lists (`collect_list` of starts) are bounded by document
  *    length, and the text rebuild is an O(tokens + starts) merged sweep in
  *    whole-stage codegen.
  *
  * Output text is the NORMALIZED token stream (lowercased, single-spaced) —
  * the usual representation inside curation pipelines; positions refer to it.
  */
object SubstringDedup {

  /** Returns `df` with `<textCol>_deduped` (duplicated spans removed,
    * survivor occurrences kept), plus `n_tokens` and `n_removed_tokens`.
    *
    * @param gramLen  minimum duplicated-span length in tokens (the paper
    *                 uses 50; small corpora/tests want smaller)
    * @param minOccurrences a gram is duplicated when its global occurrence
    *                 count reaches this (2 = any repeat, within or across
    *                 documents)
    */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String = "text",
      gramLen: Int = 50,
      minOccurrences: Int = 2
  ): DataFrame = {
    require(gramLen > 0, "gramLen must be positive")
    require(minOccurrences >= 2, "minOccurrences below 2 would dedup unique text")
    val withToks = df.withColumn("__toks", TextFunctions.tokens(col(textCol)))

    // one row per gram occurrence: (hash, doc, start)
    val occurrences = withToks.select(col(idCol).alias("__did"),
      posexplode(TextFunctions.positionalShingles64(col("__toks"), gramLen))
        .as(Seq("__pos", "__g")))

    // duplicated grams + their surviving occurrence. min(struct) orders by
    // (doc, pos) lexicographically — deterministic across runs.
    val dupGrams = occurrences
      .groupBy(col("__g"))
      .agg(count(lit(1)).alias("__c"),
        min(struct(col("__did"), col("__pos"))).alias("__surv"))
      .filter(col("__c") >= minOccurrences)
      .select(col("__g"), col("__surv"))

    // kill list: every non-surviving occurrence, folded to per-doc sorted
    // start arrays (bounded by tokens-per-doc)
    val kills = occurrences.join(dupGrams, Seq("__g"))
      .filter(col("__did") =!= col("__surv.__did") ||
        col("__pos") =!= col("__surv.__pos"))
      .groupBy(col("__did"))
      .agg(sort_array(collect_list(col("__pos"))).alias("__starts"))

    withToks
      .join(kills, col(idCol) === col("__did"), "left")
      .withColumn(s"${textCol}_deduped",
        when(col("__starts").isNull, concat_ws(" ", col("__toks")))
          .otherwise(TextFunctions.dropCoveredTokens(col("__toks"), col("__starts"), gramLen)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("n_removed_tokens",
        size(col("__toks")) -
          when(length(col(s"${textCol}_deduped")) === 0, lit(0))
            .otherwise(size(split(col(s"${textCol}_deduped"), " "))))
      .drop("__toks", "__did", "__starts")
  }
}
