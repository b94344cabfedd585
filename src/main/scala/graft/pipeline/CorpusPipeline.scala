package graft.pipeline

import graft.operators.{Dedup, TextAnalysis}
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LLM training-corpus curation — the composed north-star pipeline:
  *
  * ```
  * documents → quality score ≥ min   (length/stopword/punctuation recipe)
  *           → language allow-list   (function-word n-gram heuristic)
  *           → exact dedup           (content fingerprint)
  *           → near-dup removal      (MinHash+LSH pairs; keep the lowest id
  *                                    of each connected pair)
  *           → curated frame + funnel report
  * ```
  *
  * Scale posture: the first three stages are narrow (per-row expressions +
  * one fingerprint dropDuplicates shuffle); near-dup uses the bucketed LSH
  * join (no cartesian) and removes via a broadcast-friendly left-anti join
  * on the (small) kill-list. The funnel counts come from ONE pass per stage
  * boundary, not per-row driver loops.
  */
object CorpusPipeline {

  final case class FunnelReport(
      input: Long,
      afterQuality: Long,
      afterLanguage: Long,
      afterExactDedup: Long,
      afterNearDup: Long
  )

  /** Curate `docs` (needs `doc_id` and `textCol`); returns the curated frame
    * and the per-stage funnel.
    */
  def curate(
      docs: DataFrame,
      textCol: String = "text",
      minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en"),
      shingleSize: Int = 3,
      minJaccard: Double = 0.9,
      segmentDedup: Boolean = false,
      jsonlPath: Option[String] = None,
      jsonlShards: Int = 0
  ): (DataFrame, FunnelReport) = {
    // One annotated pass over the corpus (quality + language are the two
    // expensive per-row expressions), persisted once with disk spill; every
    // stage count then comes from ONE aggregation over the cache instead of
    // an action per stage boundary. after_exact = countDistinct(fingerprint)
    // of the survivors — no need to materialize the dedup before counting it.
    val annotated = docs
      .withColumn("quality_score",
        TextFunctions.qualityScore(col(textCol), TextAnalysis.defaultStopwords))
      .withColumn("lang_pred", TextAnalysis.langIdCol(col(textCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qOk = col("quality_score") >= minQuality
    val lOk = qOk && col("lang_pred").isin(allowedLangs: _*)
    val langed = annotated.filter(lOk)
    // Deterministic survivor (min doc_id per fingerprint) so curation is
    // reproducible run to run. NOT persisted: its only eager consumer is the
    // shingle projection below (which IS cached and serves every near-dup
    // read); the returned curated frame recomputes it lazily on first use.
    val exact = Dedup.exactByContentKeepMin(langed, "doc_id", textCol)
    // ONE shingle pass over the exact-dedup survivors, shared by the LSH
    // band derivation AND the Jaccard verify joins (the near-dup stage's
    // dominant cost used to be re-shingling this frame from raw text per
    // consumer). Cached as (doc_id, int-set) — far smaller than the text.
    val shingled = Dedup.shingleProjection(exact, "doc_id", textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Near-dup kill-list via CONNECTED COMPONENTS over the pair graph:
      // each transitive cluster keeps its minimum id (pairwise removal would
      // keep both ends of an A~B~C chain). No broadcast hint — the kill-list
      // scales with the corpus's duplicate fraction, so AQE decides.
      val pairs = Dedup.minhashLshPairsFromShingles(shingled,
        minJaccard = minJaccard)
      val comps = Dedup.connectedComponents(pairs)
      val kill  = comps.filter(col("id") =!= col("component"))
        .select(col("id").alias("doc_id"))
      val curated = exact.join(kill, Seq("doc_id"), "left_anti")
      // kill ids are a subset of exact's (pairs were built FROM exact), so
      // the funnel count is exact arithmetic over the tiny kill list — no
      // full anti-join action just for the report. The stage-count agg and
      // the kill count are folded into ONE action (a crossJoin of two
      // single-row aggregates, planned as a broadcast of one row): Spark
      // submits the two independent stage DAGs of the single job
      // concurrently, so their latencies overlap like the former
      // driver-side Future pair did — but with no thread-pool contention
      // when the box is loaded (two racing actions degraded ~3× under
      // load; one job's stage scheduling does not).
      val stats = annotated.agg(
          count(lit(1)).alias("input"),
          coalesce(sum(when(qOk, 1L)), lit(0L)).alias("q"),
          coalesce(sum(when(lOk, 1L)), lit(0L)).alias("l"),
          countDistinct(when(lOk, md5(lower(trim(col(textCol)))))).alias("e"))
        .crossJoin(kill.agg(count(lit(1)).alias("nkill")))
        .head()
      val input    = stats.getLong(0)
      val nQuality = stats.getLong(1)
      val nLang    = stats.getLong(2)
      val nExact   = stats.getLong(3)
      val nKill    = stats.getLong(4)
      val nFinal   = nExact - nKill

      // Optional PARAGRAPH-granularity segment dedup (RefinedWeb-style):
      // cross-corpus repeated paragraphs survive only at their first
      // occurrence, documents are rewritten in place. Count-neutral by
      // construction (segmentDedup empties docs, never drops them), so the
      // funnel report above stays exact.
      val finalFrame =
        if (!segmentDedup) curated
        else {
          val rewritten = graft.operators.PassageDedup.paragraphDedup(
            curated.select(col("doc_id"), col(textCol)), "doc_id", textCol)
          curated.drop(textCol).join(rewritten, Seq("doc_id"))
        }

      // Lazy checkpoint FIRST: report-only consumers (the funnel query,
      // monitors) never pay to materialize the curated frame; the lineage
      // cut happens on a consumer's first action.
      val published = finalFrame.localCheckpoint(eager = false)

      // Optional JSONL interchange export — the training-corpus handoff
      // leg. Exporting THROUGH the lazy checkpoint makes the export job
      // populate the checkpoint blocks (inside the cached scope, so it
      // also reuses `annotated`/`shingled`): a caller that exports and
      // then keeps querying the returned frame computes the funnel once,
      // not once per consumer.
      jsonlPath.foreach(p => graft.sinks.CorpusJsonl.write(published, p, jsonlShards))

      (published, FunnelReport(input, nQuality, nLang, nExact, nFinal))
    } finally {
      annotated.unpersist(); shingled.unpersist()
    }
  }

  /** Per-document curation PROVENANCE — the audit answer to "why is doc X
    * not in the corpus": one row per input doc labeled with the FIRST
    * stage that dropped it, plus the responsible twin where one exists.
    *
    * `stage` ∈ `quality` | `language` | `exact_dup` | `near_dup` |
    * `survived`; `twin_id` is the exact-dup WINNER (min doc_id of the
    * fingerprint group) or the near-dup cluster representative (the
    * component's min id), NULL for the other stages. Stage semantics
    * mirror [[curate]] exactly — same expressions, same deterministic
    * survivor rules — so `filter(stage = 'survived')` equals the curated
    * id set.
    *
    * Scale shape: quality/language are per-row expressions; the exact
    * stage is one fingerprint aggregation (winner = min id) joined back
    * by fingerprint (16-byte keys, never text); the optional near-dup
    * stage reuses the same shingle projection + LSH pair graph + connected
    * components as [[curate]]. Provenance costs one extra fingerprint
    * join over running the funnel itself.
    */
  def provenance(
      docs: DataFrame,
      textCol: String = "text",
      minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en"),
      shingleSize: Int = 3,
      minJaccard: Double = 0.9,
      nearDup: Boolean = true
  ): DataFrame = {
    val annotated = docs
      .withColumn("quality_score",
        TextFunctions.qualityScore(col(textCol), TextAnalysis.defaultStopwords))
      .withColumn("lang_pred", TextAnalysis.langIdCol(col(textCol)))
      .withColumn("__fp", md5(lower(trim(col(textCol)))))
    // NULL-text docs score NULL: coalesce the gates to false so a null
    // row labels as its failing stage — a bare `when(!gate)` chain would
    // let three-valued NULLs fall through every branch to 'survived',
    // disagreeing with curate() (whose filters drop NULL as false)
    val qOk = coalesce(col("quality_score") >= minQuality, lit(false))
    val lOk = coalesce(col("lang_pred").isin(allowedLangs: _*), lit(false))
    // exact-dup winners among the docs that reach the exact stage
    val winners = annotated.filter(qOk && lOk)
      .groupBy(col("__fp"))
      .agg(min(col("doc_id")).alias("__winner"))
    val labeled0 = annotated
      .join(winners, Seq("__fp"), "left")
      .select(col("doc_id"), col("quality_score"), col("lang_pred"),
        col(textCol), qOk.alias("__q"), lOk.alias("__l"),
        col("__winner"))
    val kill =
      if (!nearDup) labeled0.limit(0)
        .select(col("doc_id"), col("doc_id").alias("__rep"))
      else {
        val exact = labeled0
          .filter(col("__q") && col("__l") && col("doc_id") === col("__winner"))
          .select(col("doc_id"), col(textCol))
        val shingled = Dedup.shingleProjection(exact, "doc_id", textCol,
          shingleSize)
        val pairs = Dedup.minhashLshPairsFromShingles(shingled,
          minJaccard = minJaccard)
        Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("component"))
          .select(col("id").alias("doc_id"), col("component").alias("__rep"))
      }
    val passedGates = col("__q") && col("__l")
    labeled0.join(kill, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!col("__q"), lit("quality"))
          .when(!col("__l"), lit("language"))
          .when(col("doc_id") =!= col("__winner"), lit("exact_dup"))
          .when(col("__rep").isNotNull, lit("near_dup"))
          .otherwise(lit("survived")).alias("stage"),
        when(passedGates && col("doc_id") =!= col("__winner"), col("__winner"))
          .when(passedGates, col("__rep"))
          .otherwise(lit(null).cast("long")).alias("twin_id"))
  }
}
