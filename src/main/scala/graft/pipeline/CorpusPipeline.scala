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
      minJaccard: Double = 0.9
  ): (DataFrame, FunnelReport) = {
    val input = docs.count()

    // Persist each stage frame before its funnel count: the counts are
    // actions, and without the persists every stage's lineage (scan,
    // quality scoring, language ID, dedup shuffle) would re-execute for
    // each downstream boundary.
    val scored = docs.withColumn("quality_score",
      TextFunctions.qualityScore(col(textCol), TextAnalysis.defaultStopwords))
    val quality = scored.filter(col("quality_score") >= minQuality).persist()
    val langed = quality
      .withColumn("lang_pred", TextAnalysis.langIdCol(col(textCol)))
      .filter(col("lang_pred").isin(allowedLangs: _*))
      .persist()
    // Deterministic survivor (min doc_id per fingerprint) so curation is
    // reproducible run to run.
    val exact = Dedup.exactByContentKeepMin(langed, "doc_id", textCol).persist()
    try {
      val nQuality = quality.count()
      val nLang    = langed.count()
      val nExact   = exact.count()

      // Near-dup kill-list via CONNECTED COMPONENTS over the pair graph:
      // each transitive cluster keeps its minimum id (pairwise removal would
      // keep both ends of an A~B~C chain). No broadcast hint — the kill-list
      // scales with the corpus's duplicate fraction, so AQE decides.
      val pairs = Dedup.minhashLshPairs(exact, "doc_id", textCol,
        shingleSize = shingleSize, minJaccard = minJaccard)
      val comps = Dedup.connectedComponents(pairs)
      val kill  = comps.filter(col("id") =!= col("component"))
        .select(col("id").alias("doc_id"))
      val curated = exact.join(kill, Seq("doc_id"), "left_anti")
      val nFinal  = curated.count()

      (curated.localCheckpoint(), FunnelReport(input, nQuality, nLang, nExact, nFinal))
    } finally {
      quality.unpersist(); langed.unpersist(); exact.unpersist()
    }
  }
}
