package graft.streaming

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus intake — the north-star curation funnel as a
  * Structured Streaming pipeline: documents arrive in micro-batches, pass
  * the same quality/language expressions the batch
  * [[graft.pipeline.CorpusPipeline]] uses, and exact-dedup ACROSS batches
  * on a content fingerprint with keyed state, emitting only each
  * fingerprint's first-ever arrival (min doc_id within a batch, first
  * batch wins across batches — deterministic for a fixed batch sequence).
  *
  * State is one empty entry per distinct fingerprint seen — the inherent
  * cost of global streaming dedup. For bounded state at 100 TB-scale
  * ingest, either run the RocksDB state store (spills off-heap to disk;
  * `spark.sql.streaming.stateStore.providerClass`) or bound the horizon
  * with `dedupTtl` (event-time TTL: a fingerprint unseen for the TTL can
  * re-enter — the usual freshness/completeness trade).
  */
object CorpusStreaming {

  final case class CuratedDoc(doc_id: Long, text: String,
      quality_score: Double, lang_pred: String)

  /** Filter + language-ID + cross-batch fingerprint dedup.
    *
    * @param docs streaming DataFrame with at least (`doc_id` long,
    *             `text` string)
    * @param dedupTtlMinutes processing-time TTL for dedup state; ≤0 keeps
    *             state forever (exact global dedup)
    */
  def curateStream(docs: DataFrame, minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en", "und"),
      dedupTtlMinutes: Int = 0): Dataset[CuratedDoc] = {
    implicit val outEnc = Encoders.product[CuratedDoc]
    implicit val keyEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean

    val scored = docs
      .withColumn("quality_score",
        TextFunctions.qualityScore(col("text"), TextAnalysis.defaultStopwords))
      .withColumn("lang_pred", TextAnalysis.langIdCol(col("text")))
      .filter(col("quality_score") >= minQuality &&
        col("lang_pred").isin(allowedLangs: _*))
      .select(col("doc_id").cast("long"), col("text"),
        col("quality_score").cast("double"), col("lang_pred"),
        md5(lower(trim(col("text")))).alias("__fp"))
      .as[(Long, String, Double, String, String)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.scalaDouble, Encoders.STRING, Encoders.STRING))

    def update(fp: String, rows: Iterator[(Long, String, Double, String, String)],
        state: GroupState[Boolean]): Iterator[CuratedDoc] = {
      if (rows.isEmpty && state.hasTimedOut) {
        state.remove() // TTL horizon passed — forget the fingerprint
        Iterator.empty
      } else {
        val seen = state.getOption.contains(true)
        def arm(): Unit =
          if (dedupTtlMinutes > 0)
            state.setTimeoutDuration(s"$dedupTtlMinutes minutes")
        if (seen) { arm(); Iterator.empty }
        else {
          state.update(true)
          arm()
          val first = rows.minBy(_._1) // deterministic within-batch survivor
          Iterator.single(CuratedDoc(first._1, first._2, first._3, first._4))
        }
      }
    }

    scored
      .groupByKey(_._5)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (dedupTtlMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(update)
  }
}
