package graft.streaming

import graft.operators.{Dedup, HashIndex, Multimodal}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Streaming MULTIMODAL intake — the image/audio/video twin of
  * [[CorpusStreaming.nearDupIngest]], with the identical replay contract:
  * each micro-batch fingerprints its media rows
  * ([[Multimodal.mediaHashes]] — one 64-bit perceptual hash per item,
  * modality-dispatched), dedups them against the persisted banded-hash
  * index of everything accepted so far AND within the batch itself, writes
  * accepted rows to a batch partition, and republishes the index at a
  * batch-versioned path.
  *
  * `foreachBatch` + a lake-resident [[HashIndex]] rather than keyed state:
  * 16 bytes/item of dedup state lives in the lake, survives restarts,
  * serves offline consumers, and never bloats the state store. A retried
  * batch reads the newest index version STRICTLY BELOW its own id (never
  * its own partial output), re-derives the same accepted set, and
  * overwrites its own version and accepted partition — idempotent by
  * construction.
  */
object MediaStreaming {

  /** Start with `.option("checkpointLocation", …).start()`; accepted rows
    * land under `acceptedRoot/batch=<id>/`, index versions under
    * `indexRoot/v<id>/`.
    */
  def mediaIngest(media: DataFrame, indexRoot: String, acceptedRoot: String,
      maxHamming: Int = 7, keepIndexVersions: Int = 7)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(keepIndexVersions >= 2,
      s"keepIndexVersions must be >= 2 (strictly-below replay safety), " +
        s"got $keepIndexVersions") // fail at BUILD time, not mid-stream
    media.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        implicit val enc = Encoders.product[Multimodal.MediaRow]
        val rows = batch.select(col("media_id").cast("long"), col("kind"),
          col("uri"), col("payload")).as[Multimodal.MediaRow]
        val hashes = Multimodal.mediaHashes(rows)
          .withColumnRenamed("media_id", "id").localCheckpoint()

        // cross-batch leg: probe the newest index version strictly below us
        // (same dir convention as the text index, so the lookup is shared)
        val dupVsIndex = Dedup.latestNearDupIndexVersion(spark, indexRoot, batchId) match {
          case Some(v) =>
            HashIndex.probe(HashIndex.read(spark, s"$indexRoot/v$v"), hashes, maxHamming)
              .select("id").distinct()
          case None => hashes.limit(0).select("id")
        }
        // in-batch leg: star rule — an item matching a smaller id loses
        // (undecodable null-hash rows match nothing and pass through)
        val inBatchLosers = HashIndex.pairs(hashes, maxHamming)
          .select(col("id_b").alias("id")).distinct()
        val accepted = hashes
          .join(dupVsIndex, Seq("id"), "left_anti")
          .join(inBatchLosers, Seq("id"), "left_anti")
          .localCheckpoint() // settle the verdict BEFORE the index republishes

        batch.join(accepted.select(col("id").alias("media_id")), Seq("media_id"),
            "left_semi")
          .write.mode("overwrite").parquet(s"$acceptedRoot/batch=$batchId")

        val prevHashes = Dedup.latestNearDupIndexVersion(spark, indexRoot, batchId) match {
          case Some(v) => HashIndex.read(spark, s"$indexRoot/v$v").hashes
          case None    => accepted.limit(0).select(col("id"), col("dhash"))
        }
        HashIndex.persist(
          prevHashes.unionByName(accepted.select(col("id"), col("dhash"))),
          s"$indexRoot/v$batchId")
        // full-snapshot versions — bound the root's growth; >= 2 kept so a
        // crash-replayed batch still finds its strictly-below predecessor
        Dedup.vacuumNearDupIndexVersions(spark, indexRoot, keepIndexVersions)
        ()
    }
  }
}
