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
  private def scoredStream(docs: DataFrame, minQuality: Double,
      allowedLangs: Seq[String]): Dataset[(Long, String, Double, String, String)] =
    docs
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

  def curateStream(docs: DataFrame, minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en", "und"),
      dedupTtlMinutes: Int = 0): Dataset[CuratedDoc] = {
    implicit val outEnc = Encoders.product[CuratedDoc]
    implicit val keyEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean

    val scored = scoredStream(docs, minQuality, allowedLangs)

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

  /** [[curateStream]] on the `transformWithState` arbitrary-state API
    * (Spark 4's successor to `flatMapGroupsWithState`): the dedup bit is a
    * typed [[org.apache.spark.sql.streaming.ValueState]] with a NATIVE
    * per-state TTL — the state store expires fingerprints itself, no
    * manual timer arming, no timed-out-key callback branch in user code.
    * Same semantics as [[curateStream]] (first batch wins; within a batch
    * the min doc_id survives); requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which is the
    * 100 TB-ingest configuration anyway — corpus-scale fingerprint state
    * lives off-heap on local disk, TTL keeps it a sliding horizon.
    *
    * Time-mode note: TTL forces `TimeMode.ProcessingTime`, under which the
    * operator schedules work continuously — right for a production
    * always-on trigger, but an `AvailableNow` drain never terminates. With
    * no TTL the query runs `TimeMode.None` and drains normally; pick TTL
    * only for continuously-triggered deployments.
    */
  def curateStreamTws(docs: DataFrame, minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en", "und"),
      dedupTtl: Option[java.time.Duration] = None): Dataset[CuratedDoc] = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    implicit val outEnc = Encoders.product[CuratedDoc]
    implicit val keyEnc = Encoders.STRING

    val ttl = dedupTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    final class DedupProcessor
        extends StatefulProcessor[String, (Long, String, Double, String, String), CuratedDoc] {
      @transient private var seen: ValueState[Boolean] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)
      override def handleInputRows(fp: String,
          rows: Iterator[(Long, String, Double, String, String)],
          timers: TimerValues): Iterator[CuratedDoc] =
        if (seen.exists()) Iterator.empty
        else {
          seen.update(true)
          val first = rows.minBy(_._1)
          Iterator.single(CuratedDoc(first._1, first._2, first._3, first._4))
        }
    }

    scoredStream(docs, minQuality, allowedLangs)
      .groupByKey(_._5)
      .transformWithState(new DedupProcessor,
        if (dedupTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(), outEnc)
  }

  /** Streaming NEAR-dup curation — [[curateStream]]'s fingerprint state
    * catches only EXACT twins; this leg curates each micro-batch against
    * the persisted MinHash signature index of everything accepted so far
    * ([[graft.operators.Dedup.persistNearDupIndex]] layout) and
    * re-publishes the compacted index at a batch-versioned path.
    * `foreachBatch` + a lake-resident index rather than keyed state: the
    * signature index IS the dedup state, and in the lake it survives
    * restarts, scales to object-store size (256 B/doc), serves offline
    * consumers, and never bloats the state store. Replays are idempotent
    * by construction — a retried batch re-reads the newest index version
    * STRICTLY BELOW its own batch id (never its own partial output),
    * re-derives the same accepted set, and overwrites its own version and
    * accepted partition.
    *
    * Caller starts the returned writer with a checkpointLocation (and a
    * trigger); accepted docs land under `acceptedRoot/batch=<id>/`.
    */
  def nearDupIngest(docs: DataFrame, indexRoot: String, acceptedRoot: String,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      minEstJaccard: Double = 0.6, keepIndexVersions: Int = 7)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    require(keepIndexVersions >= 2,
      s"keepIndexVersions must be >= 2 (strictly-below replay safety), " +
        s"got $keepIndexVersions") // fail at BUILD time, not mid-stream
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val prev = Dedup.latestNearDupIndexVersion(spark, indexRoot, batchId)
        val (sigs, idxBands) = prev match {
          case Some(v) =>
            val idx = Dedup.readNearDupIndex(spark, s"$indexRoot/v$v")
            (idx.sigs, Some(idx.bands))
          case None =>
            (batch.limit(0).select(col(idCol).alias("id"),
              array().cast("array<int>").alias("sig")), None)
        }
        val r = Dedup.incrementalNearDup(batch.toDF(), sigs, idCol, textCol,
          numHashes, bands, shingleSize, minEstJaccard, indexBands = idxBands)
        r.accepted.write.mode("overwrite")
          .parquet(s"$acceptedRoot/batch=$batchId")
        Dedup.persistNearDupIndex(r.updatedIndex, s"$indexRoot/v$batchId",
          numHashes, bands)
        // each version is a full snapshot — without retention a long-lived
        // stream grows the index root by one whole-history copy per
        // trigger. keepIndexVersions >= 2 preserves the strictly-below
        // crash-replay contract (a replayed batch still finds its
        // predecessor version).
        Dedup.vacuumNearDupIndexVersions(spark, indexRoot, keepIndexVersions)
        ()
    }
  }

  /** Streaming inverted-index ingest — each micro-batch lands in the
    * lake-resident postings index ([[graft.operators.InvertedIndex]]
    * layout) as one marker-committed delivery, so lexical retrieval serves
    * from an index that is never more than one trigger behind the stream.
    * Same design stance as [[nearDupIngest]]: `foreachBatch` + a
    * lake-resident index rather than keyed state — the index IS the state,
    * survives restarts, and serves offline consumers directly.
    *
    * Exactly-once effect without any extra bookkeeping: a replayed batch
    * re-enters [[graft.operators.InvertedIndex.append]], whose doc-id
    * anti-join drops everything the crashed attempt already published and
    * whose marker protocol hides anything it half-wrote — the retry
    * replaces the orphan directories in place. `compactEvery` bounds probe
    * fan-in on a long-running stream: when the marked delivery count
    * exceeds it, the batch folds the index back to one delivery before
    * returning (crash-safe; see [[graft.operators.InvertedIndex.compact]]).
    */
  def indexIngest(docs: DataFrame, indexRoot: String,
      idCol: String = "doc_id", textCol: String = "text",
      numPartitions: Int = 4, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.InvertedIndex
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(indexRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (InvertedIndex.deliveries(fs, indexRoot).isEmpty)
          InvertedIndex.build(batch.toDF(), idCol, textCol, indexRoot, numPartitions)
        else
          InvertedIndex.append(batch.toDF(), idCol, textCol, indexRoot, numPartitions)
        if (compactEvery > 0 &&
            InvertedIndex.deliveries(fs, indexRoot).size > compactEvery)
          InvertedIndex.compact(spark, indexRoot, numPartitions)
    }
  }

  final case class HotToken(shard: Int, token: String, est: Long)

  /** Streaming heavy hitters over the token stream — "which tokens are
    * trending across this corpus as it arrives", with STATE BOUNDED BY
    * CONSTRUCTION: tokens hash into `shards` groups, and each group keeps
    * a Misra–Gries summary of at most `k / shards` counters in its
    * `GroupState` (reusing the batch aggregator's reduce step). A token's
    * whole stream lands in one shard, so the per-shard MG guarantee holds
    * over the FULL stream history: any token with lifetime frequency
    * > n_shard/(k_shard+1) is present in its shard's summary, and
    * estimates undercount by at most that bound. Exactly-k total counters
    * of state regardless of how long the stream runs — the streaming
    * analogue of [[graft.operators.HeavyHitters]]'s nominate pass (run an
    * exact batch recount over the nominated set when exactness matters).
    *
    * After each micro-batch, every UPDATED shard re-emits its current
    * summary as (`shard`, `token`, `est`) rows — downstream consumers keep
    * the latest batch per shard.
    */
  def streamingHeavyHitters(docs: DataFrame, textCol: String = "text",
      k: Int = 256, shards: Int = 16): Dataset[HotToken] = {
    require(shards > 0 && k >= shards,
      s"need shards > 0 and k >= shards, got k=$k shards=$shards")
    val kShard = k / shards
    implicit val outEnc = Encoders.product[HotToken]
    implicit val keyEnc = Encoders.scalaInt
    implicit val stateEnc = Encoders.kryo[Map[String, Long]]
    val toks = docs
      .select(explode(filter(TextFunctions.tokens(coalesce(col(textCol), lit(""))),
        x => length(x) > 0)).alias("__tok"))
      .select(pmod(xxhash64(col("__tok")), lit(shards)).cast("int").alias("__shard"),
        col("__tok"))
      .as[(Int, String)](Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
    val mg = new graft.functions.Aggregators.MisraGries(kShard)
    def update(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[Map[String, Long]]): Iterator[HotToken] = {
      val buf = scala.collection.mutable.HashMap.empty[String, Long]
      state.getOption.foreach(_.foreach { case (t, c) => buf.update(t, c) })
      rows.foreach(r => mg.reduce(buf, r._2))
      val summary = buf.toMap
      state.update(summary)
      summary.iterator.map { case (t, c) => HotToken(shard, t, c) }
    }
    toks
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
