package graft

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("AvailableNow hourly agg equals the batch twin") {
    val rows = Seq(
      Event(1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 00:40:00"), 2L, "click", 2.0),
      Event(3L, ts("2024-01-01 01:05:00"), 1L, "view", 3.0),
      Event(4L, ts("2024-01-01 01:55:00"), 3L, "click", 4.0),
      Event(5L, ts("2024-01-01 02:20:00"), 1L, "purchase", 5.0)
    )
    val dir = Files.createTempDirectory("graft-stream-in").toString
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    df.write.mode("overwrite").parquet(dir)

    val streamed = EventsStreaming.runHourlyAggAvailableNow(spark, dir, "t_hourly")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = EventsStreaming.hourlyAggBatch(spark.read.parquet(dir))
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    streamed shouldBe batch
    streamed.size shouldBe 4
  }

  test("streaming dedup drops within-watermark duplicate event_ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]

    val deduped = EventsStreaming.dedupEvents(
      input.toDS().toDF().withColumn("props", lit("{}")))
    val q = deduped.writeStream
      .format("memory").queryName("t_dedup").outputMode("append").start()
    try {
      input.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Event(1L, ts("2024-01-01 00:00:30"), 1L, "click", 1.0), // dup delivery
        Event(2L, ts("2024-01-01 00:05:00"), 2L, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Event(2L, ts("2024-01-01 00:06:00"), 2L, "view", 2.0),  // dup, later batch
        Event(3L, ts("2024-01-01 00:10:00"), 1L, "click", 3.0))
      q.processAllAvailable()

      val ids = spark.table("t_dedup").select($"event_id").as[Long].collect().sorted
      ids shouldBe Array(1L, 2L, 3L)
    } finally q.stop()
  }

  test("sliding windows assign each event to two overlapping windows") {
    val events = Seq(
      Event(1L, ts("2024-01-01 00:40:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 01:10:00"), 2L, "click", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    // Batch-execute the streaming definition (windows are the same logical op).
    val out = EventsStreaming.slidingAgg(events)
      .select($"window_start", $"n_events")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    out.size shouldBe 3
    out(ts("2024-01-01 00:00:00")) shouldBe 1L // event 1 only
    out(ts("2024-01-01 00:30:00")) shouldBe 2L // both events overlap here
    out(ts("2024-01-01 01:00:00")) shouldBe 1L // event 2 only
  }

  test("foreachBatch serve: streamed hourly agg lands in parquet, re-drain is idempotent") {
    val rows = Seq(
      Event(1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 00:40:00"), 2L, "click", 2.0),
      Event(3L, ts("2024-01-01 01:05:00"), 1L, "view", 3.0))
    val in = Files.createTempDirectory("serve-in").toString
    val serve = Files.createTempDirectory("serve-out").toString + "/hourly"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(in)

    EventsStreaming.serveHourlyAgg(spark, in, serve)
    val batchTwin = EventsStreaming.hourlyAggBatch(spark.read.parquet(in))
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    def served() = spark.read.parquet(serve)
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    served() shouldBe batchTwin

    // Fresh checkpoint-less AvailableNow re-drain re-processes everything;
    // the keyed upsert makes that a no-op rather than a duplication.
    EventsStreaming.serveHourlyAgg(spark, in, serve)
    served() shouldBe batchTwin
  }

  test("stream-stream join attributes purchases to preceding-hour clicks only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val clickIn    = MemoryStream[Event]
    val purchaseIn = MemoryStream[Event]

    val out = EventsStreaming.clickPurchaseAttribution(
      clickIn.toDS().toDF(), purchaseIn.toDS().toDF())
    val q = out.writeStream
      .format("memory").queryName("t_attr").outputMode("append").start()
    try {
      clickIn.addData(
        Event(10L, ts("2024-01-01 09:30:00"), 1L, "click", 0.0),  // in window
        Event(11L, ts("2024-01-01 08:00:00"), 1L, "click", 0.0),  // too old
        Event(12L, ts("2024-01-01 09:45:00"), 2L, "click", 0.0))  // other user
      purchaseIn.addData(
        Event(20L, ts("2024-01-01 10:00:00"), 1L, "purchase", 99.0))
      q.processAllAvailable()

      val rows = spark.table("t_attr")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      rows shouldBe Set((20L, 10L))
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and on end-of-stream timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]

    val sessions = EventsStreaming.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("t_sessions").outputMode("append").start()
    try {
      // user 1: two sessions separated by > 30 min; user 2: one session.
      input.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 00:10:00"), 1L, "view", 2.0),
        Event(3L, ts("2024-01-01 01:00:00"), 1L, "click", 3.0),
        Event(4L, ts("2024-01-01 00:05:00"), 2L, "click", 4.0))
      q.processAllAvailable()
      // push the watermark far forward so open sessions time out.
      input.addData(Event(99L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()

      val out = spark.table("t_sessions")
        .select($"user_id", $"n_events", $"sum_value").as[(Long, Long, Double)]
        .collect().toSet
      out should contain ((1L, 2L, 3.0))   // first session: events 1+2
      out should contain ((1L, 1L, 3.0))   // second session: event 3
      out should contain ((2L, 1L, 4.0))
    } finally q.stop()
  }

  test("streaming corpus curation filters and dedups across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox and the lazy dog it is a fine day for it " * 3
    val other = "a different but equally fine document with the usual words in it " * 3
    val input = MemoryStream[(Long, String)]

    val curated = graft.streaming.CorpusStreaming
      .curateStream(input.toDF().toDF("doc_id", "text"), minQuality = 0.3)
    val q = curated.writeStream
      .format("memory").queryName("t_corpus_stream").outputMode("append").start()
    try {
      // batch 1: two copies of `good` (in-batch dup, min id wins) + junk
      input.addData((5L, good), (2L, good), (9L, "!!!! ???? ####"))
      q.processAllAvailable()
      // batch 2: cross-batch dup of `good` + a genuinely new doc
      input.addData((1L, good), (7L, other))
      q.processAllAvailable()

      val out = spark.table("t_corpus_stream")
        .select($"doc_id").as[Long].collect().sorted
      // 2 survived batch 1 (min id of the dup pair), 7 joined in batch 2;
      // doc 1 is a cross-batch duplicate and doc 9 fails quality
      out shouldBe Array(2L, 7L)
      spark.table("t_corpus_stream")
        .select($"lang_pred").distinct().as[String].collect().toSet shouldBe Set("en")
    } finally q.stop()
  }

  test("streaming near-dup ingest: lake-persisted signature index dedups paraphrases across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val novel = (100 until 160).map(i => s"w$i").mkString(" ")
    val input = MemoryStream[(Long, String)]

    val writer = graft.streaming.CorpusStreaming.nearDupIngest(
      input.toDF().toDF("doc_id", "text"),
      s"$root/index", s"$root/accepted", keepIndexVersions = 2)
    val q = writer.option("checkpointLocation", s"$root/ckpt").start()
    def versions(): Seq[String] = {
      val d = new java.io.File(s"$root/index")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSeq.sorted
    }
    try {
      input.addData((10L, base), (20L, novel))          // batch 0: both new
      q.processAllAvailable()
      input.addData((30L, base + " tail"), (40L, (200 until 260).map(i => s"v$i").mkString(" ")))
      q.processAllAvailable()                           // 30 ~ indexed 10 → reject
      input.addData((50L, base + " tail2"))             // still a twin of 10
      q.processAllAvailable()

      val accepted = spark.read.parquet(s"$root/accepted")
        .select($"doc_id").as[Long].collect().sorted
      accepted shouldBe Array(10L, 20L, 40L)
      // retention bounds the batch-versioned root: only the newest two
      // full snapshots survive a long-lived stream (batch 0's dropped),
      // and the kept snapshots are cumulative — batch 2 still rejected
      // the twin of batch-0 content above
      versions() shouldBe Seq("v1", "v2")
      // the published index is the compacted layout: one sig row per
      // accepted doc at the newest version, bands precomputed
      val idx = graft.operators.Dedup.readNearDupIndex(spark, s"$root/index/v2")
      idx.sigs.count() shouldBe 3L
      idx.bands.count() shouldBe 3L * 16
    } finally q.stop()
  }

  test("streaming index ingest: micro-batches append to the postings index; served BM25 equals a batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("invidx_stream").toString
    val input = MemoryStream[(Long, String)]
    val writer = graft.streaming.CorpusStreaming.indexIngest(
      input.toDF().toDF("doc_id", "text"), s"$root/index",
      numPartitions = 2, compactEvery = 1)
    val q = writer.option("checkpointLocation", s"$root/ckpt").start()
    try {
      input.addData((1L, "spark shuffle hash join shuffle"), (2L, "hash partition hash"))
      q.processAllAvailable() // batch 0 bootstraps the index (build)
      input.addData((4L, "shuffle shuffle shuffle partition"),
        (2L, "hash partition hash")) // doc 2 re-delivered: anti-join drops it
      q.processAllAvailable() // append, then compactEvery=1 folds to one delivery
    } finally q.stop()

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.InvertedIndex.deliveries(fs, s"$root/index") shouldBe Seq(0)
    spark.read.parquet(s"$root/index/doclen").count() shouldBe 3L // 2 never doubled

    val batchPath = java.nio.file.Files.createTempDirectory("invidx_batch").toString
    graft.operators.InvertedIndex.build(
      Seq((1L, "spark shuffle hash join shuffle"), (2L, "hash partition hash"),
        (4L, "shuffle shuffle shuffle partition")).toDF("doc_id", "text"),
      "doc_id", "text", batchPath, numPartitions = 2)
    def served(p: String) = graft.operators.InvertedIndex
      .bm25(spark, p, Seq("shuffle", "hash", "partition"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    served(s"$root/index") shouldBe served(batchPath)
  }

  test("corpus curation runs on the RocksDB state store (bounded-memory dedup state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox and the lazy dog it is a fine day for it " * 3
    val input = MemoryStream[(Long, String)]
    val curated = graft.streaming.CorpusStreaming
      .curateStream(input.toDF().toDF("doc_id", "text"), minQuality = 0.3)
    // The RocksDB provider spills state off-heap to local disk — the
    // 100 TB-ingest configuration for global fingerprint dedup, where the
    // default in-memory HDFS-backed store would OOM on corpus-scale state.
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb-ckpt").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try curated.writeStream
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("t_rocks_stream").outputMode("append").start()
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    try {
      input.addData((4L, good), (8L, good))
      q.processAllAvailable()
      input.addData((2L, good)) // cross-batch dup against RocksDB state
      q.processAllAvailable()
      spark.table("t_rocks_stream").select($"doc_id").as[Long].collect().toSeq shouldBe Seq(4L)
      // RocksDB really backed the state operator (its metrics are present)
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      metrics.keySet.toArray.map(_.toString).count(_.contains("rocksdb")) should be > 0
    } finally q.stop()
  }

  test("transformWithState dedup: typed ValueState on RocksDB survives a query restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox and the lazy dog it is a fine day for it " * 3
    val other = "a completely different fine document about the quick red fox " * 3
    val input = MemoryStream[(Long, String)]
    // no TTL -> TimeMode.None, so AvailableNow drains and terminates (a
    // TTL'd deployment runs an always-on trigger instead; see the
    // operator's time-mode note)
    val curated = graft.streaming.CorpusStreaming.curateStreamTws(
      input.toDF().toDF("doc_id", "text"), minQuality = 0.3, dedupTtl = None)
    val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("tws-out").toString
    // TWS under ProcessingTime time mode runs batches CONTINUOUSLY (timer/
    // TTL evaluation), so processAllAvailable never settles — drive each
    // delivery with Trigger.AvailableNow and RESTART the query on the same
    // checkpoint (durable parquet sink; the memory sink can't recover):
    // run 2's dedup verdicts come from RocksDB state restored across a
    // stop/start, the stronger durability proof anyway.
    def runOnce(): Set[Long] = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // 4.1's checksum checkpoint manager deadlocks under concurrent
      // RocksDB snapshot-zip uploads in local mode (tasks park in
      // ChecksumCancellableFSDataOutputStream.close awaiting a starved
      // async pool) — disable the checksum side-files for this query
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val q =
        try curated.writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", outDir).outputMode("append").start()
        finally {
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
          spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
        }
      try {
        q.awaitTermination(120000) shouldBe true
        val metrics = q.lastProgress.stateOperators.head.customMetrics
        metrics.keySet.toArray.map(_.toString).count(_.contains("rocksdb")) should be > 0
      } finally q.stop()
      spark.read.parquet(outDir).select($"doc_id").as[Long].collect().toSet
    }

    input.addData((4L, good), (8L, good)) // in-batch twins: min id wins
    runOnce() shouldBe Set(4L)
    input.addData((2L, good), (9L, other)) // cross-batch dup + a new doc
    runOnce() shouldBe Set(4L, 9L) // 2L rejected by RESTORED RocksDB state
  }

  test("sessionize handles cross-batch late events inside the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]

    val sessions = EventsStreaming.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("t_late_sessions").outputMode("append").start()
    try {
      // batch 1 opens a session at 10:00 (watermark = 10:05 − 1h, so
      // anything after 09:05 is in-watermark)
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:05:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      // batch 2 (watermark now 09:05): a late event 20 min BEFORE the open
      // session start must extend the session backwards (within gap), and
      // one at 09:06 — in-watermark but > gap before both the session and
      // the other late event — must close as its own separate earlier
      // session, not be absorbed.
      input.addData(
        Event(3L, ts("2024-01-01 09:40:00"), 1L, "click", 4.0),
        Event(4L, ts("2024-01-01 09:06:00"), 1L, "click", 8.0))
      q.processAllAvailable()
      // push the watermark forward so the open session times out.
      input.addData(Event(99L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()

      val out = spark.table("t_late_sessions").filter($"user_id" === 1L)
        .select($"session_start".cast("string"), $"session_end".cast("string"),
          $"n_events", $"sum_value")
        .as[(String, String, Long, Double)].collect().toSet
      out shouldBe Set(
        ("2024-01-01 09:06:00", "2024-01-01 09:06:00", 1L, 8.0),  // separate earlier
        ("2024-01-01 09:40:00", "2024-01-01 10:05:00", 3L, 7.0))  // extended backwards
    } finally q.stop()
  }

  test("streaming heavy hitters track hot tokens across batches with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hot = graft.streaming.CorpusStreaming
      .streamingHeavyHitters(input.toDF().toDF("doc_id", "text"), k = 64, shards = 4)
    val q = hot.writeStream
      .format("memory").queryName("t_hot_stream").outputMode("append").start()
    try {
      // batch 1: 'trending' 30x, each rare token once
      input.addData(
        (1L, (0 until 30).map(_ => "trending").mkString(" ")),
        (2L, (0 until 20).map(i => s"rareA$i").mkString(" ")))
      q.processAllAvailable()
      // batch 2: 20 more 'trending' among fresh rare tokens — the summary
      // must carry the count ACROSS batches, not restart
      input.addData(
        (3L, (0 until 20).map(_ => "trending").mkString(" ")),
        (4L, (0 until 20).map(i => s"rareB$i").mkString(" ")))
      q.processAllAvailable()

      val rows = spark.table("t_hot_stream")
        .as[(Int, String, Long)].collect()
      // lifetime estimate for the hot token: last emission is cumulative;
      // its shard saw <= 90 tokens, so MG undercount <= 90/(16+1)
      val est = rows.filter(_._2 == "trending").map(_._3).max
      est should be <= 50L
      est should be >= 50L - 90L / 17L
      // state is bounded: each of the 2 emissions per shard carries at most
      // k/shards = 16 summary rows
      rows.groupBy(_._1).foreach { case (_, g) => g.length should be <= 32 }
    } finally q.stop()
  }

  test("streaming media ingest: persisted hash index rejects cross-batch twins; in-batch twin loses") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{HashIndex, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("media_ingest").toString
    val input = MemoryStream[(Long, String, String, Array[Byte])]

    val writer = graft.streaming.MediaStreaming.mediaIngest(
      input.toDF().toDF("media_id", "kind", "uri", "payload"),
      s"$root/index", s"$root/accepted", keepIndexVersions = 2)
    val q = writer.option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 0: two images + one audio clip, all distinct -> all accepted
      input.addData(
        (1L, "image", "i/1", Multimodal.syntheticPng(1L)),
        (2L, "image", "i/2", Multimodal.syntheticPng(2L)),
        (3L, "audio", "a/3", Multimodal.syntheticWav(3L, 16000, 1, 6000)))
      q.processAllAvailable()
      // batch 1: 10 = re-encode twin of image 1 (cross-batch reject), 11 is
      // fresh, 12 = gain-halved twin of clip 3 (cross-batch, cross-MODALITY
      // state in one index), 20/21 are in-batch twins (21 loses to 20)
      input.addData(
        (10L, "image", "i/10", Multimodal.syntheticPng(1L, flipped = true)),
        (11L, "image", "i/11", Multimodal.syntheticPng(50L)),
        (12L, "audio", "a/12",
          Multimodal.halveWavAmplitude(Multimodal.syntheticWav(3L, 16000, 1, 6000))),
        (20L, "image", "i/20", Multimodal.syntheticPng(60L)),
        (21L, "image", "i/21", Multimodal.syntheticPng(60L, flipped = true)))
      q.processAllAvailable()

      val accepted = spark.read.parquet(s"$root/accepted")
        .select($"media_id").as[Long].collect().sorted
      accepted shouldBe Array(1L, 2L, 3L, 11L, 20L)
      // newest index version carries exactly the accepted fingerprints,
      // bands precomputed for the next batch's probe
      val idx = HashIndex.read(spark, s"$root/index/v1")
      idx.hashes.count() shouldBe 5L
      idx.bands.count() shouldBe 40L
      // batch 2: retention (keep 2) drops v0 while a twin of BATCH-0
      // content is still rejected — the kept snapshot is cumulative
      input.addData(
        (30L, "image", "i/30", Multimodal.syntheticPng(2L, flipped = true)),
        (31L, "image", "i/31", Multimodal.syntheticPng(70L)))
      q.processAllAvailable()
      spark.read.parquet(s"$root/accepted")
        .select($"media_id").as[Long].collect().sorted shouldBe
        Array(1L, 2L, 3L, 11L, 20L, 31L)
      val dirs = Option(new java.io.File(s"$root/index").listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSeq.sorted
      dirs shouldBe Seq("v1", "v2")
    } finally q.stop()
  }

  test("streaming gold ingest: lake merge + CDF-driven view refresh per batch; replayed rows don't move the view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sinks.{LakeTable, MaterializedView}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gold_stream").toString
    val tableRoot = s"$root/table"; val mvRoot = s"$root/view"

    LakeTable.init(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amount")
        .withColumn("grp", lit("x")),
      tableRoot, Seq("id"), numBuckets = 4)
    MaterializedView.init(spark, tableRoot, mvRoot, Seq("grp"), Seq("amount"))

    val input = MemoryStream[(Long, String, Double)]
    val q = graft.streaming.LakeStreaming.goldIngest(
        input.toDF().toDF("id", "grp", "amount"), tableRoot, mvRoot)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 0: one update (1L: 10→15) and one insert into a new group
      input.addData((1L, "x", 15.0), (3L, "y", 7.0))
      q.processAllAvailable()
      def view(): Map[String, (Long, Double)] =
        MaterializedView.read(spark, mvRoot)
          .select($"grp", $"cnt", $"sum_amount".cast("double"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      view() shouldBe Map("x" -> (2L, 35.0), "y" -> (1L, 7.0))

      // batch 1 REPLAYS batch 0's rows (at-least-once delivery): the merge
      // rewrites buckets with identical values, the feed nets to empty,
      // the view must not move
      input.addData((1L, "x", 15.0), (3L, "y", 7.0))
      q.processAllAvailable()
      view() shouldBe Map("x" -> (2L, 35.0), "y" -> (1L, 7.0))
    } finally q.stop()
  }

  test("streaming join-gold ingest: fact stream + out-of-band dim deliveries fold per trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sinks.{JoinMaterializedView, LakeTable}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("jgold_stream").toString
    val factRoot = s"$root/fact"; val dimRoot = s"$root/dim"
    val mvRoot = s"$root/view"

    LakeTable.init(Seq((1L, 10L, 1.0), (2L, 20L, 2.0))
      .toDF("id", "fk", "amount"), factRoot, Seq("id"), numBuckets = 4)
    LakeTable.init(Seq((10L, "A"), (20L, "B")).toDF("pk", "seg"),
      dimRoot, Seq("pk"), numBuckets = 2)
    JoinMaterializedView.init(spark, factRoot, dimRoot, mvRoot,
      "fk", Seq("seg"), Seq("amount"), numBuckets = 2)

    val input = MemoryStream[(Long, Long, Double)]
    val q = graft.streaming.LakeStreaming.joinGoldIngest(
        input.toDF().toDF("id", "fk", "amount"), factRoot, dimRoot, mvRoot)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      def view(): Map[String, (Long, Double)] =
        JoinMaterializedView.read(spark, mvRoot)
          .select($"seg", $"cnt", $"sum_amount".cast("double"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // batch 0: fact insert into each group
      input.addData((3L, 10L, 4.0), (4L, 20L, 8.0))
      q.processAllAvailable()
      view() shouldBe Map("A" -> (2L, 5.0), "B" -> (2L, 10.0))

      // an out-of-band DIM delivery lands between triggers: 20 moves B→A.
      // The next fact batch's refresh folds the dim feed too —
      // re-attributing rows 2 and 4 — alongside its own fact row.
      LakeTable.merge(spark, dimRoot, Seq((20L, "A")).toDF("pk", "seg"))
      input.addData((5L, 10L, 16.0))
      q.processAllAvailable()
      view() shouldBe Map("A" -> (5L, 31.0))

      // replayed fact rows net to an empty feed: the view must not move
      input.addData((5L, 10L, 16.0))
      q.processAllAvailable()
      view() shouldBe Map("A" -> (5L, 31.0))
    } finally q.stop()
  }

  test("streaming gold ingest maintains approx-distinct sketches across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sinks.{LakeTable, MaterializedView}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gold_nd_stream").toString
    val tableRoot = s"$root/table"; val mvRoot = s"$root/view"

    LakeTable.init(
      Seq((1L, "x", "u1"), (2L, "x", "u2")).toDF("id", "grp", "user"),
      tableRoot, Seq("id"), numBuckets = 4)
    MaterializedView.init(spark, tableRoot, mvRoot, Seq("grp"), Seq("id"),
      approxNdCols = Seq("user"))

    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.LakeStreaming.goldIngest(
        input.toDF().toDF("id", "grp", "user"), tableRoot, mvRoot)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      def nd(): Map[String, Long] =
        MaterializedView.read(spark, mvRoot)
          .select($"grp", $"appx_nd_user")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch 0: a DUPLICATE user in x (no growth) + a new group — the
      // insert path unions sketches, exact at these cardinalities
      input.addData((3L, "x", "u1"), (4L, "y", "u9"))
      q.processAllAvailable()
      nd() shouldBe Map("x" -> 2L, "y" -> 1L)
      // batch 1: a genuinely new user in x
      input.addData((5L, "x", "u3"))
      q.processAllAvailable()
      nd() shouldBe Map("x" -> 3L, "y" -> 1L)
      // batch 2: an UPDATE rewrites row 1's user u1→u7 — the feed carries
      // a retraction, so group x recomputes its sketch from the base
      // inside the streaming loop (u1 survives via row 3)
      input.addData((1L, "x", "u7"))
      q.processAllAvailable()
      nd() shouldBe Map("x" -> 4L, "y" -> 1L)
    } finally q.stop()
  }

  test("streaming gold ingest maintains variance and quantile state with exact retraction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sinks.{LakeTable, MaterializedView}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gold_var_stream").toString
    val tableRoot = s"$root/table"; val mvRoot = s"$root/view"

    LakeTable.init(
      Seq((1L, "x", 10.0), (2L, "x", 14.0)).toDF("id", "grp", "amount"),
      tableRoot, Seq("id"), numBuckets = 4)
    MaterializedView.init(spark, tableRoot, mvRoot, Seq("grp"),
      Seq("amount"), varCols = Seq("amount"),
      approxQuantileCols = Seq("amount"), quantileAlpha = 0.01)

    val input = MemoryStream[(Long, String, Double)]
    val q = graft.streaming.LakeStreaming.goldIngest(
        input.toDF().toDF("id", "grp", "amount"), tableRoot, mvRoot)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      def state(): Map[String, (Double, Double)] =
        MaterializedView.read(spark, mvRoot, Seq(0.5))
          .select($"grp", $"var_amount", $"appx_p500_amount")
          .collect().map(r => r.getString(0) ->
            ((r.getDouble(1), r.getDouble(2)))).toMap
      // batch 0: grow x — var_samp{10,14,18} = 16, median ≈ 14 (≤ 1% α)
      input.addData((3L, "x", 18.0))
      q.processAllAvailable()
      state()("x")._1 shouldBe 16.0 +- 1e-9
      state()("x")._2 shouldBe 14.0 +- 0.15
      // batch 1: an UPDATE rewrites row 3 18→26 — the feed retracts the
      // old value; variance and histogram subtract EXACTLY inside the
      // streaming loop (no recompute leg: both are self-maintainable)
      input.addData((3L, "x", 26.0))
      q.processAllAvailable()
      MaterializedView.lastExhausted shouldBe 0
      state()("x")._1 shouldBe 69.33333333 +- 1e-6 // var_samp{10,14,26}
      state()("x")._2 shouldBe 14.0 +- 0.15
    } finally q.stop()
  }
}
