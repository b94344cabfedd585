package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table (SURVEY §2.8 — the
  * reference is daily batch, so streaming is an engine extension: the same
  * micro-batch semantics expressed natively).
  *
  * Patterns covered:
  *  - file-source `readStream` with an explicit schema (no inference pass);
  *  - event-time watermark + tumbling-window aggregation;
  *  - arbitrary stateful processing via `flatMapGroupsWithState`
  *    (session windows with an inactivity gap);
  *  - `Trigger.AvailableNow` batch-parity runs: the streaming query drains the
  *    directory and stops, so tests can assert stream ≡ batch.
  *
  * Scale posture: the windowed agg is a streaming partial+final agg keyed by
  * (window, event_type); state is bounded by the watermark. Sessionization
  * state is per-user and expires on event-time timeout — no unbounded state.
  */
object EventsStreaming {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Streaming tumbling-window aggregate: per (1-hour window, event_type)
    * count and value sum, 1-hour watermark for late data.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).alias("n_events"), sum(col("value")).alias("sum_value"))
      .select(col("window.start").alias("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming sliding-window aggregate: 1-hour windows every 30 minutes —
    * each event lands in two windows; watermark bounds state.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).alias("n_events"))
      .select(col("window.start").alias("window_start"), col("event_type"),
        col("n_events"))

  /** Streaming exact dedup on `event_id` — the streaming twin of the batch
    * dedup north-star. State is one key per event inside the watermark
    * horizon and is dropped once the watermark passes (bounded state; at
    * scale this is the standard exactly-once ingest guard in front of a
    * lake sink).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream join: attribute each purchase to the same
    * user's clicks in the preceding hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so Spark can expire
    * buffered state on both sides — the canonical bounded-state
    * stream-stream equi-join (user_id) + time-range shape.
    */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .selectExpr("event_id AS click_id", "user_id AS click_user", "ts AS click_ts")
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .selectExpr("event_id AS purchase_id", "user_id", "ts AS purchase_ts",
        "value AS purchase_value")
      .withWatermark("purchase_ts", "2 hours")
    p.join(c, expr(
        """click_user = user_id AND
          |click_ts <= purchase_ts AND
          |click_ts >= purchase_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** The batch twin of [[hourlyAgg]] — used by tests to assert parity. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).alias("window_start"), col("event_type"))
      .agg(count(lit(1)).alias("n_events"), sum(col("value")).alias("sum_value"))

  /** Drain `inputDir` with AvailableNow into an in-memory table; returns the
    * completed result. Complete mode keeps the full aggregate for assertion.
    */
  def runHourlyAggAvailableNow(spark: SparkSession, inputDir: String,
      queryName: String = "events_hourly"): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(inputDir)
    val q = hourlyAgg(stream).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming → lake glue: maintain a parquet serving table of the hourly
    * aggregate with `foreachBatch` + keyed upsert. Each micro-batch's
    * (window, event_type) rows replace their keys in the served table
    * (source-wins join merge + atomic swap), so replays and AvailableNow
    * re-drains are idempotent — the streaming twin of the reference's gold
    * warehouse upsert (S8).
    */
  def serveHourlyAgg(spark: SparkSession, inputDir: String, serveDir: String): Unit = {
    val stream = spark.readStream.schema(eventSchema).parquet(inputDir)
    val q = hourlyAgg(stream).writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertParquet(batch.sparkSession, batch, serveDir,
          Seq("window_start", "event_type"))
      }
      .start()
    q.awaitTermination()
  }

  /** Keyed source-wins upsert into a parquet dir with atomic swap. The
    * anti-join is NULL-SAFE (`<=>`) on the keys: with plain equality a
    * null-keyed row (event_type is nullable) would never anti-match its
    * existing twin and duplicate on every replay, breaking idempotency.
    */
  private def upsertParquet(spark: SparkSession, incoming: DataFrame,
      dir: String, keys: Seq[String]): Unit = {
    val finalP = new org.apache.hadoop.fs.Path(dir)
    val fs = finalP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot = incoming.cache()
    try {
      val merged =
        if (fs.exists(finalP)) {
          val existing = spark.read.parquet(dir).alias("e")
          val incomingKeys = broadcast(
            snapshot.select(keys.map(col): _*).dropDuplicates(keys)).alias("i")
          val cond = keys.map(k => col(s"e.$k") <=> col(s"i.$k")).reduce(_ && _)
          snapshot.unionByName(
            existing.join(incomingKeys, cond, "left_anti"))
        } else snapshot
      graft.sinks.LakeSink.stageAndSwap(fs, finalP) { staging =>
        merged.write.mode("overwrite").parquet(staging.toString)
      }
    } finally snapshot.unpersist()
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Event-time sessionization with an inactivity `gapMinutes`: emits one row
    * per closed session per user. State is per-user and expires via
    * event-time timeout against the watermark.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[UserSession] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val outEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[SessionState]

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      val events = rows.toSeq.sortBy(_.ts.getTime)
      if (events.isEmpty && state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(UserSession(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.end), s.n, s.sum))
      } else {
        // Interval sweep over (open state session + batch events) sorted by
        // start time: clusters within `gapMs` merge (a cross-batch late event
        // inside the watermark can EXTEND the open session backwards —
        // session_start = min); clusters separated by more than the gap stay
        // distinct, so a late event hours before the open session forms and
        // closes its own earlier session instead of being silently absorbed.
        // Only the latest cluster stays open in state. Limitation (inherent
        // to single-session state): a closed earlier cluster is emitted now;
        // an even-later batch targeting that same window would start a fresh
        // session rather than reopen it.
        val items = (state.getOption.toSeq ++
          events.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value)))
          .sortBy(s => (s.start, s.end))
        val clusters = items.foldLeft(List.empty[SessionState]) {
          case (h :: tail, iv) if iv.start - h.end <= gapMs =>
            SessionState(h.start, math.max(h.end, iv.end), h.n + iv.n, h.sum + iv.sum) :: tail
          case (acc, iv) => iv :: acc
        } // head = latest cluster
        val open = clusters.head
        // A cluster built entirely from late events can already be expired
        // relative to the watermark — setTimeoutTimestamp would reject a
        // past timestamp, so close it now instead of keeping it open.
        val expired = open.end + gapMs <= state.getCurrentWatermarkMs()
        if (expired) state.remove()
        else {
          state.update(open)
          state.setTimeoutTimestamp(open.end + gapMs)
        }
        val toClose = if (expired) clusters else clusters.tail
        toClose.reverseIterator.map(s =>
          UserSession(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end), s.n, s.sum))
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
