package graft.streaming

import graft.sinks.LakeTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over a lake table's change feed — the
  * "stream FROM a table" design point (Delta's streaming source, original
  * implementation): downstream consumers subscribe with
  *
  * {{{
  *   spark.readStream.format("graft-lake-cdf").option("root", root).load()
  * }}}
  *
  * and receive the table's own commit history as micro-batches of CDF rows
  * (value columns + `_change_type` ∈ {insert, delete, update_preimage,
  * update_postimage} + `_from_version`/`_to_version`), with EXACTLY-ONCE
  * delivery for free because the offsets ARE the table versions:
  *
  *   - `getOffset` is a metadata read (newest manifest version — no data
  *     file opened to poll);
  *   - batch (start, end] is [[LakeTable.changes]] over exactly that
  *     version span — deterministic for a given span, so checkpoint
  *     recovery replays the identical batch; multi-version spans NET
  *     per key (an insert+delete inside one batch cancels), which is the
  *     correct-by-construction semantics for a consumer that applies the
  *     batch transactionally;
  *   - the FIRST batch (no start offset) is the table's full snapshot at
  *     the current version served as `insert` rows (`_from_version` = -1)
  *     — a new subscriber bootstraps and then rides deltas, never a
  *     seam where rows are missed or doubled (the snapshot version is
  *     the offset the next batch starts from).
  *
  * Scale: a poll costs one manifest listing; a batch costs what
  * [[LakeTable.changes]] costs — recorded feeds serve O(delta read), the
  * snapshot diff touches only changed buckets. Nothing in the source
  * holds state: the checkpoint's offset and the table's immutable
  * versions are the whole contract. Retention is the operator's side:
  * [[LakeTable.vacuum]] must keep at least the span between a consumer's
  * checkpoint and head (same contract Delta documents); a vacuumed-away
  * start version fails loudly at `getBatch`, never serves a hole.
  *
  * Schema is PINNED at stream start (the engine requires a fixed source
  * schema): additive table evolution mid-stream keeps serving the pinned
  * columns (new columns surface after a restart); a dropped or retyped
  * column fails inside `changes()` with its additive-only require.
  */
class LakeCdfSource(spark: SparkSession, root: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
    ReadLimit}

  private def latestVersion: Long = LakeTable.manifest(spark, root).version

  /** Newest version already handed to the engine — the rate-limit base.
    * Recovery is seamless: the engine re-runs the last committed batch
    * through getBatch before polling again, which re-seeds this.
    */
  private var handedOut: Option[Long] = None

  /** Trigger.AvailableNow target, snapshotted at stream start: the run
    * drains versions up to here (in rate-limited spans when
    * `maxVersionsPerTrigger` is set) and stops — commits landing during
    * the drain wait for the next run, the AvailableNow contract.
    */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(latestVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Head, bounded by the AvailableNow target and capped to
    * `base + maxVersionsPerTrigger` when the rate limit is on — a
    * backlog (resumed checkpoint, slow consumer) drains as bounded spans
    * instead of one giant batch. The bootstrap batch is never capped:
    * the snapshot is one unit of work whatever its version number
    * (there is no smaller correct first batch).
    */
  private def nextOffset(base: Option[Long]): Long = {
    val head = availableNowCap.fold(latestVersion)(math.min(latestVersion, _))
    (base, maxVersionsPerTrigger) match {
      case (Some(k), Some(n)) => math.min(head, k + n)
      // changes-only subscription with no committed offset yet: the
      // backlog from startingVersion to head is a DIVISIBLE changes()
      // span (unlike the snapshot bootstrap), so the rate limit applies
      // from the very first batch — seed the base with startingVersion
      case (None, Some(n)) if startingVersion.isDefined =>
        math.min(head, startingVersion.get + n)
      case _ => head
    }
  }

  /** Admission-control poll (the engine prefers this over [[getOffset]]
    * once [[SupportsTriggerAvailableNow]] is implemented; both answer
    * identically). `start` is the offset the engine last committed —
    * authoritative across restarts, so it supersedes [[handedOut]].
    */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val base = Option(start).map(_.json().toLong).orElse(handedOut)
    LongOffset(nextOffset(base))
  }

  override def getOffset: Option[Offset] =
    Some(LongOffset(nextOffset(handedOut)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = end.json().toLong
    handedOut = Some(math.max(to, handedOut.getOrElse(Long.MinValue)))
    val valueCols = schema.fieldNames.toSeq
      .filterNot(Set("_change_type", "_from_version", "_to_version"))
    val body = start match {
      case Some(s) =>
        LakeTable.changes(spark, root, s.json().toLong, to)
      case None => startingVersion match {
        // changes-only subscription from a named version (the Delta
        // `startingVersion` design point): the consumer already holds the
        // state as of that version and wants only what happened after
        case Some(sv) => LakeTable.changes(spark, root, sv, to)
        // initial snapshot as inserts, pinned to the offset version
        case None => LakeTable.read(spark, root, Some(to))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_from_version", lit(-1L))
          .withColumn("_to_version", lit(to))
      }
    }
    // reconcile to the PINNED schema (order and width). Both directions
    // of additive drift between the pinned schema and the span's schema
    // occur legitimately: a restart after widening replays an OLD span
    // (checkpoint recovery re-runs the last committed batch) whose rows
    // predate a pinned column — fill it with typed NULL, exactly what
    // those rows' snapshots contained; a long-running stream pinned
    // before a widening sees NEW columns in the span — project them
    // away until the consumer restarts.
    val present = body.columns.toSet
    val filled = schema.fields.filterNot(f => present(f.name))
      .foldLeft(body)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    GraftSqlBridge.streamingDataFrame(filled.select(
      valueCols.map(col) ++
        Seq(col("_change_type"), col("_from_version"), col("_to_version")): _*))
  }

  override def stop(): Unit = ()
}

object LakeCdfSource {
  /** The stream's row shape: the table's columns plus the CDF metadata
    * trio — identical to [[LakeTable.changes]]' output.
    */
  def cdfSchema(spark: SparkSession, root: String): StructType =
    StructType.fromDDL(LakeTable.manifest(spark, root).schemaDdl)
      .add("_change_type", "string")
      .add("_from_version", "bigint")
      .add("_to_version", "bigint")
}

/** `format("graft-lake-cdf")` registration (META-INF/services). */
class LakeCdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root", throw new IllegalArgumentException(
      """graft-lake-cdf requires .option("root", <lake table root>)"""))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-lake-cdf", schema.getOrElse(
      LakeCdfSource.cdfSchema(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val maxV = parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    new LakeCdfSource(sqlContext.sparkSession, root,
      schema.getOrElse(LakeCdfSource.cdfSchema(sqlContext.sparkSession, root)),
      maxV, parameters.get("startingVersion").map(_.toLong))
  }
}
