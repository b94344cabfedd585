package graft.streaming

import graft.sinks.LakeTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** TRANSACTION-CONSISTENT change-feed source over a PAIR of lake tables
  * — the missing half of cross-table atomicity ([[graft.sinks.LakeTxn]]):
  * two tables committed together flip visibility with ONE outcome-file
  * create, but two INDEPENDENT `graft-lake-cdf` streams drain at their
  * own rates, so a downstream replica pair can expose a torn state (fact
  * rows from a transaction whose dim half hasn't arrived). This source
  * subscribes to BOTH feeds with one composite offset `{"a":vA,"b":vB}`
  * chosen as a '''consistent cut''': for every committed transaction
  * with members on both tables, either both members are inside the cut
  * or both are beyond it — a batch can never split a transaction.
  *
  * Cut computation ([[LakeTxnCdfPairSource.consistentCut]]): poll both
  * live heads, then clamp — a txn-tagged committed version inside one
  * side's span whose sibling (same outcome path, the transaction's one
  * shared fact) lies beyond the other side's candidate is excluded by
  * lowering that side below it, iterated to fixpoint. The scan covers
  * only (previous offset, head] on each side — O(delta) manifest reads
  * per poll, no data file touched — because every transaction wholly
  * inside a previous batch was consistent by induction.
  *
  * Rows are the union-by-name of both tables' CDF feeds plus a `_table`
  * column carrying the root the row belongs to; columns the two schemas
  * don't share are NULL on the other side's rows (shared names must
  * agree on type — required at stream creation). Bootstrap batch =
  * both snapshots-as-inserts at one consistent cut. Exactly-once for
  * the same reason as the single-table source: offsets are versions,
  * spans are deterministic, appliers are idempotent.
  */
class LakeTxnCdfPairSource(spark: SparkSession, rootA: String,
    rootB: String, override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
    ReadLimit}
  import LakeTxnCdfPairSource._

  private var handedOut: Option[(Long, Long)] = None
  private var availableNowCap: Option[(Long, Long)] = None

  private def head(root: String): Long =
    LakeTable.manifest(spark, root).version

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some((head(rootA), head(rootB)))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def nextOffset(base: Option[(Long, Long)]): (Long, Long) = {
    val hA0 = head(rootA); val hB0 = head(rootB)
    val (hA1, hB1) = availableNowCap
      .fold((hA0, hB0))(c => (math.min(hA0, c._1), math.min(hB0, c._2)))
    // rate limit BEFORE the consistency clamp: capping only lowers the
    // candidate and clamping only lowers it further, so the cut stays
    // consistent — a transaction whose sibling sits past the other
    // side's cap simply waits for the trigger whose cap reaches it.
    // The bootstrap batch (no base) is never capped: the snapshot pair
    // is one unit of work, there is no smaller correct first batch.
    val (hA, hB) = (base, maxVersionsPerTrigger) match {
      case (Some((a, b)), Some(n)) =>
        (math.min(hA1, a + n), math.min(hB1, b + n))
      case _ => (hA1, hB1)
    }
    // only the heads THIS poll resolved are known-live (their manifest()
    // reads just proved liveness AND existence); a prepare-time cap slot
    // may have been vacuumed since capture, so capped candidates keep
    // the direct probe — see the group source's nextOffset
    consistentCut(spark, rootA, rootB,
      base.map(_._1).getOrElse(-1L), base.map(_._2).getOrElse(-1L), hA, hB,
      knownLiveA = hA0, knownLiveB = hB0)
  }

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val base = Option(start).map(o => parseOffset(o.json())).orElse(handedOut)
    renderOffset(nextOffset(base))
  }

  override def getOffset: Option[Offset] =
    Some(renderOffset(nextOffset(handedOut)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (toA, toB) = parseOffset(end.json())
    handedOut = Some((
      math.max(toA, handedOut.map(_._1).getOrElse(Long.MinValue)),
      math.max(toB, handedOut.map(_._2).getOrElse(Long.MinValue))))
    val from = start.map(o => parseOffset(o.json()))
    def side(root: String, fromV: Option[Long], toV: Long): DataFrame = {
      val body = fromV match {
        case Some(f) if f == toV =>
          null // nothing new on this side this trigger
        case Some(f) => LakeTable.changes(spark, root, f, toV)
        case None => LakeTable.read(spark, root, Some(toV))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_from_version", lit(-1L))
          .withColumn("_to_version", lit(toV))
      }
      if (body == null) null
      else body.withColumn("_table", lit(root))
    }
    val a = side(rootA, from.map(_._1), toA)
    val b = side(rootB, from.map(_._2), toB)
    // union by the PINNED schema: each side fills the other's columns
    // with typed NULLs, exactly like the single-table source reconciles
    def conform(d: DataFrame): DataFrame = {
      val present = d.columns.toSet
      val filled = schema.fields.filterNot(f => present(f.name))
        .foldLeft(d)((x, f) => x.withColumn(f.name, lit(null).cast(f.dataType)))
      filled.select(schema.fieldNames.map(col).toSeq: _*)
    }
    val unioned = (Option(a).map(conform), Option(b).map(conform)) match {
      case (Some(x), Some(y)) => x.unionByName(y)
      case (Some(x), None) => x
      case (None, Some(y)) => y
      case (None, None) =>
        conform(spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema))
    }
    GraftSqlBridge.streamingDataFrame(unioned)
  }

  override def stop(): Unit = ()
}

object LakeTxnCdfPairSource {

  private[streaming] def renderOffset(o: (Long, Long)) =
    org.apache.spark.sql.execution.streaming.runtime
      .SerializedOffset(s"""{"a":${o._1},"b":${o._2}}""")

  private[streaming] def parseOffset(s: String): (Long, Long) = {
    def f(k: String) = ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"bad pair offset $s")).group(1).toLong
    (f("a"), f("b"))
  }

  /** The largest transaction-consistent cut `(cA, cB)` — the N = 2
    * instance of [[LakeTxnCdfGroupSource.consistentCutN]] (the pair
    * source keeps its own `{"a":…,"b":…}` offset format so existing
    * checkpoints recover; the clamp logic lives once in the group form).
    */
  private[graft] def consistentCut(spark: SparkSession, rootA: String,
      rootB: String, prevA: Long, prevB: Long, hA: Long,
      hB: Long, knownLiveA: Long = -1L,
      knownLiveB: Long = -1L): (Long, Long) = {
    val c = LakeTxnCdfGroupSource.consistentCutN(spark,
      Seq(rootA, rootB), IndexedSeq(prevA, prevB), IndexedSeq(hA, hB),
      knownLive = IndexedSeq(knownLiveA, knownLiveB))
    (c(0), c(1))
  }

}

/** `format("graft-lake-cdf-pair")` registration (META-INF/services). */
class LakeTxnCdfPairSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf-pair"

  private def rootsOf(parameters: Map[String, String]): (String, String) = (
    parameters.getOrElse("rootA", throw new IllegalArgumentException(
      """graft-lake-cdf-pair requires .option("rootA", <lake root>)""")),
    parameters.getOrElse("rootB", throw new IllegalArgumentException(
      """graft-lake-cdf-pair requires .option("rootB", <lake root>)""")))

  private def schemaOf(spark: SparkSession, rootA: String,
      rootB: String): StructType = {
    val a = StructType.fromDDL(LakeTable.manifest(spark, rootA).schemaDdl)
    val b = StructType.fromDDL(LakeTable.manifest(spark, rootB).schemaDdl)
    val merged = b.fields.foldLeft(a) { (acc, f) =>
      acc.find(_.name == f.name) match {
        case Some(have) =>
          require(have.dataType == f.dataType,
            s"pair stream: column ${f.name} is ${have.dataType} on $rootA " +
              s"but ${f.dataType} on $rootB — shared names must agree")
          acc
        case None => acc.add(f)
      }
    }
    merged.fields.foldLeft(new StructType().add("_table", "string"))(
      (s, f) => s.add(f))
      .add("_change_type", "string")
      .add("_from_version", "bigint")
      .add("_to_version", "bigint")
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (a, b) = rootsOf(parameters)
    ("graft-lake-cdf-pair",
      schema.getOrElse(schemaOf(sqlContext.sparkSession, a, b)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (a, b) = rootsOf(parameters)
    val maxV = parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    new LakeTxnCdfPairSource(sqlContext.sparkSession, a, b,
      schema.getOrElse(schemaOf(sqlContext.sparkSession, a, b)), maxV)
  }
}
