package graft.streaming

import graft.sinks.LakeTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** TRANSACTION-CONSISTENT change-feed source over N lake tables — the
  * general form of [[LakeTxnCdfPairSource]] (which is now the N = 2
  * instance, kept for its own offset format's checkpoint compatibility).
  * A [[graft.sinks.LakeTxn]] commit can span any number of member tables
  * (fact + dim + bridge is the first real shape past a pair); N
  * independent `graft-lake-cdf` streams drain at their own rates, so a
  * replica group could expose a torn state. This source subscribes to
  * every feed with one composite offset `{"v":[v0,…,vN-1]}` chosen as a
  * '''consistent cut''': for every committed transaction, either all of
  * its members are inside the cut or all are beyond it — a batch can
  * never split a transaction, across tables or along one table's
  * multi-member chain.
  *
  * Cut computation ([[LakeTxnCdfGroupSource.consistentCutN]]): poll every
  * live head, then clamp to fixpoint — a txn-tagged committed version
  * inside one root's span whose sibling member (same outcome path, the
  * transaction's one shared fact) lies beyond ANY root's candidate is
  * excluded by lowering its own root below it. The scan covers only
  * (previous offset, head] per root — O(delta) manifest reads per poll,
  * no data file touched — because every transaction wholly inside a
  * previous batch was consistent by induction.
  *
  * Rows are the union-by-name of all tables' CDF feeds plus a `_table`
  * column carrying the root the row belongs to; columns the schemas
  * don't share are NULL on other roots' rows (shared names must agree on
  * type — required at stream creation). Bootstrap batch = every snapshot
  * as inserts at one consistent cut. Exactly-once for the same reason as
  * the single-table source: offsets are versions, spans deterministic,
  * appliers idempotent.
  */
class LakeTxnCdfGroupSource(spark: SparkSession, roots: Seq[String],
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset,
    ReadLimit}
  import LakeTxnCdfGroupSource._

  require(roots.size >= 2, s"group source needs >= 2 roots, got $roots")
  require(roots.distinct.size == roots.size, s"duplicate root in $roots")

  private var handedOut: Option[IndexedSeq[Long]] = None
  private var availableNowCap: Option[IndexedSeq[Long]] = None

  private def heads(): IndexedSeq[Long] =
    roots.map(r => LakeTable.manifest(spark, r).version).toIndexedSeq

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(heads())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def nextOffset(base: Option[IndexedSeq[Long]]): IndexedSeq[Long] = {
    val h0 = heads()
    val h1 = availableNowCap.fold(h0)(c =>
      h0.zip(c).map { case (h, cap) => math.min(h, cap) })
    // rate limit BEFORE the consistency clamp: capping only lowers the
    // candidate and clamping only lowers it further, so the cut stays
    // consistent — a transaction whose sibling sits past another root's
    // cap simply waits for the trigger whose cap reaches it. The
    // bootstrap batch (no base) is never capped: the snapshot group is
    // one unit of work, there is no smaller correct first batch.
    val h = (base, maxVersionsPerTrigger) match {
      case (Some(b), Some(n)) => h1.zip(b).map { case (x, p) =>
        math.min(x, p + n) }
      case _ => h1
    }
    // only the head THIS poll resolved is known-live: its manifest()
    // read just proved both liveness and existence. The prepare-time
    // AvailableNow cap was live when captured, but a concurrent vacuum
    // may have DELETED its slot since — handing it out unprobed would
    // wedge the checkpoint on a missing version — so capped candidates
    // keep the direct probe (one read per capped trigger; the uncapped
    // steady state is the case the skip pays for)
    consistentCutN(spark, roots,
      base.getOrElse(IndexedSeq.fill(roots.size)(-1L)), h, knownLive = h0)
  }

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val base = Option(start).map(o => parseOffset(o.json())).orElse(handedOut)
    renderOffset(nextOffset(base))
  }

  override def getOffset: Option[Offset] =
    Some(renderOffset(nextOffset(handedOut)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = parseOffset(end.json())
    handedOut = Some(handedOut.fold(to)(h =>
      h.zip(to).map { case (a, b) => math.max(a, b) }))
    val from = start.map(o => parseOffset(o.json()))
    def side(i: Int): Option[DataFrame] = {
      val root = roots(i); val toV = to(i)
      val body = from.map(_(i)) match {
        case Some(f) if f == toV =>
          null // nothing new on this root this trigger
        case Some(f) => LakeTable.changes(spark, root, f, toV)
        case None => LakeTable.read(spark, root, Some(toV))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_from_version", lit(-1L))
          .withColumn("_to_version", lit(toV))
      }
      Option(body).map(_.withColumn("_table", lit(root)))
    }
    // union by the PINNED schema: each root fills the others' columns
    // with typed NULLs, exactly like the single-table source reconciles
    def conform(d: DataFrame): DataFrame = {
      val present = d.columns.toSet
      val filled = schema.fields.filterNot(f => present(f.name))
        .foldLeft(d)((x, f) => x.withColumn(f.name, lit(null).cast(f.dataType)))
      filled.select(schema.fieldNames.map(col).toSeq: _*)
    }
    val sides = roots.indices.flatMap(side).map(conform)
    val unioned =
      if (sides.isEmpty) conform(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
      else sides.reduce(_ unionByName _)
    GraftSqlBridge.streamingDataFrame(unioned)
  }

  override def stop(): Unit = ()
}

object LakeTxnCdfGroupSource {

  private[streaming] def renderOffset(o: IndexedSeq[Long]) =
    org.apache.spark.sql.execution.streaming.runtime
      .SerializedOffset(s"""{"v":[${o.mkString(",")}]}""")

  private[streaming] def parseOffset(s: String): IndexedSeq[Long] = {
    val body = "\\[([^\\]]*)\\]".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"bad group offset $s")).group(1).trim
    require(body.nonEmpty, s"bad group offset $s")
    body.split(",").iterator.map(_.trim.toLong).toIndexedSeq
  }

  /** The largest transaction-consistent cut `c` with `prev ≤ c ≤ h`
    * per root — whole on EVERY axis: a committed transaction's members
    * stay jointly in or out, across roots and along one root's
    * multi-member chain (its members flipped visible as one unit; a
    * batch serving half of it would expose a state the source never
    * served). Any committed member inside its root's candidate whose
    * sibling on any root lies beyond that root's candidate clamps its
    * own root below it, iterated to fixpoint. Only (prev, candidate]
    * slots are scanned — transactions wholly inside a previous batch
    * are consistent by induction, and manifest reads are metadata-only.
    * Never clamps below `prev` (a committed offset is already
    * consistent and immutable).
    */
  private[graft] def consistentCutN(spark: SparkSession, roots: Seq[String],
      prev: IndexedSeq[Long], h: IndexedSeq[Long],
      knownLive: IndexedSeq[Long] = IndexedSeq.empty): IndexedSeq[Long] = {
    val n = roots.size
    require(prev.size == n && h.size == n,
      s"offset arity ${prev.size}/${h.size} != roots $n")
    // committed-txn members in (from, to]: slot -> outcome path
    def txnsIn(root: String, from: Long, to: Long): Seq[(Long, String)] =
      ((from + 1) to to).flatMap { v =>
        scala.util.Try(LakeTable.manifestAt(spark, root, v)).toOption
          .flatMap(m => m.txn.filter(p =>
            LakeTable.txnOutcome(spark, p).contains(true)).map(v -> _))
      }
    // the first member of outcome path p on `root` above `from`, if any
    // (members below a committed offset are already served); a LATER
    // member past the cut is caught by that root's own clamp iteration
    def siblingAbove(root: String, p: String, from: Long): Option[Long] = {
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      LakeTable.versions(fs, root).filter(_ > from).find { v =>
        scala.util.Try(LakeTable.manifestAt(spark, root, v)).toOption
          .exists(_.txn.contains(p))
      }
    }
    // an offset must land on a LIVE slot (or stay at `prev`, live by
    // induction): getBatch serves it through changes()/read(), which
    // require committed visibility — a cut clamped onto an aborted or
    // in-flight txn slot would throw there, and the offset may already
    // be checkpointed, wedging the stream. Walk down past non-live
    // slots; cheap in practice (undecided slots form a top suffix of
    // the chain, and aborted mid-chain slots are rare one-step hops).
    def liveAtOrBelow(root: String, floor: Long, v: Long): Long = {
      if (v <= floor) return floor
      // direct probe first: in the uncapped steady state the candidate
      // IS the polled live head, so this is one manifest read with no
      // directory listing — the walk below only runs for rate-capped or
      // clamped candidates that landed on a dead/missing slot
      if (scala.util.Try(LakeTable.manifestAt(spark, root, v)).toOption
          .exists(LakeTable.liveOf(spark, _))) return v
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      LakeTable.versions(fs, root)
        .filter(x => x > floor && x < v).sorted.reverseIterator
        .find(x => scala.util.Try(LakeTable.manifestAt(spark, root, x))
          .toOption.exists(LakeTable.liveOf(spark, _)))
        .getOrElse(floor)
    }
    // initial candidates normalize too: the caller's rate cap `prev + n`
    // is a raw slot number that can land on a dead slot just like a clamp
    // — but a candidate the caller verified THIS poll (`knownLive`: the
    // just-resolved live head, whose manifest read proved liveness AND
    // existence) skips the probe, so the uncapped steady state pays no
    // extra manifest/outcome read per root per poll. Only a same-poll
    // verification qualifies: an older one (e.g. a prepare-time cap)
    // proves liveness — immutable — but not that the slot still EXISTS
    // under a concurrent vacuum
    val c = Array.tabulate(n) { i =>
      val cand = math.max(h(i), prev(i))
      if (knownLive.lift(i).contains(cand)) cand
      else liveAtOrBelow(roots(i), prev(i), cand)
    }
    var changed = true
    while (changed) {
      changed = false
      for (i <- 0 until n; (v, p) <- txnsIn(roots(i), prev(i), c(i))) {
        // a member is torn when its transaction has ANOTHER member beyond
        // a candidate — on any OTHER root (the cross-table tear) or on
        // its OWN root above the same cut (the single-table chain)
        val torn = (0 until n).exists { j =>
          val from = if (j == i) v else prev(j)
          siblingAbove(roots(j), p, from).exists(_ > c(j))
        }
        if (torn) {
          val clamped = liveAtOrBelow(roots(i), prev(i), v - 1)
          if (clamped < c(i)) { c(i) = clamped; changed = true }
        }
      }
    }
    c.toIndexedSeq
  }

  /** The pinned stream schema: union of every root's table schema (shared
    * names must agree on type) plus `_table` and the CDF meta columns.
    */
  private[streaming] def groupSchema(spark: SparkSession,
      roots: Seq[String]): StructType = {
    val merged = roots.map(r =>
      StructType.fromDDL(LakeTable.manifest(spark, r).schemaDdl))
      .reduce { (acc, s) =>
        s.fields.foldLeft(acc) { (a, f) =>
          a.find(_.name == f.name) match {
            case Some(have) =>
              require(have.dataType == f.dataType,
                s"group stream: column ${f.name} is ${have.dataType} on one " +
                  s"root but ${f.dataType} on another — shared names must agree")
              a
            case None => a.add(f)
          }
        }
      }
    merged.fields.foldLeft(new StructType().add("_table", "string"))(
      (s, f) => s.add(f))
      .add("_change_type", "string")
      .add("_from_version", "bigint")
      .add("_to_version", "bigint")
  }
}

/** `format("graft-lake-cdf-group")` registration (META-INF/services). */
class LakeTxnCdfGroupSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf-group"

  private def rootsOf(parameters: Map[String, String]): Seq[String] = {
    val rs = parameters.getOrElse("roots", throw new IllegalArgumentException(
      """graft-lake-cdf-group requires .option("roots", "<root>,<root>,...")"""))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(rs.size >= 2,
      s"graft-lake-cdf-group needs >= 2 roots, got $rs")
    rs
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-lake-cdf-group", schema.getOrElse(
      LakeTxnCdfGroupSource.groupSchema(sqlContext.sparkSession,
        rootsOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val roots = rootsOf(parameters)
    val maxV = parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    new LakeTxnCdfGroupSource(sqlContext.sparkSession, roots,
      schema.getOrElse(LakeTxnCdfGroupSource.groupSchema(
        sqlContext.sparkSession, roots)), maxV)
  }
}
