package graft

import graft.sinks.{LakeTable, MaterializedView}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

/** Full-surface crash/concurrency sweep — the composition of the pieces
  * the targeted specs pin separately (interleaved writers, interleaved
  * refreshes, publish-crash injection, the sequential op sweep): random
  * op sequences over merge / CoW delete / MoR delete / compaction /
  * rebucket / z-order maintenance / MV refresh, executed by TWO
  * CONCURRENT ACTORS with disjoint key spaces (every step launches both
  * actors' ops simultaneously; disjointness makes the pair commute on
  * the model, so any interleaving must land on the same final state),
  * with CRASHES INJECTED between steps at the protocols' publish
  * boundaries — the newest MV `_sync` marker deleted (a refresh that
  * published its view version but died before the marker), an ORPHAN
  * segment file planted (a commit that wrote its per-delivery segment
  * and died — or lost the claim race — before publishing a manifest),
  * the newest `_zorder` marker deleted (an optimize that died between
  * manifest and marker).
  *
  * After the chaos: (1) a concurrent PAIR of final refreshes converges;
  * (2) the head content equals the model; (3) the whole-history change
  * feed replays the initial model into the final one — including across
  * any rebucket in the span (the full-value-diff fallback); (4) the
  * served view equals the from-scratch aggregate of the model; (5) the
  * segment plane audits clean — fsck ok throughout, planted orphan
  * segments REPORTED, a keep-everything vacuum reclaiming exactly the
  * unreferenced debris with content intact. Every crash state must be
  * healed by the protocols alone — no operator intervention, no wrong
  * content, no stall.
  */
class LakeChaosPropertySpec extends SparkTestBase {
  import spark.implicits._

  private type R = (Long, String, Double)
  private type Model = Map[Long, (String, Double)]

  private sealed trait Op
  private case class Up(rows: Seq[R]) extends Op
  private case class Del(ids: Seq[Long]) extends Op
  private case class DelMor(ids: Seq[Long]) extends Op
  private case object Compact extends Op
  private case object ZOpt extends Op
  private case class Rebucket(n: Int) extends Op
  private case object Refresh extends Op
  // cross-table transaction surface, exercised on one table as a
  // two-member chain: TxnBoth commits (or is legitimately FORCE-ABORTED
  // by the concurrent actor's 150 ms patience — the op reports which),
  // TxnAbort fails after staging, TxnGhost stages and "crashes" without
  // ever writing an outcome
  private case class TxnBoth(r1: Seq[R], r2: Seq[R]) extends Op
  private case class TxnAbort(rows: Seq[R]) extends Op
  private case class TxnGhost(rows: Seq[R]) extends Op

  private sealed trait Crash
  private case object NoCrash extends Crash
  private case object KillSync extends Crash
  // r12 segment plane: a commit that wrote its segment file and died (or
  // lost the manifest claim) before publishing — an ORPHAN segment no
  // manifest references. Readers must be unaffected, fsck must report
  // it, vacuum must reclaim it (asserted post-chaos for every run).
  private case object OrphanSegment extends Crash
  private case object KillZMarker extends Crash
  private case object KillCdfMarker extends Crash

  private def genRowsIn(lo: Long, hi: Long): Gen[Seq[R]] = for {
    ids <- Gen.nonEmptyListOf(Gen.choose(lo, hi)).map(_.distinct)
    gs <- Gen.listOfN(ids.size, Gen.oneOf("a", "b", "c"))
    vs <- Gen.listOfN(ids.size, Gen.choose(0, 99))
  } yield ids.lazyZip(gs).lazyZip(vs).map((id, g, v) => (id, g, v.toDouble))

  private def genOp(lo: Long, hi: Long): Gen[Op] = Gen.frequency(
    5 -> genRowsIn(lo, hi).map(Up),
    2 -> Gen.nonEmptyListOf(Gen.choose(lo, hi)).map(ids => Del(ids.distinct)),
    2 -> Gen.nonEmptyListOf(Gen.choose(lo, hi)).map(ids =>
      DelMor(ids.distinct)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(ZOpt),
    1 -> Gen.oneOf(2, 3, 5).map(Rebucket),
    1 -> Gen.const(Refresh),
    2 -> (for { r1 <- genRowsIn(lo, hi); r2 <- genRowsIn(lo, hi) }
      yield TxnBoth(r1, r2)),
    1 -> genRowsIn(lo, hi).map(TxnAbort),
    1 -> genRowsIn(lo, hi).map(TxnGhost))

  private val genCrash: Gen[Crash] = Gen.frequency(
    4 -> Gen.const(NoCrash), 1 -> Gen.const(KillSync),
    1 -> Gen.const(OrphanSegment), 1 -> Gen.const(KillZMarker),
    1 -> Gen.const(KillCdfMarker))

  // one actor step: ops from DISJOINT id ranges commute on the model
  private case class Step(a: Op, b: Op, crash: Crash)
  private val genStep: Gen[Step] = for {
    a <- genOp(1L, 30L); b <- genOp(31L, 60L); c <- genCrash
  } yield Step(a, b, c)

  private def df(rows: Seq[R]) = rows.toDF("id", "grp", "score")

  private def up(m: Model, rows: Seq[R]): Model =
    m ++ rows.map(r => r._1 -> ((r._2, r._3)))

  /** Run the op and return its effect ON THE MODEL — txn ops only know
    * whether they landed after running (a concurrent force-abort is a
    * legitimate outcome, reported by TxnAbortedException).
    */
  private def runOp(root: String, mvRoot: String, op: Op): Model => Model =
    op match {
      case Up(rows) =>
        LakeTable.merge(spark, root, df(rows)); m => up(m, rows)
      case Del(ids) =>
        LakeTable.delete(spark, root, ids.toDF("id")); m => m -- ids
      case DelMor(ids) =>
        LakeTable.deleteMor(spark, root, ids.toDF("id")); m => m -- ids
      case Compact => LakeTable.compactDeletes(spark, root); identity
      case ZOpt =>
        LakeTable.optimizeZOrderAuto(spark, root, Seq("id", "score"))
        identity
      case Rebucket(n) => LakeTable.rebucket(spark, root, n); identity
      case Refresh => MaterializedView.refresh(spark, root, mvRoot); identity
      case TxnBoth(r1, r2) =>
        try {
          graft.sinks.LakeTxn.atomically(spark, root) { t =>
            t.merge(root, df(r1)); t.merge(root, df(r2))
          }
          m => up(up(m, r1), r2)
        } catch {
          case _: graft.sinks.LakeTxn.TxnAbortedException => identity
        }
      case TxnAbort(rows) =>
        try graft.sinks.LakeTxn.atomically(spark, root) { t =>
          t.merge(root, df(rows)); sys.error("injected txn failure")
        } catch { case e: RuntimeException
            if e.getMessage.contains("injected txn failure") => () }
        identity
      case TxnGhost(rows) =>
        LakeTable.mergeTagged(spark, root, df(rows), None,
          Some(s"$root/_txn/ghost-${java.util.UUID.randomUUID}.json"))
        identity
    }

  // post-crash-state reconstruction: the artifact a crash between the
  // two publishes would have lost is simply deleted
  private def inject(root: String, mvRoot: String, c: Crash): Unit = {
    def killNewest(dir: String): Unit = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val vs = fs.listStatus(p).map(_.getPath.getName)
          .filter(_.endsWith(".json"))
          .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong)
            .toOption)
        // never kill the LAST marker of a chain that needs a root (the
        // MV init marker): that is not a reachable crash state — init
        // writes its marker before any refresh can observe the view
        if (vs.size > 1) fs.delete(new Path(p, s"${vs.max}.json"), false)
      }
    }
    c match {
      case NoCrash => ()
      case KillSync => killNewest(s"$mvRoot/_sync")
      case KillZMarker =>
        val p = new Path(s"$root/_zorder")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val vs = fs.listStatus(p).map(_.getPath.getName)
            .filter(_.endsWith(".json"))
            .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong)
              .toOption)
          if (vs.nonEmpty)
            fs.delete(new Path(p, s"${vs.max}.json"), false)
        }
      case OrphanSegment =>
        // a crash between segment write and manifest publish: copy a live
        // segment file (if any) to a fresh UUID name nothing references
        val p = new Path(s"$root/_segments")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val segs = fs.listStatus(p).filter(_.getPath.getName.endsWith(".json"))
          if (segs.nonEmpty) {
            val dst = new Path(p, s"${java.util.UUID.randomUUID}.json")
            org.apache.hadoop.fs.FileUtil.copy(fs, segs.head.getPath,
              fs, dst, false, spark.sparkContext.hadoopConfiguration)
          }
        }
      case KillCdfMarker =>
        // a commit that died between manifest and feed marker: the span
        // must degrade to the snapshot diff, never break
        val v = LakeTable.manifest(spark, root).version
        val p = new Path(s"$root/_cdf/$v.json")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, false)
    }
  }

  private def asModel(d: org.apache.spark.sql.DataFrame): Model =
    d.select($"id", $"grp", $"score").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("MV refresh across a rebucket span: full-value-diff fallback keeps the feed sound") {
    val root = java.nio.file.Files.createTempDirectory("lakerb").toString
    val mvRoot = java.nio.file.Files.createTempDirectory("lakerbmv").toString
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
    LakeTable.init(df(base), root, Seq("id"), numBuckets = 2)
    MaterializedView.init(spark, root, mvRoot, Seq("grp"), Seq("score"))
    // a delivery, then a REBUCKET, then another delivery — the refresh
    // span crosses the layout boundary; before r11 changes() refused it
    // and the view was permanently unrefreshable without a reinit
    LakeTable.merge(spark, root, df(Seq((4L, "b", 4.0))))
    LakeTable.rebucket(spark, root, 5)
    LakeTable.merge(spark, root, df(Seq((1L, "a", 10.0))))
    MaterializedView.refresh(spark, root, mvRoot)
    val got = MaterializedView.read(spark, mvRoot)
      .select($"grp", $"cnt", $"sum_score".cast("double")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe Map("a" -> ((2L, 13.0)), "b" -> ((2L, 6.0)))
    // the rebucket itself nets to zero rows in the feed
    val feed = LakeTable.changes(spark, root, 0L,
      LakeTable.manifest(spark, root).version)
      .select($"id", $"_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    feed shouldBe Set((4L, "insert"), (1L, "update_preimage"),
      (1L, "update_postimage"))
  }

  test("property: two concurrent actors + injected publish-boundary crashes converge to the model") {
    val prop = Prop.forAll(genRowsIn(1L, 60L), Gen.listOfN(3, genStep)) {
      (base, steps) =>
        val root = java.nio.file.Files.createTempDirectory("lakechaos").toString
        val mvRoot = java.nio.file.Files.createTempDirectory("lakechaosmv").toString
        // cdfRecord: the recorded-feed fast path runs under the same
        // chaos (deleteMor/restore-free recorded spans serve from feed
        // files; deleteMor steps and killed markers force the fallback)
        LakeTable.init(df(base), root, Seq("id"), numBuckets = 2,
          statsCols = Seq("id", "score"), cdfRecord = true)
        MaterializedView.init(spark, root, mvRoot, Seq("grp"), Seq("score"))
        var model: Model = base.map(r => r._1 -> ((r._2, r._3))).toMap
        val v0 = LakeTable.manifest(spark, root).version
        // short patience so ghost transactions are force-aborted inside
        // the test's own time budget (healthy TxnBoth windows may also
        // lose to it — the op reports which way it went)
        spark.sparkContext.hadoopConfiguration
          .setLong("graft.lake.txnWaitMs", 150L)
        try steps.foreach { s =>
          // both actors fire SIMULTANEOUSLY; retries/races must land both
          val fa = Future(runOp(root, mvRoot, s.a))
          val fb = Future(runOp(root, mvRoot, s.b))
          val ea = Await.result(fa, Duration("300s"))
          val eb = Await.result(fb, Duration("300s"))
          // effects commute (disjoint id ranges), so application order
          // doesn't matter
          model = eb(ea(model))
          inject(root, mvRoot, s.crash)
        } finally spark.sparkContext.hadoopConfiguration
          .unset("graft.lake.txnWaitMs")
        // quiesce: a RACING final refresh pair must both succeed and
        // leave one application of the outstanding feed
        val frs = Seq(Future(MaterializedView.refresh(spark, root, mvRoot)),
          Future(MaterializedView.refresh(spark, root, mvRoot)))
        frs.foreach(f => Await.result(f, Duration("300s")))

        val headOk = asModel(LakeTable.read(spark, root)) == model
        // whole-history replay, crossing any rebucket via the full diff
        val vEnd = LakeTable.manifest(spark, root).version
        val replayOk = if (vEnd == v0) true else {
          val feed = LakeTable.changes(spark, root, v0, vEnd)
            .select($"id", $"grp", $"score", $"_change_type").collect()
          val replayed = feed.groupBy(_.getLong(0))
            .foldLeft(base.map(r => r._1 -> ((r._2, r._3))).toMap) {
              case (m, (id, rows)) =>
                rows.find(r =>
                  Set("insert", "update_postimage")(r.getString(3))) match {
                  case Some(r) =>
                    m + (id -> ((r.getString(1), r.getDouble(2))))
                  case None => m - id
                }
            }
          replayed == model
        }
        // the served view equals the from-scratch aggregate of the model
        val want = model.values.groupBy(_._1).view.mapValues(vs =>
          (vs.size.toLong, vs.map(_._2).sum)).toMap
        val got = MaterializedView.read(spark, mvRoot)
          .select($"grp", $"cnt", $"sum_score".cast("double"))
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        val viewOk = got == want
        // segment-plane invariants under the same chaos: no referenced
        // metadata file is ever missing (fsck ok), orphan segments are
        // REPORTED (when a crash planted one) and a vacuum that keeps
        // every version reclaims exactly the unreferenced debris,
        // converging fsck back to zero orphans with content intact
        val rep = LakeTable.fsck(spark, root)
        val planted = steps.exists(_.crash == OrphanSegment)
        LakeTable.vacuum(spark, root, keepLast = 1000)
        val rep2 = LakeTable.fsck(spark, root)
        val segOk = rep.ok && rep2.ok && rep2.orphanSegments.isEmpty &&
          (!planted || rep.orphanSegments.nonEmpty) &&
          asModel(LakeTable.read(spark, root)) == model
        val ok = headOk && replayOk && viewOk && segOk
        if (!ok) System.err.println(
          s"chaos mismatch head=$headOk replay=$replayOk view=$viewOk " +
            s"seg=$segOk\nbase=$base\nsteps=$steps\ngot=$got\nwant=$want")
        ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
