package graft

import graft.sinks.LakeTable
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property sweep over the lake table's write surface — merge (upsert
  * with value churn), copy-on-write delete, merge-on-read delete,
  * vector compaction, the auto z-order pass (full bootstrap, then
  * incremental; a pure layout rewrite, so the model ignores it), and
  * indexing re-declaration (alterIndexing, which may drop a z column
  * from statsCols under a live marker — the maintenance pass must then
  * fail loudly, never crash on a misaligned sidecar index) —
  * against an in-memory model map. After a random
  * op sequence: (1) the head read equals the model; (2) EVERY published
  * version time-travels to the model as it stood after that op; (3) the
  * change feed across the whole history replays the initial model into
  * the final one (the CDF is the contract every incremental consumer —
  * MVs, downstream syncs — rests on); (4) a restore to a random earlier
  * version serves exactly that version's content.
  */
class LakeTablePropertySpec extends SparkTestBase {
  import spark.implicits._

  private type R = (Long, String, Double)
  private type Model = Map[Long, (String, Double)]

  private sealed trait Op
  private case class Up(rows: Seq[R]) extends Op
  private case class Del(ids: Seq[Long]) extends Op
  private case class DelMor(ids: Seq[Long]) extends Op
  private case object Compact extends Op
  // the auto z pass (bootstrap full, then incremental): content no-op
  private case object ZOpt extends Op
  // indexing re-declaration: may DROP a z column from statsCols under a
  // live marker (the interleaving behind the r10 axesDrifted crash)
  private case class AlterIdx(statsCols: Seq[String]) extends Op

  private val genRow: Gen[R] = for {
    id <- Gen.choose(1L, 12L)
    g <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0, 99)
  } yield (id, g, v.toDouble)

  private val genRows: Gen[Seq[R]] =
    Gen.nonEmptyListOf(genRow).map(_.distinctBy(_._1))

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> genRows.map(Up),
    2 -> Gen.nonEmptyListOf(Gen.choose(1L, 12L)).map(ids => Del(ids.distinct)),
    2 -> Gen.nonEmptyListOf(Gen.choose(1L, 12L)).map(ids => DelMor(ids.distinct)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(ZOpt),
    1 -> Gen.oneOf(Seq("score", "id"), Seq("id"), Seq("id", "score"))
      .map(AlterIdx))

  private def df(rows: Seq[R]) = rows.toDF("id", "grp", "score")

  private def applyModel(m: Model, op: Op): Model = op match {
    case Up(rows) => m ++ rows.map(r => r._1 -> ((r._2, r._3)))
    case Del(ids) => m -- ids
    case DelMor(ids) => m -- ids
    case Compact => m
    case ZOpt => m
    case AlterIdx(_) => m
  }

  private def asModel(d: org.apache.spark.sql.DataFrame): Model =
    d.select($"id", $"grp", $"score").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("property: reads, time travel, CDF replay and restore agree with the model") {
    val prop = Prop.forAll(genRows, Gen.listOfN(4, genOp)) { (base, ops) =>
      val root = java.nio.file.Files.createTempDirectory("lakeprop").toString
      LakeTable.init(df(base), root, Seq("id"), numBuckets = 2,
        statsCols = Seq("score", "id"), ndvCols = Seq("grp", "score"))
      var model: Model = base.map(r => r._1 -> ((r._2, r._3))).toMap
      val v0 = LakeTable.manifest(spark, root).version
      // (version after op, model after op)
      val history = Seq.newBuilder[(Long, Model)]
      history += ((v0, model))
      ops.foreach { op =>
        op match {
          case Up(rows) => LakeTable.merge(spark, root, df(rows))
          case Del(ids) => LakeTable.delete(spark, root, ids.toDF("id"))
          case DelMor(ids) => LakeTable.deleteMor(spark, root, ids.toDF("id"))
          case Compact => LakeTable.compactDeletes(spark, root)
          case ZOpt =>
            // when a prior AlterIdx dropped a z column from statsCols the
            // pass must fail with the LOUD z⊆statsCols contract (never an
            // IndexOutOfBounds from a misaligned sidecar index)
            val st = LakeTable.manifest(spark, root).statsCols
            if (Seq("id", "score").forall(st.contains))
              LakeTable.optimizeZOrderAuto(spark, root, Seq("id", "score"))
            else intercept[IllegalArgumentException] {
              LakeTable.optimizeZOrderAuto(spark, root, Seq("id", "score"))
            }
          case AlterIdx(statsCols) =>
            LakeTable.alterIndexing(spark, root, statsCols,
              ndvCols = Seq("grp", "score"))
        }
        model = applyModel(model, op)
        history += ((LakeTable.manifest(spark, root).version, model))
      }
      val hist = history.result()
      val headOk = asModel(LakeTable.read(spark, root)) == model
      // every version (deduped: an op may not publish) serves its model
      val travelOk = hist.groupBy(_._1).view.mapValues(_.last._2).forall {
        case (v, m) => asModel(LakeTable.read(spark, root, Some(v))) == m
      }
      // CDF replay: initial model + whole-history feed = final model
      val vEnd = hist.last._1
      val replayOk = if (vEnd == v0) true else {
        val feed = LakeTable.changes(spark, root, v0, vEnd)
          .select($"id", $"grp", $"score", $"_change_type").collect()
        // a snapshot diff carries each id once as insert | delete |
        // update(pre+post); apply per id, post-image wins — collect()
        // row order is not part of the contract
        val replayed = feed.groupBy(_.getLong(0))
          .foldLeft(hist.head._2) { case (m, (id, rows)) =>
            rows.find(r =>
              Set("insert", "update_postimage")(r.getString(3))) match {
              case Some(r) => m + (id -> ((r.getString(1), r.getDouble(2))))
              case None => m - id
            }
          }
        replayed == model
      }
      // metadata statistics agree with the model whenever they ANSWER;
      // declining is legitimate ONLY under outstanding deletion vectors
      val dvOut = LakeTable.manifest(spark, root).dvFiles.nonEmpty
      val fastOk = (LakeTable.fastCount(spark, root) match {
        case Some(n) => !dvOut && n == model.size
        case None => dvOut
      }) && (LakeTable.fastNdv(spark, root, "grp") match {
        case Some(n) => !dvOut && n == model.values.map(_._1).toSet.size
        case None => dvOut
      }) && (LakeTable.fastNdv(spark, root, "score") match {
        case Some(n) => !dvOut && n == model.values.map(_._2).toSet.size
        case None => dvOut
      })
      // restore to the earliest version: content rolls back exactly
      LakeTable.restore(spark, root, v0)
      val restoreOk = asModel(LakeTable.read(spark, root)) == hist.head._2
      val ok = headOk && travelOk && replayOk && restoreOk && fastOk
      if (!ok) System.err.println(
        s"lake property mismatch head=$headOk travel=$travelOk " +
          s"replay=$replayOk restore=$restoreOk fast=$fastOk\nbase=$base\nops=$ops")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
