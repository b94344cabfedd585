package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Cross-table ATOMIC transactions over [[LakeTable]]s — readers see all
  * of a transaction's versions or none of them, with one filesystem
  * operation as the commit point (the piece single-table optimistic
  * commits can't give a bronze→silver→gold pipeline: publish silver and
  * gold together so no reader ever joins new silver against old gold).
  *
  * Protocol (original; the outcome-file construction is the classic
  * presumed-abort two-phase commit, adapted to the manifest claim):
  *
  *  1. The transaction names an OUTCOME file (`<coordDir>/_txn/<id>.json`)
  *     that does not exist yet.
  *  2. Each member operation runs the NORMAL copy-on-write path and
  *     publishes its manifest through the same exclusive slot claim as
  *     any commit — tagged `txn = <outcome path>`. A tagged version is
  *     INVISIBLE: every reader treats it as absent until the outcome
  *     file records `commit`. Members on the same table chain (a later
  *     op sees the transaction's own staged head).
  *  3. Commit = ONE exclusive create of the outcome file with
  *     `{"outcome":"commit"}`. All member versions flip visible together
  *     — on every table, atomically, because visibility is a function of
  *     that single file.
  *
  * Failure matrix (all spec-pinned in LakeTxnSpec):
  *  - crash anywhere before step 3 → outcome file missing → every staged
  *    version stays invisible (presumed abort). The staged slots stay
  *    claimed; writers that later need those tables wait
  *    `graft.lake.txnWaitMs` for the outcome and then FORCE-ABORT the
  *    transaction by claiming its outcome file with `abort`
  *    ([[LakeTable]] publish's below-slot guard) — the table is writable
  *    again and the dead versions are [[LakeTable.vacuum]] food.
  *  - force-abort racing a late commit → the outcome file is claimed
  *    exclusively, so exactly one of them wins; the loser observes the
  *    decided outcome. A transaction that loses to a force-abort fails
  *    loudly here (TxnAbortedException) having published NOTHING
  *    visible.
  *  - a concurrent NON-member commit racing a member's slot claim → the
  *    ordinary [[LakeTable.CommitRaceException]] retry inside the member
  *    op (rebase and re-claim), invisible to this protocol.
  *
  * Serialization: a member publish makes the transaction the table's
  * in-flight head, and no writer claims ABOVE an undecided slot, so the
  * transaction holds an effective write lock per touched table from its
  * member publish until the outcome — keep transactions short. Readers
  * are never blocked (they see the pre-transaction head throughout).
  *
  * Scale: the transaction adds ZERO data-path cost — members pay exactly
  * their normal copy-on-write work; the protocol's own footprint is one
  * manifest tag per member and one outcome file, all metadata.
  */
object LakeTxn {

  final class TxnAbortedException(msg: String)
    extends RuntimeException(msg)

  /** Handle passed to the transaction body: run member operations through
    * it. Operations execute (and pay their cost) immediately — only their
    * VISIBILITY is deferred to the outcome.
    */
  final class Txn private[LakeTxn] (spark: SparkSession,
      private[LakeTxn] val outcomePath: String) {
    private[LakeTxn] val staged =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    private val tag = Some(outcomePath)

    /** [[LakeTable.merge]] as a transaction member. */
    def merge(root: String, source: DataFrame,
        orderCol: Option[String] = None): Long = {
      val v = LakeTable.mergeTagged(spark, root, source, orderCol, tag)
      staged += ((root, v)); v
    }

    /** [[LakeTable.deleteMor]] as a transaction member. */
    def deleteMor(root: String, keysToDelete: DataFrame): Long = {
      val v = LakeTable.deleteMorTagged(spark, root, keysToDelete, tag)
      staged += ((root, v)); v
    }

    /** Copy-on-write [[LakeTable.delete]] as a transaction member. */
    def delete(root: String, keysToDelete: DataFrame): Long = {
      val keys = LakeTable.manifest(spark, root).keys
      val v = LakeTable.rewriteTouched(spark, root,
        keysToDelete.select(keys.map(org.apache.spark.sql.functions.col): _*),
        (cur, del) => LakeTable.keyMembershipJoin(cur, del, keys,
          "left_anti", bcast = false),
        txnTag = tag)
      staged += ((root, v)); v
    }

    /** [[LakeTable.applyChanges]] (upsert + delete, one member version)
      * as a transaction member — a key in both inputs is deleted.
      */
    def applyChanges(root: String, upserts: DataFrame,
        deleteKeys: DataFrame,
        orderCol: Option[String] = None): Long = {
      import org.apache.spark.sql.functions.col
      val keys = LakeTable.manifest(spark, root).keys
      val touch = upserts.select(keys.map(col): _*)
        .unionByName(deleteKeys.select(keys.map(col): _*))
      val v = LakeTable.rewriteTouched(spark, root, touch, (cur, _) =>
        LakeTable.keyMembershipJoin(
          Merge.upsert(cur, upserts, keys, orderCol),
          deleteKeys.select(keys.map(col): _*), keys, "left_anti",
          bcast = false),
        txnTag = tag)
      staged += ((root, v)); v
    }
  }

  /** Run `body`'s member operations atomically. Returns the (table root,
    * published version) pairs on commit; throws [[TxnAbortedException]]
    * if a concurrent writer force-aborted the transaction first, and
    * rethrows the body's own failure after recording `abort` (presumed
    * abort made explicit, so waiting writers unblock immediately).
    *
    * `coordDir` hosts the outcome file — any path all participants can
    * reach (conventionally one of the member tables' roots). Outcome
    * files are never deleted: a deleted outcome would flip its versions
    * back to in-flight ([[LakeTable.txnOutcome]] finality leans on the
    * file's existence), and at ~60 bytes each they are noise.
    */
  def atomically(spark: SparkSession, coordDir: String)(
      body: Txn => Unit): Seq[(String, Long)] = {
    val id = java.util.UUID.randomUUID.toString
    val outcomePath =
      new Path(new Path(coordDir, "_txn"), s"$id.json").toString
    val txn = new Txn(spark, outcomePath)
    try body(txn)
    catch {
      case e: Throwable =>
        // make the presumed abort explicit so blocked writers move now —
        // but never let a failing abort claim (filesystem error) REPLACE
        // the body's own exception: the caller must see what actually
        // broke, and an unrecorded abort only degrades to the presumed
        // abort (waiting writers force-abort after txnWaitMs)
        try LakeTable.claimOutcome(spark, outcomePath, commit = false)
        catch { case claimErr: Throwable => e.addSuppressed(claimErr) }
        throw e
    }
    val committed = LakeTable.claimOutcome(spark, outcomePath, commit = true)
    if (!committed)
      throw new TxnAbortedException(
        s"transaction $id was force-aborted by a concurrent writer " +
          s"before it could commit — nothing became visible (staged: " +
          s"${txn.staged.toSeq})")
    txn.staged.toSeq
  }
}
