package graft

import graft.sinks.{LakeTable, LakeTxn}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Cross-table atomic transactions (sinks/LakeTxn.scala): member versions
  * are invisible until ONE outcome-file create flips them all live;
  * presumed abort on crash; force-abort by blocked writers; the exclusive
  * outcome claim decides every race exactly once.
  */
class LakeTxnSpec extends SparkTestBase {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def mkTable(prefix: String, n: Int, tag: String): String = {
    val root = Files.createTempDirectory(s"graft-txn-$prefix").toString
    LakeTable.init(spark.range(n.toLong).select(col("id").alias("k"),
      concat(lit(tag), col("id")).alias("v")), root, Seq("k"), numBuckets = 2)
    root
  }
  private def keysOf(root: String): Set[Long] =
    LakeTable.read(spark, root).select($"k").as[Long].collect().toSet

  test("both tables flip visible together; neither is visible before the outcome") {
    val a = mkTable("a", 10, "a")
    val b = mkTable("b", 10, "b")
    var midA: Set[Long] = null
    var midB: Set[Long] = null
    val staged = LakeTxn.atomically(spark, a) { txn =>
      txn.merge(a, Seq((100L, "a100")).toDF("k", "v"))
      txn.merge(b, Seq((200L, "b200")).toDF("k", "v"))
      // in the window after both member publishes, readers still see the
      // pre-transaction heads of BOTH tables
      midA = keysOf(a); midB = keysOf(b)
    }
    midA should not contain 100L
    midB should not contain 200L
    keysOf(a) should contain(100L)
    keysOf(b) should contain(200L)
    staged.map(_._1).toSet shouldBe Set(a, b)
  }

  test("a failing body records abort: nothing visible, table immediately writable") {
    val a = mkTable("fail", 10, "a")
    val boom = intercept[RuntimeException] {
      LakeTxn.atomically(spark, a) { txn =>
        txn.merge(a, Seq((100L, "a100")).toDF("k", "v"))
        sys.error("body failed after staging")
      }
    }
    boom.getMessage should include("body failed")
    keysOf(a) should not contain 100L
    // the explicit abort unblocks writers with no wait at all
    LakeTable.merge(spark, a, Seq((7L, "patched")).toDF("k", "v"))
    keysOf(a) should not contain 100L
    LakeTable.read(spark, a).filter($"k" === 7L).select($"v")
      .as[String].head() shouldBe "patched"
  }

  test("crash before outcome = presumed abort; a blocked writer force-aborts and proceeds") {
    val a = mkTable("crash", 10, "a")
    // a transaction that published its member and then DIED: a tagged
    // manifest whose outcome file never appears
    val orphanOutcome = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((100L, "ghost")).toDF("k", "v"), None, Some(orphanOutcome))
    keysOf(a) should not contain 100L // invisible
    hconf.setLong("graft.lake.txnWaitMs", 150L)
    try {
      LakeTable.merge(spark, a, Seq((8L, "late")).toDF("k", "v"))
    } finally hconf.unset("graft.lake.txnWaitMs")
    // the writer waited out the ghost, force-aborted it, and landed
    keysOf(a) should not contain 100L
    LakeTable.read(spark, a).filter($"k" === 8L).select($"v")
      .as[String].head() shouldBe "late"
    // the force-abort is FINAL: a late commit of the ghost loses
    LakeTable.claimOutcome(spark, orphanOutcome, commit = true) shouldBe false
    keysOf(a) should not contain 100L
  }

  test("a late commit that wins the outcome race makes the blocked writer rebase") {
    val a = mkTable("race", 10, "a")
    val outcome = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((100L, "txnrow")).toDF("k", "v"), None, Some(outcome))
    // the transaction commits before any writer times out
    LakeTable.claimOutcome(spark, outcome, commit = true) shouldBe true
    LakeTable.merge(spark, a, Seq((9L, "after")).toDF("k", "v"))
    // both deltas present: the writer rebased onto the committed txn head
    keysOf(a) should contain allOf (100L, 9L)
  }

  test("atomically throws TxnAbortedException when force-aborted first, and nothing lands") {
    val a = mkTable("loser", 10, "a")
    intercept[LakeTxn.TxnAbortedException] {
      LakeTxn.atomically(spark, a) { txn =>
        txn.merge(a, Seq((100L, "doomed")).toDF("k", "v"))
        // a concurrent writer decides abort before our commit claim
        val tagged = LakeTable.manifestAt(spark, a,
          LakeTable.versions(
            new org.apache.hadoop.fs.Path(a).getFileSystem(hconf), a).max)
        LakeTable.claimOutcome(spark, tagged.txn.get, commit = false)
      }
    }
    keysOf(a) should not contain 100L
  }

  test("multi-op transaction on one table chains its own staged versions") {
    val a = mkTable("chain", 10, "a")
    LakeTxn.atomically(spark, a) { txn =>
      txn.merge(a, Seq((100L, "first")).toDF("k", "v"))
      txn.merge(a, Seq((100L, "second"), (101L, "also")).toDF("k", "v"))
      txn.deleteMor(a, Seq(3L).toDF("k"))
      keysOf(a) should contain(3L) // still invisible mid-transaction
    }
    val m = LakeTable.read(spark, a)
    m.filter($"k" === 100L).select($"v").as[String].head() shouldBe "second"
    keysOf(a) should contain(101L)
    keysOf(a) should not contain 3L
  }

  test("the full delivery surface is transactional: delete and applyChanges members") {
    val a = mkTable("surface", 20, "a")
    val b = mkTable("surface2", 20, "b")
    LakeTxn.atomically(spark, a) { txn =>
      txn.delete(a, Seq(1L, 2L).toDF("k"))
      txn.applyChanges(b,
        upserts = Seq((3L, "b3x"), (300L, "new")).toDF("k", "v"),
        deleteKeys = Seq(4L, 300L).toDF("k")) // key in both = deleted
      // still invisible mid-transaction on both tables
      keysOf(a) should contain(1L)
      keysOf(b) should contain(4L)
    }
    keysOf(a) should not contain 1L
    keysOf(a) should not contain 2L
    keysOf(b) should not contain 4L
    keysOf(b) should not contain 300L
    LakeTable.read(spark, b).filter($"k" === 3L).select($"v")
      .as[String].head() shouldBe "b3x"
  }

  test("history reports every slot's state: committed, aborted, in-flight") {
    val a = mkTable("hist", 10, "a")                        // slot 0
    LakeTable.merge(spark, a, Seq((50L, "x")).toDF("k", "v")) // slot 1
    val dead = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((60L, "d")).toDF("k", "v"), None, Some(dead))     // slot 2
    LakeTable.claimOutcome(spark, dead, commit = false)
    val committed = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((70L, "c")).toDF("k", "v"), None, Some(committed)) // slot 3
    LakeTable.claimOutcome(spark, committed, commit = true)
    LakeTable.mergeTagged(spark, a,
      Seq((80L, "g")).toDF("k", "v"), None,
      Some(s"$a/_txn/${java.util.UUID.randomUUID}.json"))   // slot 4, ghost
    val h = LakeTable.history(spark, a)
    h.map(_.version) shouldBe Seq(4L, 3L, 2L, 1L, 0L)       // newest first
    h.map(_.state) shouldBe
      Seq("in-flight", "committed", "aborted", "committed", "committed")
    h.map(_.tsMillis).forall(_ > 0L) shouldBe true
    h.last.files should be > 0
    // the in-flight and aborted slots carry their outcome paths
    h.head.txn shouldBe defined
    h(2).txn shouldBe Some(dead)
  }

  test("vacuum reclaims aborted slots; history, changes and new commits stay sound") {
    val a = mkTable("vac", 20, "a")
    LakeTable.merge(spark, a, Seq((50L, "live1")).toDF("k", "v")) // v1
    val outcome = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((60L, "dead")).toDF("k", "v"), None, Some(outcome)) // slot 2
    LakeTable.claimOutcome(spark, outcome, commit = false) shouldBe false
    LakeTable.merge(spark, a, Seq((70L, "live2")).toDF("k", "v")) // slot 3
    keysOf(a) should contain allOf (50L, 70L)
    keysOf(a) should not contain 60L
    // span over the dead slot: only live deltas appear
    val ch = LakeTable.changes(spark, a, 0L, 3L)
      .select($"k", $"_change_type").as[(Long, String)].collect().toSet
    ch shouldBe Set((50L, "insert"), (70L, "insert"))
    // the dead slot is not time-travelable
    intercept[IllegalArgumentException] {
      LakeTable.read(spark, a, Some(2L)).collect()
    }
    LakeTable.vacuum(spark, a, keepLast = 10)
    LakeTable.fsck(spark, a).ok shouldBe true
    keysOf(a) should contain allOf (50L, 70L)
    // the reclaimed slot number is NOT reused by the next commit
    val v = LakeTable.merge(spark, a, Seq((80L, "live3")).toDF("k", "v"))
    v should be > 3L
  }

  test("vacuum(1) right after a force-abort keeps the live head — the table survives") {
    val a = mkTable("vacab", 20, "a")                              // slot 0
    LakeTable.merge(spark, a, Seq((50L, "live")).toDF("k", "v"))   // slot 1
    val outcome = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((60L, "dead")).toDF("k", "v"), None, Some(outcome))      // slot 2
    LakeTable.claimOutcome(spark, outcome, commit = false)
    // keepLast counts LIVE slots: the newest keepLast slots being all
    // aborted must never empty the keep set and sweep the committed table
    LakeTable.vacuum(spark, a, keepLast = 1)
    LakeTable.fsck(spark, a).ok shouldBe true
    keysOf(a) should contain(50L)
    keysOf(a) should not contain 60L
    LakeTable.read(spark, a).count() shouldBe 21L
  }

  test("vacuum(1) under an in-flight top slot protects the committed head below it") {
    val a = mkTable("vacif", 20, "a")                              // slot 0
    LakeTable.merge(spark, a, Seq((50L, "live")).toDF("k", "v"))   // slot 1
    val outcome = s"$a/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, a,
      Seq((60L, "maybe")).toDF("k", "v"), None, Some(outcome))     // slot 2
    LakeTable.vacuum(spark, a, keepLast = 1)
    // the committed head (slot 1) is the newest LIVE slot: its manifest
    // and its touched-bucket pre-image files stay — if the transaction
    // then aborts, the table still has a committed version
    LakeTable.claimOutcome(spark, outcome, commit = false)
    LakeTable.fsck(spark, a).ok shouldBe true
    keysOf(a) should contain(50L)
    keysOf(a) should not contain 60L
  }

  test("a failing abort claim never masks the body's own exception (suppressed instead)") {
    val a = mkTable("mask", 5, "a")
    // block the outcome directory with a FILE so the abort claim's own
    // filesystem write fails
    val txnDir = new java.io.File(a, "_txn")
    java.nio.file.Files.write(txnDir.toPath, Array[Byte](1))
    val boom = intercept[RuntimeException] {
      LakeTxn.atomically(spark, a) { _ => sys.error("body broke first") }
    }
    boom.getMessage should include("body broke first")
    boom.getSuppressed should not be empty
  }
}
