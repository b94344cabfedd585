package graft

import graft.sinks.{LakeTable, MaterializedView}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit-time recorded change feeds (`cdfRecord` tables): every span a
  * recorded table serves must be VALUE-IDENTICAL to the snapshot diff an
  * unrecorded twin derives for the same op history — the recorded path
  * is an access-path optimization, never a semantic fork. Covers
  * single-step passthrough, multi-step netting (insert→delete cancels,
  * update chains collapse to endpoints), maintenance recorded-empty,
  * deleteMor/crash-lost-marker fallback, additive widening, NULL keys,
  * and vacuum retention of feed data.
  */
class CdfRecordedSpec extends SparkTestBase {
  import spark.implicits._

  private def newRoot() =
    java.nio.file.Files.createTempDirectory("cdfrec").toString

  private val base = Seq(
    (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)
  ).toDF("id", "name", "score")

  private def feedSet(df: DataFrame): Set[(Long, String, Double, String)] =
    df.select($"id", $"name", $"score", $"_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSet

  test("single-step feed: recorded passthrough equals the snapshot diff") {
    val rec = newRoot(); val twin = newRoot()
    LakeTable.init(base, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    LakeTable.init(base, twin, Seq("id"), numBuckets = 2)
    val delta = Seq((2L, "B!", 20.0), (9L, "i", 9.0), (3L, "c", 3.0))
      .toDF("id", "name", "score") // one update, one insert, one no-op
    LakeTable.merge(spark, rec, delta)
    LakeTable.merge(spark, twin, delta)
    val got = feedSet(LakeTable.changes(spark, rec, 0L, 1L))
    LakeTable.lastChangesRecorded shouldBe Some(true)
    val want = feedSet(LakeTable.changes(spark, twin, 0L, 1L))
    LakeTable.lastChangesRecorded shouldBe Some(false)
    got shouldBe want
    got shouldBe Set(
      (2L, "b", 2.0, "update_preimage"), (2L, "B!", 20.0, "update_postimage"),
      (9L, "i", 9.0, "insert"))
    // the re-merge of an identical row (3L) emitted nothing on either path
  }

  test("an aborted transaction's recorded feed is excluded by LIVENESS, span stays recorded") {
    val rec = newRoot()
    // heavy base: the cost gate compares summed feed bytes against the
    // hot snapshot sides — delivery-sized feeds must actually be the
    // cheaper read for the recorded path to serve (at a 4-row toy scale
    // the gate legitimately picks the diff)
    val heavy = spark.range(2000).select(col("id"),
      concat(lit("n"), col("id")).alias("name"),
      (col("id") % 97).cast("double").alias("score"))
    LakeTable.init(heavy, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    LakeTable.merge(spark, rec,
      Seq((9010L, "j", 10.0)).toDF("id", "name", "score")) // v1, recorded
    // a txn member on a cdfRecord table writes its feed AT PUBLISH — the
    // abort must not leak it into the span (exclusion is by liveness,
    // not by marker absence)
    val outcome = s"$rec/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, rec,
      Seq((1L, "POISON", -1.0)).toDF("id", "name", "score"),
      None, Some(outcome)) // slot 2, dead after:
    LakeTable.claimOutcome(spark, outcome, commit = false) shouldBe false
    LakeTable.merge(spark, rec,
      Seq((9011L, "k", 11.0)).toDF("id", "name", "score")) // slot 3, recorded
    val got = feedSet(LakeTable.changes(spark, rec, 0L, 3L))
    // all LIVE steps carry feeds and they undercut the hot snapshot
    // sides, so the recorded path serves the span
    LakeTable.lastChangesRecorded shouldBe Some(true)
    got shouldBe Set((9010L, "j", 10.0, "insert"),
      (9011L, "k", 11.0, "insert"))
    // and a COMMITTED txn member's feed is served like any other step
    val outcome2 = s"$rec/_txn/${java.util.UUID.randomUUID}.json"
    LakeTable.mergeTagged(spark, rec,
      Seq((9012L, "l", 12.0)).toDF("id", "name", "score"), None,
      Some(outcome2))
    LakeTable.claimOutcome(spark, outcome2, commit = true) shouldBe true
    val got2 = feedSet(LakeTable.changes(spark, rec, 3L,
      LakeTable.manifest(spark, rec).version))
    LakeTable.lastChangesRecorded shouldBe Some(true)
    got2 shouldBe Set((9012L, "l", 12.0, "insert"))
  }

  test("multi-step netting: churn cancels, update chains collapse to endpoints") {
    val rec = newRoot(); val twin = newRoot()
    // filler rows make the snapshot sides decisively heavier than the
    // delivery-sized feeds, so the multi-step COST GATE picks the
    // recorded path deterministically (tiny-table byte counts are
    // parquet-overhead noise)
    val filler = spark.range(10000, 12000).select($"id",
      concat(lit("f"), lpad($"id".cast("string"), 100, "x")).alias("name"),
      lit(0.0).alias("score"))
    val big = base.unionByName(filler)
    LakeTable.init(big, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    LakeTable.init(big, twin, Seq("id"), numBuckets = 2)
    def both(f: String => Unit): Unit = { f(rec); f(twin) }
    both(r => LakeTable.merge(spark, r,
      Seq((9L, "i", 9.0), (2L, "B1", 21.0)).toDF("id", "name", "score")))
    both(r => LakeTable.merge(spark, r,
      Seq((9L, "i2", 9.5), (2L, "B2", 22.0)).toDF("id", "name", "score")))
    both(r => LakeTable.delete(spark, r, Seq(9L, 1L).toDF("id")))
    val vEnd = LakeTable.manifest(spark, rec).version
    val got = feedSet(LakeTable.changes(spark, rec, 0L, vEnd))
    LakeTable.lastChangesRecorded shouldBe Some(true)
    val want = feedSet(LakeTable.changes(spark, twin, 0L, vEnd))
    got shouldBe want
    // 9 inserted then deleted: nets to NOTHING; 2 updated twice: one
    // update with the FIRST pre-image and the LAST post-image; 1 deleted
    got shouldBe Set(
      (2L, "b", 2.0, "update_preimage"), (2L, "B2", 22.0, "update_postimage"),
      (1L, "a", 1.0, "delete"))
    // sub-spans net independently
    feedSet(LakeTable.changes(spark, rec, 1L, 2L)) shouldBe
      feedSet(LakeTable.changes(spark, twin, 1L, 2L))
  }

  test("maintenance commits record EMPTY feeds; the span stays recorded") {
    val rec = newRoot()
    val grid = spark.range(256).select(col("id"),
      (col("id") % 16).alias("x"), (col("id") % 7).alias("y"))
    LakeTable.init(grid, rec, Seq("id"), numBuckets = 2,
      statsCols = Seq("x", "y"), maxRecordsPerFile = 64L,
      cdfRecord = true)
    LakeTable.merge(spark, rec, spark.range(256, 260).select(col("id"),
      (col("id") % 16).alias("x"), (col("id") % 7).alias("y")))
    val vMerge = LakeTable.manifest(spark, rec).version
    LakeTable.optimizeZOrder(spark, rec, Seq("x", "y"))
    LakeTable.compactSmallFiles(spark, rec, maxFilesPerBucket = 1)
    LakeTable.rebucket(spark, rec, 3)
    LakeTable.alterIndexing(spark, rec, statsCols = Seq("x"))
    val vEnd = LakeTable.manifest(spark, rec).version
    // maintenance-only span: recorded, empty, nothing read
    LakeTable.changes(spark, rec, vMerge, vEnd).count() shouldBe 0L
    LakeTable.lastChangesRecorded shouldBe Some(true)
    // span including the merge: the merge's rows, nothing else — and the
    // REBUCKET inside the span does not force the full-diff fallback
    // (recorded feeds are layout-independent)
    val feed = LakeTable.changes(spark, rec, 0L, vEnd)
    LakeTable.lastChangesRecorded shouldBe Some(true)
    feed.select($"id").as[Long].collect().toSet shouldBe
      Set(256L, 257L, 258L, 259L)
  }

  test("deleteMor and a crash-lost marker degrade the span to the snapshot diff") {
    val rec = newRoot()
    LakeTable.init(base, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    LakeTable.merge(spark, rec,
      Seq((9L, "i", 9.0)).toDF("id", "name", "score"))
    LakeTable.deleteMor(spark, rec, Seq(1L).toDF("id"))
    val v2 = LakeTable.manifest(spark, rec).version
    val f1 = feedSet(LakeTable.changes(spark, rec, 0L, v2))
    LakeTable.lastChangesRecorded shouldBe Some(false) // deleteMor step
    f1 shouldBe Set((9L, "i", 9.0, "insert"), (1L, "a", 1.0, "delete"))
    // compaction folds the vector and records empty; the tail span is
    // recorded again
    LakeTable.compactDeletes(spark, rec)
    val v3 = LakeTable.manifest(spark, rec).version
    LakeTable.changes(spark, rec, v2, v3).count() shouldBe 0L
    LakeTable.lastChangesRecorded shouldBe Some(true)
    // crash between publish and marker: kill v1's marker — the span falls
    // back and still serves the same rows
    val fs = new Path(rec).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(rec, "_cdf/1.json"), false) shouldBe true
    feedSet(LakeTable.changes(spark, rec, 0L, v2)) shouldBe f1
    LakeTable.lastChangesRecorded shouldBe Some(false)
  }

  test("additive widening inside a recorded span projects old feeds with NULLs") {
    val rec = newRoot(); val twin = newRoot()
    // filler keeps the cost gate on the recorded path (see netting test)
    val filler = spark.range(10000, 12000).select($"id",
      concat(lit("f"), lpad($"id".cast("string"), 100, "x")).alias("name"),
      lit(0.0).alias("score"))
    val wide = base.unionByName(filler)
    LakeTable.init(wide, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    LakeTable.init(wide, twin, Seq("id"), numBuckets = 2)
    def both(f: String => Unit): Unit = { f(rec); f(twin) }
    both(r => LakeTable.merge(spark, r,
      Seq((9L, "i", 9.0)).toDF("id", "name", "score")))
    both(r => LakeTable.merge(spark, r,
      Seq((10L, "j", 10.0, "X")).toDF("id", "name", "score", "tag")))
    val vEnd = LakeTable.manifest(spark, rec).version
    def tagged(root: String) = LakeTable.changes(spark, root, 0L, vEnd)
      .select($"id", $"tag", $"_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    val got = tagged(rec)
    LakeTable.lastChangesRecorded shouldBe Some(true)
    got shouldBe tagged(twin)
    got shouldBe Set((9L, None, "insert"), (10L, Some("X"), "insert"))
  }

  test("NULL keys classify as one row on both paths, never a phantom delete+insert") {
    val rec = newRoot(); val twin = newRoot()
    val withNull = base.unionByName(
      Seq((Option.empty[Long], "n", 0.0)).toDF("id", "name", "score"))
    LakeTable.init(withNull, rec, Seq("id"), numBuckets = 2,
      cdfRecord = true)
    LakeTable.init(withNull, twin, Seq("id"), numBuckets = 2)
    val delta = Seq((Option.empty[Long], "N!", 0.5))
      .toDF("id", "name", "score")
    LakeTable.merge(spark, rec, delta)
    LakeTable.merge(spark, twin, delta)
    def types(root: String) = LakeTable.changes(spark, root, 0L, 1L)
      .select($"_change_type").as[String].collect().sorted.toSeq
    types(rec) shouldBe Seq("update_postimage", "update_preimage")
    types(twin) shouldBe Seq("update_postimage", "update_preimage")
  }

  test("vacuum drops unreferenced feed data, keeps the retained span recorded") {
    val rec = newRoot()
    LakeTable.init(base, rec, Seq("id"), numBuckets = 2, cdfRecord = true)
    for (i <- 1 to 4)
      LakeTable.merge(spark, rec,
        Seq((100L + i, s"d$i", i * 1.0)).toDF("id", "name", "score"))
    val vEnd = LakeTable.manifest(spark, rec).version
    LakeTable.vacuum(spark, rec, keepLast = 2)
    val fs = new Path(rec).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // dropped versions' markers gone, feed data of kept markers intact
    fs.exists(new Path(rec, "_cdf/1.json")) shouldBe false
    fs.exists(new Path(rec, s"_cdf/$vEnd.json")) shouldBe true
    feedSet(LakeTable.changes(spark, rec, vEnd - 1, vEnd)) shouldBe
      Set((104L, "d4", 4.0, "insert"))
    LakeTable.lastChangesRecorded shouldBe Some(true)
    // orphan feed debris (a crash before publish) is reclaimed
    val orphan = new Path(rec, "_cdf/data/deadbeef-orphan")
    fs.mkdirs(orphan)
    LakeTable.vacuum(spark, rec, keepLast = 2)
    fs.exists(orphan) shouldBe false
  }

  test("alterCdfRecord: recording starts at the toggle, pre-toggle spans fall back") {
    val rec = newRoot()
    LakeTable.init(base, rec, Seq("id"), numBuckets = 2)
    LakeTable.merge(spark, rec,
      Seq((9L, "i", 9.0)).toDF("id", "name", "score")) // v1, unrecorded
    val vOn = LakeTable.alterCdfRecord(spark, rec, enabled = true) // v2
    LakeTable.manifest(spark, rec).cdfRecord shouldBe true
    // idempotent: same state publishes nothing
    LakeTable.alterCdfRecord(spark, rec, enabled = true) shouldBe vOn
    LakeTable.merge(spark, rec,
      Seq((10L, "j", 10.0)).toDF("id", "name", "score")) // v3, recorded
    // post-toggle span (v2..v3) is fully recorded: toggle = empty feed
    feedSet(LakeTable.changes(spark, rec, vOn - 1, vOn + 1)) shouldBe
      Set((10L, "j", 10.0, "insert"))
    LakeTable.lastChangesRecorded shouldBe Some(true)
    // a span reaching before the toggle has an unrecorded step: fallback
    feedSet(LakeTable.changes(spark, rec, 0L, vOn + 1)) shouldBe
      Set((9L, "i", 9.0, "insert"), (10L, "j", 10.0, "insert"))
    LakeTable.lastChangesRecorded shouldBe Some(false)
    // disable: the next commit records nothing
    LakeTable.alterCdfRecord(spark, rec, enabled = false)
    LakeTable.merge(spark, rec,
      Seq((11L, "k", 11.0)).toDF("id", "name", "score"))
    val vEnd = LakeTable.manifest(spark, rec).version
    LakeTable.readCdfMarker(spark, rec, vEnd) shouldBe None
    feedSet(LakeTable.changes(spark, rec, vEnd - 1, vEnd)) shouldBe
      Set((11L, "k", 11.0, "insert"))
    LakeTable.lastChangesRecorded shouldBe Some(false)
  }

  test("an MV over a recorded table refreshes from the feed files") {
    val rec = newRoot(); val mvRoot = newRoot()
    val withGrp = base.withColumn("grp", ($"id" % 2).cast("string"))
    LakeTable.init(withGrp, rec, Seq("id"), numBuckets = 2,
      cdfRecord = true)
    MaterializedView.init(spark, rec, mvRoot, Seq("grp"), Seq("score"))
    LakeTable.merge(spark, rec, Seq((9L, "i", 9.0), (2L, "b", 20.0))
      .toDF("id", "name", "score")
      .withColumn("grp", ($"id" % 2).cast("string")))
    MaterializedView.refresh(spark, rec, mvRoot)
    LakeTable.lastChangesRecorded shouldBe Some(true)
    val got = MaterializedView.read(spark, mvRoot)
      .select($"grp", $"cnt", $"sum_score".cast("double")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe Map("0" -> ((2L, 24.0)), "1" -> ((3L, 13.0)))
  }
}
