package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed and survives column reorder") {
    val old = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), Some(30L)), (4L, None: Option[String], Some(40L))
    ).toDF("id", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),                 // unchanged
      (2L, Some("B!"), Some(20L)),                // changed
      (4L, Some("now-set"), Some(40L)),           // null -> value = changed
      (5L, Some("e"), Some(50L))                  // added
    ).toDF("id", "s", "v")                        // 3 removed

    val out = Diff.snapshotDiff(old, neu, Seq("id"))
      .select($"id", $"change").as[(Long, String)].collect().toMap
    out shouldBe Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added")

    // unchanged rows appear only when asked
    val all = Diff.snapshotDiff(old, neu, Seq("id"), includeUnchanged = true)
      .select($"id", $"change").as[(Long, String)].collect().toMap
    all(1L) shouldBe "unchanged"

    // hash is column-ORDER independent (name-sorted) but value-position
    // sensitive: swapping two column's VALUES must not collide
    val reordered = neu.select($"v", $"id", $"s")
    Diff.snapshotDiff(old, reordered, Seq("id"))
      .select($"id", $"change").as[(Long, String)].collect().toMap shouldBe out
    val swapped = Seq((1L, Some("10"), Some("a"))).toDF("id", "s", "v2")
    an[IllegalArgumentException] should be thrownBy
      Diff.snapshotDiff(old, swapped, Seq("id")) // schema mismatch is loud

    an[IllegalArgumentException] should be thrownBy
      Diff.snapshotDiff(old, neu, Seq("nope"))
    an[IllegalArgumentException] should be thrownBy
      Diff.snapshotDiff(old.select($"id"), neu.select($"id"), Seq("id"))
  }
}
