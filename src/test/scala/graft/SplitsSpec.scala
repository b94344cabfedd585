package graft

import graft.operators.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  test("split assignment is content-stable, complete, and near the weights") {
    val docs = spark.range(20000).select($"id".alias("doc_id"))
    val out = Splits.assignSplit(docs, "doc_id")
    val counts = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    counts.values.sum shouldBe 20000L
    counts.keySet shouldBe Set("train", "val", "test")
    counts("train").toDouble / 20000 shouldBe 0.9 +- 0.02
    counts("val").toDouble / 20000 shouldBe 0.05 +- 0.01
    counts("test").toDouble / 20000 shouldBe 0.05 +- 0.01

    // repartitioning must not move a single row between splits
    val a = out.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = Splits.assignSplit(docs.repartition(17), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    b shouldBe a

    // growing the corpus never reassigns existing ids
    val grown = Splits.assignSplit(
      spark.range(40000).select($"id".alias("doc_id")), "doc_id")
      .filter($"doc_id" < 20000)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    grown shouldBe a
  }

  test("custom weights validate and the last split absorbs the remainder") {
    val docs = spark.range(1000).select($"id".alias("doc_id"))
    val out = Splits.assignSplit(docs, "doc_id", Seq("a" -> 1.0, "b" -> 3.0))
    val counts = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    counts("a").toDouble / 1000 shouldBe 0.25 +- 0.05
    counts("b").toDouble / 1000 shouldBe 0.75 +- 0.05
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 1.0, "a" -> 1.0))
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 0.0))
    // a weight too small to own a bucket must be rejected, not silently empty
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 0.99999, "b" -> 0.00001))
  }
}
