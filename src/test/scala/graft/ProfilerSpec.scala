package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("profiles nulls, distincts, and min/max per column in one pass") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val out = Profiler.profile(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    out("k") shouldBe ((4L, 1L, 2L, "1", "2"))
    out("s") shouldBe ((4L, 1L, 2L, "a", "b"))

    // ONE scan feeds the whole profile, however many columns
    val fromParquet = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Profiler.profile(fromParquet,
      Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
      .queryExecution.executedPlan.toString
    "Scan parquet".r.findAllIn(plan).size shouldBe 1
  }

  test("unknown columns are rejected by name") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val e = the[IllegalArgumentException] thrownBy Profiler.profile(df, Seq("k", "nope"))
    e.getMessage should include("nope")
    an[IllegalArgumentException] should be thrownBy Profiler.profile(df, Seq("k", "k"))
  }

  test("column names containing dots profile correctly") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a.b", "c")
    val out = Profiler.profile(df)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    out("a.b") shouldBe 2L
    out("c") shouldBe 2L
  }

  test("corpus card reports size, tokens, spread, and exact-dup rate in one row") {
    import spark.implicits._
    val docs = Seq(
      ("one two three", "en", "web"),
      ("one two three", "en", "books"),      // exact dup (different source)
      ("  ONE TWO THREE  ", "en", "web"),    // normalized dup
      ("four five", "de", "web"),
      (null.asInstanceOf[String], "de", "web")
    ).toDF("text", "lang", "source")
    val r = Profiler.corpusCard(docs).head()
    r.getAs[Long]("n_docs") shouldBe 5L
    r.getAs[Long]("n_null_text") shouldBe 1L
    r.getAs[Long]("n_tokens") shouldBe 3L + 3L + 3L + 2L + 0L
    r.getAs[Long]("n_langs") shouldBe 2L
    r.getAs[Long]("n_sources") shouldBe 2L
    // 5 rows, 3 distinct fingerprints ("one two three", "four five", "")
    r.getAs[Double]("dup_rate") shouldBe 1.0 - 3.0 / 5 +- 1e-9
    r.getAs[Double]("p50_tokens") shouldBe 3.0 +- 1e-9
  }
}
