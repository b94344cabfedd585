package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("rrfFuse sums 1/(k+rank) across rankers and counts contributors") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val sem = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), "id", k = 60)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    out(10L)._1 shouldBe (1.0 / 61 + 1.0 / 62) +- 1e-12
    out(20L)._1 shouldBe (1.0 / 62 + 1.0 / 61) +- 1e-12
    out(30L)._1 shouldBe 1.0 / 63 +- 1e-12
    out(40L)._1 shouldBe 1.0 / 63 +- 1e-12
    out(10L)._2 shouldBe 2L
    out(30L)._2 shouldBe 1L
    // a doc in both rankers at the same ranks scores identically either way
    out(10L)._1 shouldBe out(20L)._1 +- 1e-15
  }

  test("single ranking degrades to 1/(k+rank); k=0 allowed") {
    val r = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(r), "id", k = 0)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    out(1L) shouldBe 1.0 +- 1e-12
    out(2L) shouldBe 0.5 +- 1e-12
  }
}
