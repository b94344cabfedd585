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

  test("maxSim: hand-computed sum-of-best-part-dots; rotation beats pooled dot") {
    // 4-dim vectors, 2 sub-vectors of 2. Query (1,0 | 0,1).
    // doc A = query rotated one sub-vector: (0,1 | 1,0) — a pooled
    // single-dot sees 0, but maxsim matches q1 with A's best part:
    //   max(<(1,0),(0,1)>, <(1,0),(1,0)>) = 1; same for q2 → score 2? no:
    //   q1=(1,0): best of (0,1)->0, (1,0)->1 = 1; q2=(0,1): best of
    //   (0,1)->1, (1,0)->0 = 1 → total 2.0 — local structure survives.
    val docs = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),   // identical to query → 2.0
      (1L, Seq(0f, 1f, 1f, 0f)),   // rotated parts → still 2.0
      (2L, Seq(0.5f, 0f, 0f, 0.5f)), // scaled → 1.0
      (3L, Seq(0f, 0f, 0f, 0f))    // orthogonal → 0.0
    ).toDF("id", "vec")
    val q = docs.filter($"id" === 0L)
    val scored = Retrieval.maxSim(docs, q, "id", "vec", numSubVecs = 2)
    val out = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(0L) shouldBe 2.0 +- 1e-9
    out(1L) shouldBe 2.0 +- 1e-9
    out(2L) shouldBe 1.0 +- 1e-9
    out(3L) shouldBe 0.0 +- 1e-9
    // scale shape: the corpus side streams — query parts broadcast, no
    // corpus shuffle, no sort-merge join anywhere in the final plan
    val plan = scored.queryExecution.executedPlan.toString()
    plan should not include "SortMergeJoin"
    plan should not include "hashpartitioning"
  }

  test("maxSim drops null/indivisible vectors and reduces to full dot at m=1") {
    val docs = Seq(
      (0L, Seq(1f, 2f, 3f)),
      (1L, null.asInstanceOf[Seq[Float]]),
      (2L, Seq(1f, 2f))            // length 2 not divisible by 3 sub-vecs
    ).toDF("id", "vec")
    val q = docs.filter($"id" === 0L)
    val m1 = Retrieval.maxSim(docs.filter($"id" === 0L), q, "id", "vec", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m1(0L) shouldBe (1.0 + 4.0 + 9.0) +- 1e-9
    val m3 = Retrieval.maxSim(docs, q, "id", "vec", 3)
      .collect().map(_.getLong(0)).toSet
    m3 shouldBe Set(0L)            // null and indivisible rows excluded
  }

  test("maxSim validates the query: single row, non-null, dim divisible — loudly") {
    val docs = Seq((0L, Seq(1f, 0f, 0f, 1f)), (1L, Seq(0f, 1f, 1f, 0f)))
      .toDF("id", "vec")
    // multi-row query used to silently score an arbitrary row via limit(1)
    val multi = intercept[IllegalArgumentException] {
      Retrieval.maxSim(docs, docs, "id", "vec", numSubVecs = 2)
    }
    multi.getMessage should include("single row")
    // a query dim not divisible by numSubVecs used to silently mis-slice
    val indiv = intercept[IllegalArgumentException] {
      Retrieval.maxSim(docs, Seq((9L, Seq(1f, 2f, 3f))).toDF("id", "vec"),
        "id", "vec", numSubVecs = 2)
    }
    indiv.getMessage should include("not divisible")
    val nul = intercept[IllegalArgumentException] {
      Retrieval.maxSim(docs,
        Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec"),
        "id", "vec", numSubVecs = 2)
    }
    nul.getMessage should include("NULL")
  }
}
