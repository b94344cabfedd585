package graft

import graft.operators.LinkGraph

class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the uniform fixed point; mass conserved") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)))
    r(1L) shouldBe 0.5 +- 1e-12
    r(2L) shouldBe 0.5 +- 1e-12
    r.values.sum shouldBe 1.0 +- 1e-12
  }

  test("dangling sink keeps total mass at 1 and outranks its source") {
    // 1 -> 2 only: node 2 is dangling, its mass re-spreads uniformly
    val r = ranks(Seq((1L, 2L)))
    r.values.sum shouldBe 1.0 +- 1e-12
    r(2L) should be > r(1L)
    // one hand-checked iteration: d=0.85, N=2, r0=(.5,.5), dangling mass .5
    // r1(1) = .15/2 + .85*(0 + .25) = .2875 ; r1(2) = .15/2 + .85*(.5+.25)
    val one = ranks(Seq((1L, 2L)), iters = 1)
    one(1L) shouldBe 0.2875 +- 1e-12
    one(2L) shouldBe 0.7125 +- 1e-12
  }

  test("multi-edges weight transitions (observed-transition semantics)") {
    // 1 emits 2/3 of its mass to 2 and 1/3 to 3; 2 and 3 cycle back to 1
    val r1 = ranks(Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), iters = 1)
    // after one iteration from uniform 1/3: contrib(2) = (1/3)*(2/3),
    // contrib(3) = (1/3)*(1/3), contrib(1) = 1/3 + 1/3
    r1(2L) shouldBe (0.15 / 3 + 0.85 * (1.0 / 3 * 2 / 3)) +- 1e-12
    r1(3L) shouldBe (0.15 / 3 + 0.85 * (1.0 / 3 / 3)) +- 1e-12
    r1(1L) shouldBe (0.15 / 3 + 0.85 * (2.0 / 3)) +- 1e-12
    r1(2L) should be > r1(3L)
  }

  test("more iterations converge toward the stationary distribution") {
    // star: everything points at 1, 1 points at 2
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
    val r5 = ranks(edges, iters = 5)
    val r20 = ranks(edges, iters = 20)
    r20.values.sum shouldBe 1.0 +- 1e-12
    r20(1L) should be > r20(3L)
    // successive iterates move: |r20 - r5| is small but the ORDERING is stable
    r5(1L) should be > r5(2L)
    r20(1L) should be > r20(2L)
  }
}
