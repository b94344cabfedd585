package graft

/** The scale proof's gate, demonstrated end-to-end: a deliberately
  * quadratic plan (all-pairs theta self-join — `ScaleProof.toyQueries`'
  * `toy_quadratic`) measured at n and 10n must breach the 3.0 warm-ratio
  * bound and fail [[ScaleProof.gateFailures]], while linear ratios and
  * the declared O(table)-contract exemptions pass. This is the proof
  * that SCALEPROOF's green gate is falsifiable — it actually fires on
  * the growth class it exists to catch.
  */
class ScaleGateSpec extends SparkTestBase {

  test("gate declarations: 3.0 default, contract exemptions, 10x-only") {
    ScaleProof.gateFor("q_dedup_minhash")._1 shouldBe 3.0
    ScaleProof.gateFor("q_mv_join")._1 shouldBe 3.0
    // O(table)-by-contract entries carry the linear null hypothesis
    ScaleProof.gateFor("q_lake_zorder")._1 shouldBe 10.0
    ScaleProof.gateFor("q_lake_zorder_incr")._1 shouldBe 10.0
    // only the contract decade is gated; depth probes report ungated
    ScaleProof.gateFailures(30, Map("q_x" -> 99.0)) shouldBe empty
    ScaleProof.gateFailures(100, Map("q_x" -> 99.0)) shouldBe empty
    // linear-with-overhead ratios and in-bound exemptions pass
    ScaleProof.gateFailures(10,
      Map("q_dedup_minhash" -> 2.1, "q_lake_zorder" -> 4.6)) shouldBe empty
    ScaleProof.gateFailures(10, Map("q_lake_zorder" -> 11.0))
      .map(_._1) shouldBe Seq("q_lake_zorder")
  }

  test("a deliberately quadratic plan measurably fails the 10x gate") {
    def gen(n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("scalegate").toString
      spark.range(n).selectExpr("id AS doc_id",
        "repeat('w ', CAST(id % 37 AS INT)) AS text")
        .coalesce(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val base = gen(4000)
    val scaled = gen(40000)
    def warm(dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        ScaleProof.toyQueries("toy_quadratic")(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // cold
      Seq(once(), once()).min
    }
    val (b, s) = (warm(base), warm(scaled))
    val ratio = s / math.max(1e-9, b)
    info(f"toy_quadratic warm: base $b%.2fs scaled $s%.2fs ratio $ratio%.1fx")
    // O(n^2): 10x data = ~100x pairs; even with the base run sitting on
    // the fixed-overhead floor the ratio lands far beyond the bound
    val fails = ScaleProof.gateFailures(10, Map("toy_quadratic" -> ratio))
    fails.map(_._1) shouldBe Seq("toy_quadratic")
    fails.head._3 shouldBe 3.0
  }
}
