package graft

import graft.ops.QualityGateFailure
import graft.pipeline.CoinPipeline
import graft.sinks.LakeSink
import java.nio.file.Files

/** End-to-end pipeline over the reference's own bronze fixture: replays the
  * flagship DAG (EP1) into a temp lake and asserts outputs, gates, sidecars,
  * and re-run idempotency.
  */
class PipelineSpec extends SparkTestBase {

  private val dt = "2026-01-13"

  private def tmpDir(): String =
    Files.createTempDirectory("graft-pipe").toString

  private def bronzeRoot: String = {
    // fixture path ends at .../crypto-lake/bronze/coins/dt=...; the pipeline
    // expects <bronzeRoot>/coins/dt=<ds>.
    fixture("crypto-lake/bronze")
  }

  test("full run publishes silver + gold, passes all gates") {
    val lake  = tmpDir(); val serve = tmpDir()
    val r = CoinPipeline.run(spark, dt, bronzeRoot, lake, serve)
    r.silverRows shouldBe 100
    r.goldRows shouldBe 100
    r.servedGoldRows shouldBe 100

    val silver = spark.read.parquet(s"$lake/silver/coins/dt=$dt")
    silver.count() shouldBe 100
    val gold = spark.read.parquet(s"$lake/gold/coins_daily/dt=$dt")
    gold.columns should contain allOf ("coin_id", "avg_price_usd", "min_price_usd",
      "max_price_usd", "avg_market_cap")

    val sidecar = LakeSink.readSidecar(spark, s"$lake/silver/coins/dt=$dt")
    sidecar.isDefined shouldBe true
    sidecar.get should include(""""row_count": 100""")
    sidecar.get should include(""""schema_version": "v1"""")
  }

  test("optional file-configured checkpoint gates silver in the flagship run") {
    val lake = tmpDir(); val serve = tmpDir()
    // a silver-compatible suite passes the run end to end
    val ok = CoinPipeline.run(spark, dt, bronzeRoot, lake, serve,
      checkpointPath = Some(fixture("checkpoints/silver_checkpoint.json")))
    ok.silverRows shouldBe 100
    // the day-10 COIN checkpoint expects market_cap int — silver carries
    // double, so the file-configured gate must block the publish
    val lake2 = tmpDir(); val serve2 = tmpDir()
    an[graft.expectations.SuiteFailure] should be thrownBy
      CoinPipeline.run(spark, dt, bronzeRoot, lake2, serve2,
        checkpointPath = Some(fixture("checkpoints/coin_checkpoint.json")))
    new java.io.File(s"$lake2/silver/coins/dt=$dt").exists() shouldBe false
  }

  test("re-running the same day is idempotent (upsert, not append)") {
    val lake  = tmpDir(); val serve = tmpDir()
    val r1 = CoinPipeline.run(spark, dt, bronzeRoot, lake, serve)
    val r2 = CoinPipeline.run(spark, dt, bronzeRoot, lake, serve)
    r2.servedGoldRows shouldBe r1.servedGoldRows
    spark.read.parquet(s"$serve/gold_coin_daily_metrics").count() shouldBe 100
  }

  test("two days accumulate in the serving table on distinct (dt, coin_id)") {
    val lake  = tmpDir(); val serve = tmpDir()
    CoinPipeline.run(spark, "2026-01-13", bronzeRoot, lake, serve)
    CoinPipeline.run(spark, "2026-01-10", bronzeRoot, lake, serve)
    spark.read.parquet(s"$serve/gold_coin_daily_metrics").count() shouldBe 200
  }

  test("SLA gate: scheduled run past the deadline fails; manual run skips") {
    val late = java.time.Instant.parse("2026-01-14T10:00:00Z")
    intercept[QualityGateFailure] {
      graft.ops.CoinOps.assertSla(java.time.LocalDate.parse(dt), late, scheduled = true)
    }
    graft.ops.CoinOps.assertSla(java.time.LocalDate.parse(dt), late, scheduled = false)
  }

  test("freshness gate fails on a missing partition") {
    intercept[QualityGateFailure] {
      graft.ops.CoinOps.assertFreshness(spark, s"${tmpDir()}/gold/coins_daily/dt=2099-01-01")
    }
  }
}
