package graft

import graft.sources.CoinSources
import org.apache.spark.sql.functions._

class CoinMarketsSourceSpec extends SparkTestBase {

  private lazy val fixtureFile =
    fixture("crypto-lake/bronze/coins/dt=2026-01-13") + "/coin_raw.json"

  test("DSv2 coin-markets source reads the REST payload shape") {
    val df = spark.read.format("coin-markets").option("path", fixtureFile).load()
    df.count() shouldBe 100
    df.columns.length shouldBe 26
    df.filter(col("id").isNull).count() shouldBe 0
  }

  test("DSv2 source agrees with the bronze JSON reader row-for-row") {
    val v2 = spark.read.format("coin-markets").option("path", fixtureFile).load()
    val v1 = CoinSources.readBronzeJson(spark, fixtureFile)
    // roi is a NaN-bearing struct; compare on scalar columns.
    val cols = Seq("id", "symbol", "name", "current_price", "market_cap", "last_updated")
      .map(col)
    v2.select(cols: _*).except(v1.select(cols: _*)).count() shouldBe 0
    v1.select(cols: _*).except(v2.select(cols: _*)).count() shouldBe 0
  }

  test("DSv2 source plans as a local scan (no executor round-trip)") {
    val df = spark.read.format("coin-markets").option("path", fixtureFile).load()
    df.queryExecution.executedPlan.toString() should include("LocalTableScan")
  }

  test("missing path/url fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("coin-markets").load().collect()
    }
    e.getMessage should include("path")
  }
}
