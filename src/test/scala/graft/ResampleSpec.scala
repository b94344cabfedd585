package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("ohlc bars: hand-computed candles, deterministic tie-break, null rows dropped") {
    val ticks = Seq(
      // bar 10:00 — ts TIE at 10:00:05: ids 2 vs 3, open must be id 2's
      // price; close ties at 10:59:59: ids 5 vs 4 -> id 5 wins (max id)
      (2L, ts("2024-01-01 10:00:05"), "BTC", 100.0, 10L),
      (3L, ts("2024-01-01 10:00:05"), "BTC", 101.0, 5L),
      (1L, ts("2024-01-01 10:30:00"), "BTC", 90.0, 20L),
      (4L, ts("2024-01-01 10:59:59"), "BTC", 120.0, 1L),
      (5L, ts("2024-01-01 10:59:59"), "BTC", 119.0, 2L),
      // bar 11:00 — single tick
      (6L, ts("2024-01-01 11:15:00"), "BTC", 130.0, 7L),
      // other symbol, and a null-price row that must be excluded
      (7L, ts("2024-01-01 10:10:00"), "ETH", 10.0, 3L),
      (8L, ts("2024-01-01 10:20:00"), "ETH", Double.NaN, 4L)
    ).toDF("id", "t", "sym", "p", "v")
      .withColumn("p", when(isnan($"p"), lit(null)).otherwise($"p"))
    val bars = Resample.ohlcBars(ticks, "sym", "t", "id", "p", "v", "1 hour")
      .select($"sym", date_format($"bar_start", "HH:mm").alias("bar"),
        $"open", $"high", $"low", $"close", $"n_trades", $"volume",
        round($"vwap", 6).alias("vwap"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    val btc10 = bars(("BTC", "10:00"))
    btc10.getDouble(2) shouldBe 100.0 // open: tie -> smaller id
    btc10.getDouble(3) shouldBe 120.0 // high
    btc10.getDouble(4) shouldBe 90.0  // low
    btc10.getDouble(5) shouldBe 119.0 // close: tie -> larger id
    btc10.getLong(6) shouldBe 5L
    btc10.getLong(7) shouldBe 38L
    // vwap = (100·10 + 101·5 + 90·20 + 120·1 + 119·2) / 38
    val expect = (100.0 * 10 + 101 * 5 + 90 * 20 + 120 * 1 + 119 * 2) / 38
    btc10.getDouble(8) shouldBe (math.rint(expect * 1e6) / 1e6)

    bars(("BTC", "11:00")).getDouble(2) shouldBe 130.0
    bars(("BTC", "11:00")).getDouble(5) shouldBe 130.0
    // ETH: the null-price tick is gone — one-trade candle
    bars(("ETH", "10:00")).getLong(6) shouldBe 1L
    bars.size shouldBe 3
  }
}
