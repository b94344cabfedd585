package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling — the OHLC/VWAP candle rollup the reference's
  * domain (market data) lives on, done as ONE hash aggregation instead of
  * the window-sort formulation:
  *
  *   - `open`/`close` are `min_by`/`max_by` over a (ts, id) STRUCT — the
  *     struct gives a total order, so timestamp ties break on the row id
  *     deterministically (a bare min_by(price, ts) picks an arbitrary
  *     winner under ties and would not replay stably);
  *   - `high`/`low` are plain min/max; `n_trades`/`volume` plain counts
  *     and sums — everything partially aggregates map-side, so the
  *     shuffle carries one row per (symbol, bar), never per trade;
  *   - `vwap` sums the per-row price·volume products in DECIMAL (exact,
  *     order-free — a double Σp·v drifts with merge order and would not
  *     hash-match a replay), dividing once at the end.
  *
  * At 100 TB of ticks this is the difference between a single
  * shuffle-light aggregation and a per-symbol window sort of every row:
  * `row_number() over (partition by symbol, bar order by ts)` sorts the
  * whole table to pick two rows per bar; min_by carries them in the
  * aggregation buffer.
  */
object Resample {

  /** Candle bars of `width` (any Spark window duration, e.g. "1 hour");
    * `bar_start` is the window's start timestamp. Rows with a NULL
    * timestamp, price, or volume are excluded (a tick missing any of the
    * three cannot contribute to a candle coherently).
    */
  def ohlcBars(df: DataFrame, symbolCol: String, tsCol: String,
      idCol: String, priceCol: String, volumeCol: String,
      width: String): DataFrame = {
    val key = struct(col(tsCol), col(idCol))
    df.filter(col(tsCol).isNotNull && col(priceCol).isNotNull &&
        col(volumeCol).isNotNull)
      .groupBy(col(symbolCol),
        window(col(tsCol), width).getField("start").alias("bar_start"))
      .agg(
        min_by(col(priceCol), key).alias("open"),
        max(col(priceCol)).alias("high"),
        min(col(priceCol)).alias("low"),
        max_by(col(priceCol), key).alias("close"),
        count(lit(1)).alias("n_trades"),
        sum(col(volumeCol)).alias("volume"),
        // a bar whose volume sums to ZERO has no volume-weighted price —
        // NULL, guarded explicitly (ANSI division would throw; IEEE
        // would invent an infinity the oracle can't hash)
        when(sum(col(volumeCol)) === 0, lit(null)).otherwise(
          sum((col(priceCol) * col(volumeCol)).cast("decimal(28,8)"))
            .cast("double") /
            sum(col(volumeCol).cast("decimal(28,8)")).cast("double"))
          .alias("vwap"))
  }
}
