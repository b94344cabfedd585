package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at lake scale.
  *
  * A linear sort clusters one key: files get tight min/max envelopes on the
  * leading column and useless ones on everything else, so a box query over
  * two dimensions still touches every file. Z-order (Morton) clustering
  * interleaves the BITS of several keys before sorting, so consecutive
  * z-values trace a space-filling curve and each written file covers a
  * compact tile in EVERY clustering dimension — parquet min/max (and
  * partition-directory) skipping then prunes multi-dimensional boxes, the
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Everything here is pure column expressions (shift/and/or — codegen'd,
  * no UDF) plus one bounded stats pass; the write itself is a normal hash
  * repartition, so the operator scales exactly as a parquet write does.
  */
object Layout {

  /** Morton interleave of `cols`, each already an integer in
    * [0, 2^bits): bit `b` of column `i` lands at z-bit `b·n + i`. Pure
    * shift/and/or expression tree (n·bits terms), stays inside
    * whole-stage codegen. `n·bits` must fit a signed Long (≤ 62).
    */
  def mortonInterleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "mortonInterleave needs at least one column")
    require(bits >= 1 && n * bits <= 62, s"n·bits must be in [1, 62], got ${n * bits}")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce((a, x) => a.bitwiseOR(x))
  }

  /** Scale each named numeric column into [0, 2^bits) bucket space with ONE
    * stats pass (a single min/max aggregate — a bounded one-row collect)
    * and add `__z` = their Morton interleave. Columns already in bucket
    * range pass through exactly (integer-valued doubles are exact).
    */
  def withZOrder(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bits) - 1
    val bucketed = cols.zipWithIndex.map { case (c, i) =>
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      if (hi <= lo) lit(0L) // constant column: a single bucket
      else least(lit(top), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) * lit(top.toDouble) / lit(hi - lo))))
    }
    df.withColumn("__z", mortonInterleave(bucketed, bits))
  }

  /** Z-order-clustered parquet write: bucketize + interleave, assign each
    * row to one of `2^tileBits` equal z-range tiles (`__tile` = the top
    * `tileBits` z-bits), and write partitioned by tile, z-sorted inside
    * each — one compact hyper-rectangle per tile directory, tight min/max
    * in every clustering column for row-group skipping within files.
    * Deterministic by construction (no sampled range boundaries), so a
    * re-run lays out byte-identical tiles.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      bits: Int = 16, tileBits: Int = 4): Unit = {
    require(tileBits >= 1 && tileBits <= cols.size * bits,
      s"tileBits must be in [1, ${cols.size * bits}]")
    withZOrder(df, cols, bits)
      .withColumn("__tile", shiftright(col("__z"), cols.size * bits - tileBits))
      .repartition(col("__tile"))
      .sortWithinPartitions(col("__tile"), col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy("__tile").parquet(path)
  }

  /** Per-file envelope audit: (file, n_rows, min/max of each layout column)
    * in one distributed pass — the evidence that a layout's files are
    * prunable (tight envelopes) or not. Used by specs and layout tuning;
    * output size = file count, never data-scale.
    */
  def fileEnvelopes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().alias("file"))
      .agg(count(lit(1)).alias("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).alias(s"min_$c"),
          max(col(c)).alias(s"max_$c"))): _*)
}
