package graft.operators

import graft.functions.Aggregators.MisraGries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters ("which tokens / domains / urls exceed φ of the
  * corpus") via the standard two-pass sketch-then-recount construction —
  * the shape that scales where a full `groupBy(key).count()` does not:
  * a 100 TB corpus has billions of distinct tokens, so materializing every
  * count to find the few frequent ones shuffles the whole key universe;
  * the sketch pass shuffles ≤ k counters per partition instead.
  *
  * Pass 1: a Misra–Gries summary (merge-safe, see
  * [[graft.functions.Aggregators.MisraGries]]) plus the total count in ONE
  * map-side-combined aggregate job. MG guarantees every item with
  * frequency > n/(k+1) is in the summary, so with k ≥ ⌈2/φ⌉ the candidate
  * set (≤ k keys, driver-held) is a superset of all φ-heavy hitters.
  *
  * Pass 2: exact counts of the candidates only — a codegen'd `isin` filter
  * (≤ k literals) feeding a tiny group-by — thresholded at count > φ·n.
  *
  * The output is therefore EXACT and deterministic even though the MG
  * summary content is merge-order-dependent: the sketch only nominates,
  * the recount decides. Rows with a NULL key are ignored (they are not a
  * key, and n excludes them on both passes).
  */
object HeavyHitters {

  /** Keys occurring in strictly more than `phi`·n of the non-null rows,
    * with their exact counts as `cnt`. `k` overrides the sketch width
    * (default ⌈2/φ⌉, twice the guarantee minimum — halves the undercount
    * slack for the same shuffle shape).
    */
  def heavyHitters(df: DataFrame, keyCol: String, phi: Double,
      k: Int = 0): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0, 1), got $phi")
    val k0 = if (k > 0) k else math.ceil(2.0 / phi).toInt
    require(k0 + 1 > 1.0 / phi,
      s"k = $k0 cannot guarantee phi = $phi (need k+1 > 1/phi)")
    val mg = udaf(new MisraGries(k0))
    val first = df
      .agg(mg(col(keyCol)).alias("__cand"), count(col(keyCol)).alias("__n"))
      .head()
    val n = first.getAs[Long]("__n")
    val candidates = first.getAs[Map[String, Long]]("__cand").keys.toSeq
    if (n == 0L || candidates.isEmpty)
      df.select(col(keyCol)).filter(lit(false))
        .withColumn("cnt", lit(0L))
    else
      df.filter(col(keyCol).isInCollection(candidates))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).alias("cnt"))
        .filter(col("cnt") > lit(phi * n))
  }
}
