package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join via binning. Spark plans a raw
  * `p BETWEEN lo AND hi` join as broadcast-nested-loop (or cartesian) —
  * O(|points|·|intervals|) work that dies at scale. Binning restores a hash
  * join: points land in `floor(p/binWidth)`, intervals explode to every bin
  * they overlap, the equi-join on the bin id is a uniform shuffle, and the
  * exact predicate filters inside bins. Each (point, interval) pair meets in
  * exactly one bin (the point's), so no dedup is needed. Choose `binWidth`
  * near the typical interval width: wider bins → fewer interval copies,
  * narrower bins → fewer false candidates.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pointCol)` ∈
    * `[intervals(loCol), intervals(hiCol)]` (inclusive). Numeric columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** INTERVAL-overlap join: pairs where `[lLo,lHi]` ∩ `[rLo,rHi]` ≠ ∅
    * (inclusive ends). The interval×interval generalization of
    * [[pointInInterval]] — genomics/temporal workloads' bread and butter
    * that raw Spark also plans as a nested loop. Both sides explode to
    * their covered bins and equi-join on the bin id; a pair overlapping
    * many shared bins is emitted ONCE, without any distinct shuffle, by
    * keeping only the FIRST shared bin — `bin == greatest(bin(lLo),
    * bin(rLo))` (the overlap's left edge lands there; every other shared
    * bin fails the equality). The exact predicate then filters
    * false-positive bin-mates.
    *
    * Same binWidth trade-off as the point join, squared: copies =
    * Σ width/binWidth over BOTH sides. A pathological interval spanning
    * the whole domain degrades to a hot bin row — cap such outliers
    * upstream (clip or split) as with any skewed key.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val l = left.withColumn("__lb", bin(col(lLoCol)))
      .withColumn("__bin", explode(sequence(bin(col(lLoCol)), bin(col(lHiCol)))))
    val r = right.withColumn("__rb", bin(col(rLoCol)))
      .withColumn("__bin", explode(sequence(bin(col(rLoCol)), bin(col(rHiCol)))))
    l.join(r, Seq("__bin"))
      .filter(col("__bin") === greatest(col("__lb"), col("__rb")) &&
        col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .drop("__bin", "__lb", "__rb")
  }
}
