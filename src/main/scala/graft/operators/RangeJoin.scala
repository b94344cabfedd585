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
}
