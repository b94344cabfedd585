package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAFs (SURVEY §2.3 A6) built on `Aggregator` — the
  * partial/merge/finish shape Spark distributes as map-side partial
  * aggregation, so a custom aggregate shuffles one buffer per partition per
  * key, exactly like a built-in.
  */
object Aggregators {

  /** Exact sum — the `Aggregator` twin of `sum(col)`, used to prove the
    * custom-UDAF machinery against a SQL oracle (sums of integral doubles
    * are order-insensitive, so the oracle hash-matches).
    */
  object SumDouble extends Aggregator[Double, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, a: Double): Double = b + a
    override def merge(b1: Double, b2: Double): Double = b1 + b2
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** (min, max, count) in one pass — the V4 sanity-gate triple as a single
    * custom aggregate buffer.
    */
  final case class MinMaxCount(min: Double, max: Double, count: Long)
  object MinMaxCountAgg extends Aggregator[Double, MinMaxCount, MinMaxCount] {
    override def zero: MinMaxCount = MinMaxCount(Double.PositiveInfinity, Double.NegativeInfinity, 0L)
    override def reduce(b: MinMaxCount, a: Double): MinMaxCount =
      MinMaxCount(math.min(b.min, a), math.max(b.max, a), b.count + 1L)
    override def merge(a: MinMaxCount, b: MinMaxCount): MinMaxCount =
      MinMaxCount(math.min(a.min, b.min), math.max(a.max, b.max), a.count + b.count)
    override def finish(b: MinMaxCount): MinMaxCount = b
    override def bufferEncoder: Encoder[MinMaxCount] = Encoders.product[MinMaxCount]
    override def outputEncoder: Encoder[MinMaxCount] = Encoders.product[MinMaxCount]
  }
}
