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

  /** HyperLogLog distinct-count sketch (Flajolet et al.) as a typed
    * `Aggregator`: 2^p byte registers, murmur3-hashed inputs, harmonic-mean
    * estimate with the standard small-range (linear counting) correction.
    * The buffer is a fixed 2^p-byte array regardless of cardinality — the
    * sketch shape that makes distinct counts mergeable across partitions,
    * days, and tables at 100 TB (union = register-wise max), unlike exact
    * count-distinct whose state grows with cardinality.
    */
  final class HyperLogLog(p: Int = 12) extends Aggregator[String, Array[Byte], Long]
      with Serializable {
    private val m = 1 << p
    private val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(regs: Array[Byte], v: String): Array[Byte] = {
      if (v != null) {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(v)
        val h64 = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42).toLong & 0xffffffffL |
          (org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 43).toLong << 32)
        val idx  = (h64 >>> (64 - p)).toInt
        val rest = h64 << p
        val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
        if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
      }
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(regs: Array[Byte]): Long = {
      var invSum = 0.0
      var zeros  = 0
      var i = 0
      while (i < m) {
        val r = regs(i) & 0xff
        invSum += 1.0 / (1L << r)
        if (r == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else raw
      math.round(est)
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
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
