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
    * `Aggregator`: 2^p byte registers, murmur3-hashed inputs, finished with
    * Ertl's improved raw estimator (arXiv:1702.01284 §2, Algorithm 6) — the
    * table-free successor to HLL++'s empirical bias correction: one smooth
    * estimator over the whole range (the σ/τ series absorb the low-range
    * linear-counting regime and the saturated-register regime), no
    * hand-tuned crossover thresholds, relative error ≈ 1.04/√m throughout.
    * The buffer is at most 2^p bytes regardless of cardinality (and only
    * 1+3n bytes while a group has ≤n occupied registers — see the sparse
    * encoding below) — the sketch shape that makes distinct counts
    * mergeable across partitions, days, and tables at 100 TB (union =
    * register-wise max), unlike exact count-distinct whose state grows
    * with cardinality.
    */
  final class HyperLogLog(p: Int = 12) extends Aggregator[String, Array[Byte], Long]
      with Serializable {
    require(p >= 4 && p <= 16,
      s"p must be in [4, 16] (sparse encoding packs register indexes into 2 bytes); got $p")
    private val m = 1 << p
    private val q = 64 - p // ranks occupy 0 .. q+1
    // Buffer encoding — byte 0 is the format tag:
    //   0 (sparse): [(idx: 2 bytes big-endian)(rank: 1 byte)] * n — low-
    //     cardinality groups carry 1+3n bytes instead of the 2^p dense
    //     array, which matters when a groupBy has millions of small groups;
    //   1 (dense):  2^p register bytes.
    // Register contents are IDENTICAL either way, so estimates don't depend
    // on which groups densified. The sparse limit is capped at 128 entries:
    // sparseUpsert is a linear scan per input row, so the cap bounds the
    // per-row cost for high-row/medium-cardinality groups that would
    // otherwise sit just under a larger threshold forever.
    private val sparseLimit = math.min(m / 8, 128)

    override def zero: Array[Byte] = Array[Byte](0)

    private def sparseCount(buf: Array[Byte]): Int = (buf.length - 1) / 3
    private def sparseIdx(buf: Array[Byte], k: Int): Int =
      ((buf(1 + 3 * k) & 0xff) << 8) | (buf(2 + 3 * k) & 0xff)
    private def sparseRank(buf: Array[Byte], k: Int): Int = buf(3 + 3 * k) & 0xff

    private def densify(buf: Array[Byte]): Array[Byte] = {
      if (buf.nonEmpty && buf(0) == 1) return buf
      val regs = new Array[Byte](1 + m)
      regs(0) = 1
      var k = 0
      val n = sparseCount(buf)
      while (k < n) {
        val i = sparseIdx(buf, k); val r = sparseRank(buf, k)
        if (r > (regs(1 + i) & 0xff)) regs(1 + i) = r.toByte
        k += 1
      }
      regs
    }

    private def sparseUpsert(buf: Array[Byte], idx: Int, rank: Int): Array[Byte] = {
      var k = 0
      val n = sparseCount(buf)
      while (k < n) {
        if (sparseIdx(buf, k) == idx) {
          if (rank > sparseRank(buf, k)) buf(3 + 3 * k) = rank.toByte
          return buf
        }
        k += 1
      }
      if (n + 1 > sparseLimit) {
        val dense = densify(buf)
        if (rank > (dense(1 + idx) & 0xff)) dense(1 + idx) = rank.toByte
        dense
      } else {
        val out = java.util.Arrays.copyOf(buf, buf.length + 3)
        out(buf.length)     = ((idx >> 8) & 0xff).toByte
        out(buf.length + 1) = (idx & 0xff).toByte
        out(buf.length + 2) = rank.toByte
        out
      }
    }

    override def reduce(buf: Array[Byte], v: String): Array[Byte] = {
      if (v == null) return buf
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(v)
      val h64 = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42).toLong & 0xffffffffL |
        (org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 43).toLong << 32)
      val idx  = (h64 >>> (64 - p)).toInt
      val rest = h64 << p
      val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (buf.nonEmpty && buf(0) == 1) {
        if (rank > (buf(1 + idx) & 0xff)) buf(1 + idx) = rank.toByte
        buf
      } else sparseUpsert(buf, idx, rank)
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val aSparse = a.isEmpty || a(0) == 0
      val bSparse = b.isEmpty || b(0) == 0
      if (aSparse && bSparse) {
        // fold b's entries into a (densifies automatically past the limit)
        var out = a
        var k = 0
        val n = sparseCount(b)
        while (k < n) {
          out = if (out.nonEmpty && out(0) == 1) {
            val i = sparseIdx(b, k); val r = sparseRank(b, k)
            if (r > (out(1 + i) & 0xff)) out(1 + i) = r.toByte
            out
          } else sparseUpsert(out, sparseIdx(b, k), sparseRank(b, k))
          k += 1
        }
        out
      } else {
        val dense = densify(a)
        val other = densify(b)
        var i = 1
        while (i <= m) {
          if ((other(i) & 0xff) > (dense(i) & 0xff)) dense(i) = other(i)
          i += 1
        }
        dense
      }
    }

    /** σ(x) = x + Σ_{k≥1} x^(2^k) 2^(k−1) (Ertl eq. 66; diverges at x=1). */
    private def sigma(x0: Double): Double = {
      if (x0 == 1.0) return Double.PositiveInfinity
      var x = x0; var y = 1.0; var z = x
      var zPrev = -1.0
      while (z != zPrev) { zPrev = z; x = x * x; z += x * y; y += y }
      z
    }

    /** τ(x) = (1/3)(1 − x − Σ_{k≥1} (1 − x^(2^−k))² 2^(−k)) (Ertl eq. 67). */
    private def tau(x0: Double): Double = {
      if (x0 == 0.0 || x0 == 1.0) return 0.0
      var x = x0; var y = 1.0; var z = 1.0 - x
      var zPrev = -1.0
      while (z != zPrev) {
        zPrev = z; x = math.sqrt(x); y *= 0.5
        val d = 1.0 - x
        z -= d * d * y
      }
      z / 3.0
    }

    override def finish(buf: Array[Byte]): Long = {
      val regs = densify(buf)
      // register-value histogram C[0..q+1]
      val c = new Array[Int](q + 2)
      var i = 1
      while (i <= m) { c(regs(i) & 0xff) += 1; i += 1 }
      // Ertl Algorithm 6: Horner over C with σ/τ boundary terms.
      var z = m * tau(1.0 - c(q + 1).toDouble / m)
      var k = q
      while (k >= 1) { z = 0.5 * (z + c(k)); k -= 1 }
      z += m * sigma(c(0).toDouble / m)
      val alphaInf = 1.0 / (2.0 * math.log(2.0))
      math.round(alphaInf * m * m / z)
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong

    /** Canonical (dense) register content — test hook for merge-law
      * properties, which must compare sketches structurally, not just by
      * their finished estimates.
      */
    private[graft] def registers(buf: Array[Byte]): Seq[Byte] =
      densify(buf.clone).drop(1).toSeq
  }

  /** DDSketch buffer: contiguous log-γ bucket counts (index `minIdx + i`),
    * split by sign, zeros separate. Dense arrays keep the per-row reduce an
    * in-place increment (an immutable-map buffer costs an allocation per
    * input row — ~6× slower on a 6M-row column); bucket-wise sums make
    * merge EXACTLY commutative/associative — unlike t-digest, the sketch is
    * independent of encounter order, so Spark's nondeterministic
    * partial-merge order can never perturb results.
    */
  final case class DdBuffer(minIdx: Int, counts: Array[Long],
      negMinIdx: Int, negCounts: Array[Long], zeros: Long)

  /** Mergeable quantile sketch — DDSketch (Masson, Rim & Lee, VLDB 2019;
    * public paper): values land in geometric buckets `ceil(log_γ x)` with
    * γ = (1+α)/(1−α), which guarantees RELATIVE error ≤ α on every
    * reported quantile value at any cardinality. The buffer is one count
    * per occupied bucket (a few hundred ints across 15 orders of
    * magnitude at α=0.01) — the mergeable shape that lets percentiles
    * aggregate across partitions/days/tables at 100 TB, where exact
    * `percentile` must ship every value.
    *
    * `finish` returns the estimates for `quantiles` (nearest-rank over the
    * bucket histogram; each bucket reports its α-midpoint 2γ^i/(γ+1)).
    */
  final class DdSketchQuantiles(alpha: Double, quantiles: Seq[Double])
      extends Aggregator[Double, DdBuffer, Seq[Double]] with Serializable {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      "quantiles in [0,1]")
    private val gamma    = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)

    /** Bucket index, CLAMPED to the |value| range [1e-38, 1e38] (float's
      * territory, far beyond practical metrics): one stray denormal (say
      * 1e-300) would otherwise force a contiguous range of tens of
      * thousands of buckets into every buffer and merge. The clamp index
      * DERIVES from α — a fixed index bound would silently shrink the
      * representable range as α tightens — so the relative-error guarantee
      * holds across the whole documented value range at every α;
      * magnitudes outside collapse into the edge bucket (the DDSketch
      * paper's bounded-store collapse, applied per value so merge laws
      * stay exact).
      */
    private val maxAbsIdx: Int =
      math.ceil(math.log(1e38) / logGamma).toInt
    private def bucket(x: Double): Int = {
      val i = math.ceil(math.log(x) / logGamma)
      if (i > maxAbsIdx) maxAbsIdx
      else if (i < -maxAbsIdx) -maxAbsIdx
      else i.toInt
    }
    private def bucketValue(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1)

    override def zero: DdBuffer = DdBuffer(0, Array.empty, 0, Array.empty, 0L)

    /** Increment bucket `i` in a (minIdx, counts) range, growing with slack
      * only when `i` falls outside; in-range hits mutate in place.
      * Returns the (possibly reallocated) range.
      */
    private def bump(minIdx: Int, counts: Array[Long], i: Int,
        by: Long): (Int, Array[Long]) = {
      if (counts.isEmpty) {
        val a = new Array[Long](1); a(0) = by; (i, a)
      } else if (i >= minIdx && i < minIdx + counts.length) {
        counts(i - minIdx) += by; (minIdx, counts)
      } else {
        val newMin = math.min(minIdx, i - 8)
        val newMax = math.max(minIdx + counts.length - 1, i + 8)
        val a = new Array[Long](newMax - newMin + 1)
        System.arraycopy(counts, 0, a, minIdx - newMin, counts.length)
        a(i - newMin) += by
        (newMin, a)
      }
    }

    override def reduce(b: DdBuffer, x: Double): DdBuffer = {
      if (x.isNaN) b
      else if (x > 0) {
        val (m, c) = bump(b.minIdx, b.counts, bucket(x), 1L)
        if ((c eq b.counts) && m == b.minIdx) b
        else b.copy(minIdx = m, counts = c)
      } else if (x < 0) {
        val (m, c) = bump(b.negMinIdx, b.negCounts, bucket(-x), 1L)
        if ((c eq b.negCounts) && m == b.negMinIdx) b
        else b.copy(negMinIdx = m, negCounts = c)
      } else b.copy(zeros = b.zeros + 1L)
    }

    override def merge(a: DdBuffer, b: DdBuffer): DdBuffer = {
      var (pm, pc) = (a.minIdx, a.counts)
      var i = 0
      while (i < b.counts.length) {
        if (b.counts(i) != 0) {
          val r = bump(pm, pc, b.minIdx + i, b.counts(i)); pm = r._1; pc = r._2
        }
        i += 1
      }
      var (nm, nc) = (a.negMinIdx, a.negCounts)
      i = 0
      while (i < b.negCounts.length) {
        if (b.negCounts(i) != 0) {
          val r = bump(nm, nc, b.negMinIdx + i, b.negCounts(i)); nm = r._1; nc = r._2
        }
        i += 1
      }
      DdBuffer(pm, pc, nm, nc, a.zeros + b.zeros)
    }

    override def finish(b: DdBuffer): Seq[Double] = {
      val n = b.counts.sum + b.negCounts.sum + b.zeros
      if (n == 0) return quantiles.map(_ => Double.NaN)
      // ascending value order: negatives (bucket desc → value −est), zeros,
      // positives (bucket asc)
      val ordered: Seq[(Double, Long)] =
        b.negCounts.indices.reverse
          .collect { case i if b.negCounts(i) != 0 =>
            (-bucketValue(b.negMinIdx + i), b.negCounts(i)) } ++
          (if (b.zeros > 0) Seq((0.0, b.zeros)) else Nil) ++
          b.counts.indices.collect { case i if b.counts(i) != 0 =>
            (bucketValue(b.minIdx + i), b.counts(i)) }
      quantiles.map { q =>
        val rank = math.max(0L, math.ceil(q * n).toLong - 1L) // 0-based nearest rank
        var cum = 0L
        ordered.collectFirst {
          case (v, c) if { cum += c; cum > rank } => v
        }.getOrElse(ordered.last._1)
      }
    }

    override def bufferEncoder: Encoder[DdBuffer] = Encoders.product[DdBuffer]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

    /** Canonical (bucket → count) view — array layout (offsets, slack) is
      * merge-order-dependent; the logical bucket counts are not. Test hook
      * for the merge-law properties.
      */
    private[graft] def canonical(b: DdBuffer): (Map[Int, Long], Map[Int, Long], Long) = (
      b.counts.indices.collect {
        case i if b.counts(i) != 0 => (b.minIdx + i) -> b.counts(i) }.toMap,
      b.negCounts.indices.collect {
        case i if b.negCounts(i) != 0 => (b.negMinIdx + i) -> b.negCounts(i) }.toMap,
      b.zeros)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005; public paper) for
    * frequency estimation over a key stream: `depth` hash rows × `width`
    * counters; estimate = min over rows. Guarantees: the estimate NEVER
    * undercounts (deterministically — every occurrence increments every
    * row), and overcounts by ≤ (e/width)·N with probability 1−(1/e)^depth.
    * Merges are elementwise sums — exactly commutative/associative, the
    * mergeable shape for per-partition/day/table frequency aggregation at
    * scale. `finish` returns the estimates for `queryKeys`.
    */
  final class CountMinFreq(depth: Int, width: Int, queryKeys: Seq[String])
      extends Aggregator[String, Array[Long], Seq[Long]] with Serializable {
    require(depth > 0 && width > 0, "depth and width must be positive")
    require(queryKeys.nonEmpty, "queryKeys must be non-empty")

    // UTF8String conversion hoisted out of the per-row depth loop: one
    // encode per input row, `depth` hashes of the same bytes.
    private def idx(u: org.apache.spark.unsafe.types.UTF8String, row: Int): Int = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 1000 + row)
      row * width + math.floorMod(h, width)
    }

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], v: String): Array[Long] = {
      if (v != null) {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(v)
        var d = 0
        while (d < depth) { buf(idx(u, d)) += 1L; d += 1 }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      queryKeys.map { k =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(k)
        var best = Long.MaxValue
        var d = 0
        while (d < depth) { best = math.min(best, buf(idx(u, d))); d += 1 }
        best
      }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Element-wise mean of a fixed-`dim` float-vector column — mean pooling
    * / label centroids, the embedding-space aggregation behind clustering
    * and centroid-based dedup. Shuffles ONE (sums, count) buffer per
    * (partition, key) with map-side combine, never the vectors; at 100 TB
    * the exchange carries `dim` doubles per key per partition. Null or
    * wrong-length vectors are skipped (counted out, loudly disallowed only
    * at construction — a silent partial mean would be worse than none).
    */
  final class VectorMean(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), (Seq[Double], Long)]
      with Serializable {
    require(dim > 0, "dim must be positive")
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) =
      if (v == null || v.length != dim) b
      else {
        var i = 0
        while (i < dim) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    // Output carries the POOLED count straight from the buffer — the only
    // count consistent with the mean (an outer count(vecCol) would include
    // wrong-length vectors the reduce step skipped).
    override def finish(r: (Array[Double], Long)): (Seq[Double], Long) =
      if (r._2 == 0L) (Seq.empty, 0L)
      else (r._1.map(_ / r._2).toSeq, r._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[(Seq[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
  }

  /** [[DdSketchQuantiles]] that FINISHES TO THE SKETCH (the `DdBuffer`
    * struct) — persist per-window quantile sketches and answer any window
    * union later by merging buffers (see [[DdUnion]]), the quantile
    * counterpart of [[HyperLogLogSketch]].
    */
  final class DdSketchBuffer(alpha: Double)
      extends Aggregator[Double, DdBuffer, DdBuffer] with Serializable {
    private val s = new DdSketchQuantiles(alpha, Seq(0.5))
    override def zero: DdBuffer = s.zero
    override def reduce(b: DdBuffer, x: Double): DdBuffer = s.reduce(b, x)
    override def merge(a: DdBuffer, b: DdBuffer): DdBuffer = s.merge(a, b)
    override def finish(b: DdBuffer): DdBuffer = b
    override def bufferEncoder: Encoder[DdBuffer] = Encoders.product[DdBuffer]
    override def outputEncoder: Encoder[DdBuffer] = Encoders.product[DdBuffer]
  }

  /** Union of persisted [[DdSketchBuffer]] sketches (same α) → quantile
    * estimates. Exact merge laws mean a union of hourly sketches IS the
    * sketch of the union stream — the α relative-error guarantee carries
    * to every merged window.
    */
  final class DdUnion(alpha: Double, quantiles: Seq[Double])
      extends Aggregator[DdBuffer, DdBuffer, Seq[Double]] with Serializable {
    private val s = new DdSketchQuantiles(alpha, quantiles)
    override def zero: DdBuffer = s.zero
    override def reduce(b: DdBuffer, in: DdBuffer): DdBuffer =
      if (in == null) b else s.merge(b, in)
    override def merge(a: DdBuffer, b: DdBuffer): DdBuffer = s.merge(a, b)
    // An all-empty union (a window with no sketches) finishes to 0.0 per
    // quantile — the same empty→0 convention as [[HllUnion]] — rather than
    // the NaN a raw DdSketchQuantiles.finish would emit on an empty buffer.
    override def finish(b: DdBuffer): Seq[Double] =
      if (b.counts.forall(_ == 0L) && b.negCounts.forall(_ == 0L) && b.zeros == 0L)
        quantiles.map(_ => 0.0)
      else s.finish(b)
    override def bufferEncoder: Encoder[DdBuffer] = Encoders.product[DdBuffer]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** [[HyperLogLog]] that FINISHES TO THE SKETCH (serialized buffer)
    * instead of the estimate — the building block of sketch-per-window
    * rollups: aggregate once per hour/day/partition, persist the few-KB
    * buffers, and answer any window union later by merging sketches,
    * never rescanning rows.
    */
  final class HyperLogLogSketch(p: Int = 12)
      extends Aggregator[String, Array[Byte], Array[Byte]] with Serializable {
    private val h = new HyperLogLog(p)
    override def zero: Array[Byte] = h.zero
    override def reduce(buf: Array[Byte], v: String): Array[Byte] = h.reduce(buf, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = h.merge(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union of persisted [[HyperLogLogSketch]] buffers → estimate. The input
    * rows ARE sketches (same `p`); a null input is the empty sketch. This
    * is what makes HLL "mergeable" operationally: rolling windows, cross-
    * partition totals, and backfills all reduce to merging stored buffers.
    */
  final class HllUnion(p: Int = 12)
      extends Aggregator[Array[Byte], Array[Byte], Long] with Serializable {
    private val h = new HyperLogLog(p)
    override def zero: Array[Byte] = h.zero
    override def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] =
      if (sk == null) buf else h.merge(buf, sk)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = h.merge(a, b)
    override def finish(b: Array[Byte]): Long = h.finish(b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Misra–Gries frequent-items summary over a string key — the candidate
    * pass of two-pass exact heavy hitters (see
    * `graft.operators.HeavyHitters`). Keeps at most `k` counters; classic
    * stream update (hit → +1; room → insert; full → decrement ALL, drop
    * zeros, amortized O(1)/item) and the mergeable-summaries combine
    * (Agarwal et al., PODS '12): sum counters, then subtract the (k+1)-th
    * largest value and drop non-positives.
    *
    * Guarantee carried across arbitrary merge trees: every item with true
    * frequency > n/(k+1) survives in the summary, and each kept estimate
    * undercounts by ≤ n/(k+1). The summary CONTENT is merge-order-dependent
    * (only the guarantee is deterministic) — hence the exact second pass in
    * the operator; never ship raw MG estimates to an oracle-checked
    * surface. Shuffles ≤ k (string, long) entries per partition with
    * map-side combine; nulls are skipped.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
        Map[String, Long]] with Serializable {
    require(k > 0, "k must be positive")
    type Buf = scala.collection.mutable.HashMap[String, Long]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(b: Buf, v: String): Buf = {
      if (v != null) {
        b.get(v) match {
          case Some(c) => b.update(v, c + 1L)
          case None if b.size < k => b.update(v, 1L)
          case None =>
            // decrement-all: pairs the unseen item against one occurrence
            // of every tracked item (the streaming "cancel k+1 distinct
            // items" step); zeros vacate their counter. Snapshot-then-
            // rebuild — updating values during HashMap iteration is unsafe
            // (put() grows the table near the load threshold even for
            // existing keys, silently truncating a live iterator).
            decrementAll(b, 1L)
        }
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
      if (a.size > k) {
        val d = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        decrementAll(a, d)
      }
      a
    }

    /** Subtract `d` from every counter, dropping non-positives — via an
      * entry snapshot, never by mutating under a live iterator (see
      * [[reduce]]).
      */
    private def decrementAll(b: Buf, d: Long): Unit = {
      val entries = b.toArray
      b.clear()
      entries.foreach { case (key, c) => if (c - d > 0L) b.update(key, c - d) }
    }

    override def finish(b: Buf): Map[String, Long] = b.toMap
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Bounded top-k (score, id) pairs per group — the scale-correct
    * top-k-per-group shape: a hash aggregate whose buffer holds AT MOST k
    * entries, so partial aggregation combines map-side and only
    * k·partitions tiny rows cross the shuffle. The window-function
    * formulation (`row_number() over (partition by g order by s desc)
    * <= k`) shuffles and SORTS every input row by group; this never
    * sorts more than 2k elements at a time and moves no raw rows at all.
    *
    * Deterministic: ordered by (score DESC, id ASC) — ties break to the
    * smallest id, and the k-th place is unambiguous. `finish` emits the
    * pairs in rank order; explode + posexplode downstream for rank
    * numbers. Buffer arrays stay primitive-encoded (product of two
    * arrays), no kryo. NULL scores: the primitive tuple encoder folds
    * SQL NULL to 0.0 silently — filter null score rows upstream if 0.0
    * must not compete.
    */
  final case class TopKBuf(scores: Array[Double], ids: Array[Long])
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)
    // keep (s1, i1) ranked above (s2, i2)?
    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    /** Merge two rank-ordered bounded buffers (classic merge step). */
    private def merged(a: TopKBuf, b: TopKBuf): TopKBuf = {
      val n = math.min(k, a.scores.length + b.scores.length)
      val s = new Array[Double](n); val id = new Array[Long](n)
      var ai = 0; var bi = 0; var o = 0
      while (o < n) {
        val takeA = bi >= b.scores.length || (ai < a.scores.length &&
          beats(a.scores(ai), a.ids(ai), b.scores(bi), b.ids(bi)))
        if (takeA) { s(o) = a.scores(ai); id(o) = a.ids(ai); ai += 1 }
        else { s(o) = b.scores(bi); id(o) = b.ids(bi); bi += 1 }
        o += 1
      }
      TopKBuf(s, id)
    }
    override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
      val n = b.scores.length
      // fast path: buffer full and the row is below the floor — the
      // overwhelmingly common case on a big group, zero allocation
      if (n >= k && !beats(a._1, a._2, b.scores(n - 1), b.ids(n - 1))) b
      else merged(b, TopKBuf(Array(a._1), Array(a._2)))
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = merged(a, b)
    override def finish(b: TopKBuf): Seq[(Double, Long)] =
      b.scores.indices.map(i => (b.scores(i), b.ids(i)))
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
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
