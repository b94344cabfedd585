package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType)` embedding columns (north-star
  * similarity search; `embeddings.parquet` carries 64-dim float vectors).
  *
  * Hot-path kernels are static JVM methods over Spark's unsafe `ArrayData`
  * (no boxing, no `Seq` conversion), and the Catalyst expressions call them
  * from `doGenCode` — so similarity scoring stays inside whole-stage codegen
  * instead of falling out to a Scala UDF with per-row serialization. At 100 TB
  * the scoring loop is the innermost kernel of the ANN scan; this is the
  * preference order from SURVEY §7.3: native `Expression` > UDF.
  */
object VectorKernels {

  /** Cosine similarity of two float vectors, accumulated in double. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def normFloat(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Random-hyperplane (SimHash) signature bits packed into a Long: bit j is
    * the sign of `v · plane_j`. `planes` is a flattened row-major
    * (numBits × dim) float array. Used by LSH bucketing for ANN and
    * embedding near-dup detection — at scale this is the map-side hash that
    * replaces the all-pairs cartesian.
    */
  def hyperplaneBits(v: ArrayData, planes: Array[Float], dim: Int): Long = {
    val numBits = planes.length / dim
    var bits = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0
      val off = j * dim
      val n = math.min(dim, v.numElements())
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** L2-normalize a float vector (zero vector passes through as zeros).
    * Pre-normalizing a corpus turns every cosine into a dot product — at
    * scale that halves the FLOPs of the ANN scoring loop.
    */
  def l2Normalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (norm > 0.0) {
      i = 0
      while (i < n) { out(i) = (v.getFloat(i) / norm).toFloat; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization encode: for each of `m` subspaces of width `dsub`,
    * the index (one byte) of the L2-nearest codebook centroid of the
    * subvector. `codebooks` is flattened as (subspace, code, component) →
    * `codebooks((j*ksub + c)*dsub + i)`. A `dim`-float vector compresses to
    * `m` bytes — at 100 TB the ANN scoring join then shuffles codes, not
    * vectors (32× smaller at dim=64/m=8).
    */
  def pqEncode(v: ArrayData, codebooks: Array[Float], m: Int, dsub: Int,
      ksub: Int): Array[Byte] = {
    // LOUD dimension contract: a malformed embedding must not quietly encode
    // as if zero-padded — that would poison the ANN index silently.
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, codebook expects ${m * dsub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        val off = (j * ksub + c) * dsub
        var i = 0
        while (i < dsub) {
          val x = v.getFloat(j * dsub + i).toDouble - codebooks(off + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Asymmetric-distance (ADC) dot product: the full-precision query against
    * a PQ-coded corpus vector — Σ_j q_subj · codebook[j][code_j]. On
    * L2-normalized inputs this approximates cosine to within the
    * quantization distortion.
    */
  def adcDot(codes: Array[Byte], q: ArrayData, codebooks: Array[Float], m: Int,
      dsub: Int, ksub: Int): Double = {
    // Same loud contract as pqEncode: a short query or truncated code row
    // silently yields a partial sum — reject instead.
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"adc_dot: query has ${q.numElements()} elements, codebook expects ${m * dsub}")
    if (codes.length != m)
      throw new IllegalArgumentException(
        s"adc_dot: code row has ${codes.length} bytes, expected $m")
    var s = 0.0
    var j = 0
    while (j < m) {
      val off = (j * ksub + (codes(j) & 0xff)) * dsub
      var i = 0
      while (i < dsub) {
        s += q.getFloat(j * dsub + i).toDouble * codebooks(off + i)
        i += 1
      }
      j += 1
    }
    s
  }

  /** Indexes of the `nprobe` best-scoring cells for `v` against a flattened
    * row-major (numCells × dim) matrix of L2-NORMALIZED centroids, by dot
    * product (= cosine ranking, since the query norm is constant across
    * cells). Single pass with an insertion top-p — the IVF coarse-quantizer
    * probe, kept inside whole-stage codegen.
    */
  def nearestCells(v: ArrayData, centroids: Array[Float], dim: Int, nprobe: Int): ArrayData = {
    val numCells = centroids.length / dim
    val p = math.min(nprobe, numCells)
    val bestIdx   = new Array[Int](p)
    val bestScore = new Array[Double](p)
    java.util.Arrays.fill(bestScore, Double.NegativeInfinity)
    val n = math.min(dim, v.numElements())
    var c = 0
    while (c < numCells) {
      var dot = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * centroids(off + i); i += 1 }
      if (dot > bestScore(p - 1)) {
        var j = p - 1
        while (j > 0 && bestScore(j - 1) < dot) {
          bestScore(j) = bestScore(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestScore(j) = dot; bestIdx(j) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIdx)
  }
}

/** `cosine_similarity(a, b)` over two float-array columns. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosineFloat($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_product(a, b)` over two float-array columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dotFloat($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_normalize(vec)` — unit-norm float vector (zeros stay zeros). */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    VectorKernels.l2Normalize(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.l2Normalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_cells(vec)` — top-`nprobe` IVF cell ids for a float vector
  * against a broadcast (codegen reference) normalized-centroid matrix.
  */
case class NearestCells(child: Expression, centroids: Array[Float], dim: Int, nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    VectorKernels.nearestCells(in.asInstanceOf[ArrayData], centroids, dim, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCells($c, $ref, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_encode(vec)` — product-quantization codes (binary, `m` bytes) for a
  * float vector against a broadcast (codegen reference) flattened codebook
  * matrix. The 100 TB lever: downstream ANN scoring shuffles these codes,
  * never the vectors.
  */
case class PqEncode(child: Expression, codebooks: Array[Float], m: Int, dsub: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(in: Any): Any =
    VectorKernels.pqEncode(in.asInstanceOf[ArrayData], codebooks, m, dsub, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.pqEncode($c, $ref, $m, $dsub, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `adc_dot(codes, query)` — asymmetric-distance dot product of a PQ-coded
  * corpus vector against a full-precision query vector.
  */
case class AdcDot(left: Expression, right: Expression, codebooks: Array[Float],
    m: Int, dsub: Int, ksub: Int)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, q: Any): Any =
    VectorKernels.adcDot(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData],
      codebooks, m, dsub, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.VectorKernels.adcDot($c, $q, $ref, $m, $dsub, $ksub);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API + optional SQL registration. */
object VectorFunctions {

  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2Normalize(v: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(v)))

  /** Top-`nprobe` IVF cell ids (array<int>) for a float-vector column. */
  def nearestCells(vec: Column, centroids: Array[Float], dim: Int, nprobe: Int): Column =
    GraftSqlBridge.column(
      NearestCells(GraftSqlBridge.expression(vec), centroids, dim, nprobe))

  /** PQ codes (binary, `m` bytes) for a float-vector column. */
  def pqEncode(vec: Column, codebooks: Array[Float], m: Int, dsub: Int, ksub: Int): Column =
    GraftSqlBridge.column(
      PqEncode(GraftSqlBridge.expression(vec), codebooks, m, dsub, ksub))

  /** ADC dot product of a PQ-codes column against a float-vector column. */
  def adcDot(codes: Column, q: Column, codebooks: Array[Float], m: Int, dsub: Int,
      ksub: Int): Column =
    GraftSqlBridge.column(
      AdcDot(GraftSqlBridge.expression(codes), GraftSqlBridge.expression(q),
        codebooks, m, dsub, ksub))

  /** Register `cosine_similarity` / `dot_product` for `spark.sql` use. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs.head, exprs(1)), "builtin")
    registry.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "builtin")
  }
}
