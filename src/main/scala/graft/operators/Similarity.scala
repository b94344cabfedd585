package graft.operators

import graft.functions.{VectorFunctions, VectorKernels}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id for a float vector: the packed sign bits
  * of `planeBits` random projections. Planes are generated deterministically
  * from `seed` on the driver and shipped as a codegen reference object —
  * the per-row work stays inside whole-stage codegen.
  */
case class HyperplaneLsh(child: Expression, planes: Array[Float], dim: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    VectorKernels.hyperplaneBits(in.asInstanceOf[ArrayData], planes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.hyperplaneBits($c, $planesRef, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`) — north-star similarity search.
  *
  * Two paths:
  *  - [[Similarity.bruteForceTopK]]: exact cosine top-k. The query set is
  *    broadcast (it is small by construction); the corpus is scanned once,
  *    scored by the codegen'd [[graft.functions.CosineSimilarity]], and
  *    ranked per query. Correctness baseline and still the right plan when
  *    |queries| is small.
  *  - [[Similarity.lshTopK]]: the scale path. Corpus and queries are bucketed
  *    by random-hyperplane LSH (optionally probing neighbor buckets); scoring
  *    happens only inside matching buckets, so the scan shrinks from
  *    |corpus|×|queries| to the bucket collision set. At 100 TB the bucketed
  *    equi-join is a uniform hash shuffle — no cartesian anywhere in the plan.
  */
object Similarity {

  /** Deterministic N(0,1) hyperplanes, flattened row-major (bits × dim). */
  def randomPlanes(dim: Int, bits: Int, seed: Long): Array[Float] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits * dim)(rnd.nextGaussian().toFloat)
  }

  def hyperplaneBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column =
    GraftSqlBridge.column(
      HyperplaneLsh(GraftSqlBridge.expression(vec), randomPlanes(dim, bits, seed), dim))

  /** Exact top-k neighbors per query: broadcast queries × corpus scan +
    * per-query rank. `queries` must be small (it is broadcast). Ranking
    * orders by cosine ROUNDED to 6 decimals (ties broken by neighbor id) so
    * ranks are stable against last-ulp float-accumulation differences across
    * engines and replays.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).alias("cosine"))
  }

  /** Train an IVF coarse quantizer: Lloyd's k-means on a bounded,
    * seed-deterministic SAMPLE of the corpus, run on the driver. A coarse
    * quantizer needs only a statistical sketch of the vector distribution —
    * `maxTrainRows` (default 64k) rows bound the collect at a few MB
    * regardless of corpus size, which is the standard IVF construction
    * (train on sample, assign distributed). Driver Lloyd's on ≤64k×dim
    * floats costs milliseconds and zero Spark jobs beyond the one sample
    * scan — replacing a per-iteration MLlib job round. Centers are
    * L2-normalized and flattened row-major (numCells × dim) for the
    * codegen'd cell-probe kernel.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, dim: Int,
      numCells: Int, seed: Long = 42L, maxTrainRows: Int = 1 << 16): Array[Float] = {
    // count() is near-free on columnar sources (footer row counts); it only
    // sizes the sample fraction.
    val n = corpus.count()
    val sampled =
      if (n <= maxTrainRows) corpus.select(col(vecCol))
      else corpus.select(col(vecCol))
        .sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
    // accept float and double element types (array<float> AND array<double>);
    // null vectors, null elements, and NaN-bearing vectors are dropped from
    // the TRAINING sample (a centroid poisoned by NaN degrades every cell)
    val rows: Array[Array[Float]] = sampled
      .collect().flatMap(r => Option(if (r.isNullAt(0)) null else r.getSeq[Any](0)))
      .map(_.map {
        case f: Float  => f
        case d: Double => d.toFloat
        case x: Number => x.floatValue()
        case null      => Float.NaN
      }.toArray)
      .filter(v => v.length >= dim && !v.exists(_.isNaN))
    require(rows.nonEmpty, "IVF training needs at least one usable vector")

    val k = math.min(numCells, rows.length)
    val rnd = new java.util.Random(seed)
    // init: k distinct sample points (seeded shuffle)
    val centers = rnd.ints(0, rows.length).distinct().limit(k).toArray
      .map(i => rows(i).clone())
    val assign = new Array[Int](rows.length)
    var iter = 0
    var moved = true
    while (iter < 10 && moved) {
      moved = false
      // assignment step
      var r = 0
      while (r < rows.length) {
        val v = rows(r)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          val ctr = centers(c)
          while (i < dim) { val t = v(i) - ctr(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(r) != best) { assign(r) = best; moved = true }
        r += 1
      }
      // update step
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Int](k)
      r = 0
      while (r < rows.length) {
        val s = sums(assign(r)); val v = rows(r)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        cnts(assign(r)) += 1
        r += 1
      }
      var c = 0
      while (c < k) {
        if (cnts(c) > 0) {
          var i = 0
          while (i < dim) { centers(c)(i) = (sums(c)(i) / cnts(c)).toFloat; i += 1 }
        } // empty cell keeps its previous center
        c += 1
      }
      iter += 1
    }

    val flat = new Array[Float](numCells * dim)
    var c = 0
    while (c < k) {
      val arr  = centers(c)
      val norm = math.max(math.sqrt(arr.map(x => x.toDouble * x).sum), 1e-12)
      var i = 0
      while (i < dim) { flat(c * dim + i) = (arr(i) / norm).toFloat; i += 1 }
      c += 1
    }
    // numCells > distinct points: leftover cells stay zero vectors — they
    // attract nothing (cosine 0 after normalization) and probe last.
    flat
  }

  /** IVF approximate top-k — the classic inverted-file ANN layout: corpus
    * rows live in the cell of their nearest centroid; each query probes its
    * `nprobe` closest cells and exact-ranks only those candidates. At scale
    * the corpus assignment is a narrow map (centroids ride along as a
    * broadcast reference object) and the probe join is a uniform hash
    * shuffle on the cell id — no cartesian. Train once, reuse across query
    * batches.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, numCells: Int = 64, nprobe: Int = 8,
      seed: Long = 42L): DataFrame = {
    val centroids = trainIvfCentroids(corpus, vecCol, dim, numCells, seed)
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"),
      element_at(VectorFunctions.nearestCells(col(vecCol), centroids, dim, 1), 1)
        .alias("__cell"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"),
        explode(VectorFunctions.nearestCells(col(vecCol), centroids, dim, nprobe))
          .alias("__cell"))
    val candidates = c.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).alias("cosine"))
  }

  /** Approximate top-k: equi-join corpus and queries on the LSH bucket
    * (multi-probe: queries additionally match buckets at Hamming distance 1
    * when `probeBits > 0`), then exact-rank within candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, bits: Int = 12, probeBits: Int = 4, seed: Long = 42L): DataFrame = {
    val bucket = hyperplaneBucket(col(vecCol), dim, bits, seed)
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"),
      bucket.alias("__bucket"))
    // Multi-probe: each query also probes the buckets that differ in one of
    // the first `probeBits` bits — recall insurance against boundary effects.
    val probes = array((lit(0L) +: (0 until probeBits).map(b => lit(1L << b))): _*)
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"),
        bucket.alias("__qb"))
      .withColumn("__bucket", explode(transform(probes, m => col("__qb").bitwiseXOR(m))))
    val candidates = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("__qv"), col("__cv")))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).alias("cosine"))
  }

  /** Per-label mean vectors (centroids) — mean pooling over an embedding
    * column, the aggregation behind centroid-based clustering/dedup and
    * class prototypes. Runs as the [[graft.functions.Aggregators.VectorMean]]
    * typed UDAF: map-side combined, the shuffle carries one `dim`-double
    * buffer per (partition, label) — never the vectors. Output:
    * (`labelCol`, `centroid` array<double>, `n`). `n` is the POOLED count
    * emitted from the aggregation buffer itself, so null AND wrong-length
    * vectors are excluded from both the centroid and `n` — `centroid * n`
    * always reconstructs the pooled sum.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val vm = udaf(new graft.functions.Aggregators.VectorMean(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    df.groupBy(col(labelCol))
      .agg(vm(col(vecCol)).alias("__cm"))
      .select(col(labelCol), col("__cm._1").alias("centroid"),
        col("__cm._2").alias("n"))
  }
}
