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
    val rows = sampleVectors(corpus, vecCol, dim, seed, maxTrainRows)
    require(rows.nonEmpty, "IVF training needs at least one usable vector")
    val centers = lloyd(rows, math.min(numCells, rows.length), dim, seed)
    val flat = new Array[Float](numCells * dim)
    var c = 0
    while (c < centers.length) {
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

  /** Bounded, seed-deterministic driver sample of a vector column. Accepts
    * float and double element types (array<float> AND array<double>); null
    * vectors, null elements, and NaN-bearing vectors are dropped (a centroid
    * poisoned by NaN degrades every cell). The `count()` that sizes the
    * sample fraction is near-free on columnar sources (footer row counts).
    */
  private def sampleVectors(corpus: DataFrame, vecCol: String, dim: Int,
      seed: Long, maxTrainRows: Int): Array[Array[Float]] = {
    val n = corpus.count()
    val sampled =
      if (n <= maxTrainRows) corpus.select(col(vecCol))
      else corpus.select(col(vecCol))
        .sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
    sampled
      .collect().flatMap(r => Option(if (r.isNullAt(0)) null else r.getSeq[Any](0)))
      .map(_.map {
        case f: Float  => f
        case d: Double => d.toFloat
        case x: Number => x.floatValue()
        case null      => Float.NaN
      }.toArray)
      .filter(v => v.length >= dim && !v.exists(_.isNaN))
  }

  /** Driver-side Lloyd's k-means (≤10 iterations, seeded init from distinct
    * sample points). On a ≤64k-row sample this costs milliseconds and zero
    * Spark jobs — replacing a per-iteration MLlib job round. Returns the
    * raw (un-normalized) centers; empty cells keep their previous center.
    */
  private def lloyd(rows: Array[Array[Float]], k: Int, dim: Int,
      seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
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
    centers
  }

  /** Train product-quantization codebooks: per-subspace Lloyd's k-means over
    * the L2-NORMALIZED sample (codes are computed over normalized vectors so
    * the ADC dot approximates cosine). Returns the flattened
    * (subspace, code, component) layout [[graft.functions.VectorKernels.pqEncode]]
    * expects: `codebooks((j*ksub + c)*dsub + i)`, length `m*ksub*dsub`.
    * Same train-on-sample construction as [[trainIvfCentroids]] (Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", 2011).
    */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, dim: Int, m: Int,
      ksub: Int = 16, seed: Long = 42L, maxTrainRows: Int = 1 << 16): Array[Float] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub > 0 && ksub <= 256, s"ksub=$ksub must fit one byte")
    val dsub = dim / m
    val rows = sampleVectors(corpus, vecCol, dim, seed, maxTrainRows)
    require(rows.nonEmpty, "PQ training needs at least one usable vector")
    val normed = rows.map { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (norm > 0) v.map(x => (x / norm).toFloat) else v
    }
    val out = new Array[Float](m * ksub * dsub)
    var j = 0
    while (j < m) {
      val sub = normed.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val centers = lloyd(sub, math.min(ksub, sub.length), dsub, seed + j)
      var c = 0
      while (c < centers.length) {
        System.arraycopy(centers(c), 0, out, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      // leftover codes (ksub > distinct sample points) stay zero subvectors
      j += 1
    }
    out
  }

  /** IVF approximate top-k — the classic inverted-file ANN layout: corpus
    * rows live in the cell of their nearest centroid; each query probes its
    * `nprobe` closest cells and exact-ranks only those candidates. At scale
    * the corpus assignment is a narrow map (centroids ride along as a
    * broadcast reference object) and the probe join is a uniform hash
    * shuffle on the cell id — no cartesian.
    *
    * Train ONCE, reuse across query batches: pass
    * `centroids = Some(trainIvfCentroids(...))` and no training scan runs —
    * the call plans the assignment/probe join directly from the prebuilt
    * array. With `None` (convenience path) the coarse quantizer is trained
    * inline, which adds a corpus `count()` + bounded sample collect per
    * call — fine interactively, wasteful inside a per-batch loop.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, numCells: Int = 64, nprobe: Int = 8,
      seed: Long = 42L, centroids: Option[Array[Float]] = None): DataFrame = {
    val cents = centroids.getOrElse(trainIvfCentroids(corpus, vecCol, dim, numCells, seed))
    require(cents.length % dim == 0,
      s"centroid array length ${cents.length} is not a multiple of dim=$dim")
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"),
      element_at(VectorFunctions.nearestCells(col(vecCol), cents, dim, 1), 1)
        .alias("__cell"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"),
        explode(VectorFunctions.nearestCells(col(vecCol), cents, dim, nprobe))
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

  /** IVF-PQ approximate top-k — the standard large-scale ANN construction
    * (Jégou et al. 2011): the IVF coarse quantizer routes each corpus row to
    * a cell, an `m`-byte product-quantization code stands in for the vector,
    * candidates inside probed cells are ranked by the asymmetric-distance
    * (ADC) dot product against the full-precision query, and only the top
    * `rescoreFactor × k` shortlist per query is exactly rescored by cosine.
    *
    * 100 TB posture: the probe join shuffles `m`-byte code rows, never
    * vectors (32× smaller at dim=64/m=8); the exact rescore is a second
    * equi-join of the (tiny, broadcastable) shortlist against the corpus by
    * id, so full vectors are read only for shortlisted candidates. Both
    * models (centroids, codebooks) are broadcast codegen references —
    * train once via [[trainIvfCentroids]] / [[trainPqCodebooks]] and reuse
    * across batches; the `None` convenience path trains inline.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, numCells: Int = 64, nprobe: Int = 8, m: Int = 8,
      ksub: Int = 16, rescoreFactor: Int = 4, seed: Long = 42L,
      centroids: Option[Array[Float]] = None,
      codebooks: Option[Array[Float]] = None): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub  = dim / m
    val cents = centroids.getOrElse(trainIvfCentroids(corpus, vecCol, dim, numCells, seed))
    val books = codebooks.getOrElse(trainPqCodebooks(corpus, vecCol, dim, m, ksub, seed))
    require(books.length == m * ksub * dsub,
      s"codebook length ${books.length} != m*ksub*dsub = ${m * ksub * dsub}")
    // Codes are computed over L2-normalized vectors so ADC dot ≈ cosine.
    val c = codedCorpus(corpus, idCol, vecCol, dim, cents, books, m, dsub, ksub)
    val q = queries.select(col(idCol).alias("query_id"),
        VectorFunctions.l2Normalize(col(vecCol)).alias("__qn"),
        explode(VectorFunctions.nearestCells(col(vecCol), cents, dim, nprobe))
          .alias("__cell"))
    ivfPqSearch(c, q, corpus, queries, idCol, vecCol, k, rescoreFactor,
      books, m, dsub, ksub)
  }

  /** Corpus-side IVF-PQ layout: (`neighbor_id`, `__cell`, `__codes`) — the
    * one pass over full vectors that IVF-PQ needs; everything downstream
    * touches codes, not vectors.
    */
  private def codedCorpus(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, cents: Array[Float], books: Array[Float], m: Int, dsub: Int,
      ksub: Int): DataFrame =
    corpus.select(col(idCol).alias("neighbor_id"),
      element_at(VectorFunctions.nearestCells(col(vecCol), cents, dim, 1), 1)
        .alias("__cell"),
      VectorFunctions.pqEncode(VectorFunctions.l2Normalize(col(vecCol)),
        books, m, dsub, ksub).alias("__codes"))

  /** Shared IVF-PQ search tail: ADC shortlist inside probed cells, exact
    * cosine rescore of shortlisted ids against the full-precision corpus.
    */
  private def ivfPqSearch(coded: DataFrame, q: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      rescoreFactor: Int, books: Array[Float], m: Int, dsub: Int,
      ksub: Int): DataFrame = {
    val shortlist = {
      val adc = coded.join(broadcast(q), Seq("__cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("__adc", VectorFunctions.adcDot(col("__codes"), col("__qn"),
          books, m, dsub, ksub))
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(round(col("__adc"), 6).desc, col("neighbor_id").asc)
      adc.withColumn("__r", row_number().over(wAdc))
        .filter(col("__r") <= k.toLong * rescoreFactor)
        .select(col("query_id"), col("neighbor_id"))
    }
    // Exact rescore: re-attach full-precision vectors for shortlisted ids
    // only. Queries are re-read (small); the corpus join fetches candidate
    // vectors by id.
    val rescored = shortlist
      .join(corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).alias("query_id"),
        col(vecCol).alias("__qv"))), Seq("query_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    rescored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).alias("cosine"))
  }

  /** Persisted IVF-PQ index read back from [[buildIvfPqIndex]].
    * `trainSelfAdc`/`trainCellShare` are the TRAIN-TIME drift references
    * ([[ivfPqDriftReports]]); None on indexes built before r12.
    */
  final case class IvfPqIndex(dim: Int, m: Int, ksub: Int,
      centroids: Array[Float], codebooks: Array[Float], coded: DataFrame,
      trainSelfAdc: Option[Double] = None,
      trainCellShare: Option[Double] = None)

  /** One drift verdict for a frozen-model index ([[ivfPqDriftReports]],
    * [[binaryDriftReport]]): the train-time reference, the delta's
    * observed value, and whether the alarm FIRES. A report column, never
    * a silent retrain — retraining invalidates every historical code, so
    * the decision stays with the operator.
    */
  final case class IndexDriftReport(metric: String, trained: Double,
      observed: Double, drifted: Boolean)

  /** One aggregation over `df` under the index's frozen models: (mean
    * self-ADC, max coarse-cell share). Self-ADC — the ADC dot of a
    * vector's own codes against its normalized self — is the
    * reconstruction-quality proxy (≈ ⟨v̂, v⟩; falls when the frozen
    * codebooks stop fitting the data); cell share is the coarse-quantizer
    * fit (a shifted distribution piles into few cells, collapsing IVF
    * pruning — the scale-invariant failure self-ADC can miss and vice
    * versa). Bounded: ≤ numCells rows collected.
    */
  private def ivfPqDeltaStats(df: DataFrame, vecCol: String, dim: Int,
      cents: Array[Float], books: Array[Float], m: Int,
      ksub: Int): Option[(Double, Double)] = {
    val dsub = dim / m
    val qn = VectorFunctions.l2Normalize(col(vecCol))
    val per = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(
        element_at(VectorFunctions.nearestCells(col(vecCol), cents, dim, 1),
          1).alias("__c"),
        VectorFunctions.adcDot(
          VectorFunctions.pqEncode(qn, books, m, dsub, ksub), qn,
          books, m, dsub, ksub).alias("__adc"))
      .groupBy(col("__c"))
      .agg(count(lit(1)).alias("n"), sum(col("__adc")).alias("s"))
      .collect()
    // an empty (or all-invalid-dim) frame has no verdict: callers either
    // fail loudly (build — an index over nothing is a bug) or report
    // nothing (drift over an empty delta — the append is a no-op)
    if (per.isEmpty) None
    else {
      val total = per.map(_.getAs[Long]("n")).sum
      Some((per.map(_.getAs[Double]("s")).sum / total,
        per.map(_.getAs[Long]("n")).max.toDouble / total))
    }
  }

  /** Persist a trained IVF-PQ index: `path/params` holds the trained
    * models (coarse centroids + PQ codebooks + shape) as one parquet row;
    * `path/coded` holds the CODED CORPUS — (id, cell, m-byte codes) for
    * every vector. The corpus-side encode is the only full pass over the
    * vectors IVF-PQ ever needs, so at 100 TB it runs ONCE here, and each
    * query batch reads 12+m-byte coded rows instead of re-encoding the
    * corpus ([[ivfPqTopK]] re-derives the coded layout per call even with
    * prebuilt models). The exact-rescore stage still reads full vectors,
    * but only for the ~rescoreFactor·k shortlisted ids per query.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, numCells: Int = 64, m: Int = 8, ksub: Int = 16,
      seed: Long = 42L): Unit = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val cents = trainIvfCentroids(corpus, vecCol, dim, numCells, seed)
    val books = trainPqCodebooks(corpus, vecCol, dim, m, ksub, seed)
    val spark = corpus.sparkSession
    import spark.implicits._
    // train-time drift references: what "fits the distribution" measured
    // as at build, so every append can compare its delta against them
    val (trainAdc, trainShare) =
      ivfPqDeltaStats(corpus, vecCol, dim, cents, books, m, ksub)
        .getOrElse(sys.error(
          s"buildIvfPqIndex: no valid $dim-dim vector in the corpus"))
    Seq((dim, m, ksub, cents.toSeq, books.toSeq, trainAdc, trainShare))
      .toDF("dim", "m", "ksub", "centroids", "codebooks",
        "train_self_adc", "train_cell_share")
      .write.mode("overwrite").parquet(s"$path/params")
    codedCorpus(corpus, idCol, vecCol, dim, cents, books, m, dsub, ksub)
      .select(col("neighbor_id").alias("id"), col("__cell").alias("cell"),
        col("__codes").alias("codes"))
      .write.mode("overwrite").parquet(s"$path/coded")
  }

  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqIndex = {
    val p = spark.read.parquet(s"$path/params").head()
    def opt(c: String): Option[Double] =
      if (p.schema.fieldNames.contains(c)) Some(p.getAs[Double](c)) else None
    IvfPqIndex(p.getAs[Int]("dim"), p.getAs[Int]("m"), p.getAs[Int]("ksub"),
      p.getAs[Seq[Float]]("centroids").toArray,
      p.getAs[Seq[Float]]("codebooks").toArray,
      spark.read.parquet(s"$path/coded"),
      opt("train_self_adc"), opt("train_cell_share"))
  }

  /** Drift check of a delivery against a persisted IVF-PQ index's FROZEN
    * models — one bounded aggregate over the delta ([[ivfPqDeltaStats]]),
    * no index row read, no data rewritten. Two alarms:
    *   - `self_adc`: mean reconstruction quality under the frozen PQ
    *     codebooks fell more than `adcTolerance` (relative) below the
    *     train-time value — quantization error is growing, recall decays.
    *   - `cell_share`: the delta's largest coarse-cell share exceeds
    *     2 × train + 0.1 — the distribution has moved off the trained
    *     centroids and IVF pruning is collapsing toward a scan of one
    *     cell (the scale-invariant drift self-ADC can miss).
    * Empty on pre-r12 indexes (no stored references — rebuild to arm).
    */
  def ivfPqDriftReports(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, vecCol: String,
      adcTolerance: Double = 0.25): Seq[IndexDriftReport] = {
    val idx = readIvfPqIndex(spark, path)
    (idx.trainSelfAdc, idx.trainCellShare) match {
      case (Some(tAdc), Some(tShare)) =>
        ivfPqDeltaStats(delta, vecCol, idx.dim,
            idx.centroids, idx.codebooks, idx.m, idx.ksub) match {
          case Some((adc, share)) => Seq(
            IndexDriftReport("self_adc", tAdc, adc,
              adc < tAdc - adcTolerance * math.abs(tAdc)),
            IndexDriftReport("cell_share", tShare, share,
              share > tShare * 2 + 0.1))
          // empty delta: nothing to judge, and the append it rides on is
          // a harmless no-op — reporting (or crashing) would be noise
          case None => Nil
        }
      case _ => Nil
    }
  }

  /** Incremental append to a persisted IVF-PQ index: encode ONLY the delta
    * with the index's FROZEN models (train-once-encode-forever — the
    * standard production construction: coarse centroids and PQ codebooks
    * stay fixed across deliveries so codes remain mutually comparable) and
    * publish `path/coded` = old ∪ newly-coded, minus ids already present
    * (re-delivery is idempotent). Publication is stage-and-swap
    * ([[graft.sinks.LakeSink]]), so the union job reads the OLD fileset
    * for its whole run — appending over the index's own read path cannot
    * delete its inputs — and a crash leaves the previous version intact.
    *
    * 100 TB posture: each delivery costs one encode pass over the DELTA
    * plus an id anti-join against the 12+m-byte coded rows; historical
    * full-precision vectors are never re-read.
    */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, idCol: String,
      vecCol: String): Seq[IndexDriftReport] = {
    val idx = readIvfPqIndex(spark, path)
    // drift alarm BEFORE the append lands: the delta is being encoded
    // under the frozen models anyway, so the check is one extra bounded
    // aggregate — the report rides back to the caller, the append is
    // never blocked (operator decides; retrain invalidates history)
    val reports = ivfPqDriftReports(spark, path, delta, vecCol)
    val dsub = idx.dim / idx.m
    val fresh = codedCorpus(delta, idCol, vecCol, idx.dim, idx.centroids,
        idx.codebooks, idx.m, dsub, idx.ksub)
      .select(col("neighbor_id").alias("id"), col("__cell").alias("cell"),
        col("__codes").alias("codes"))
      .dropDuplicates("id")
      .join(idx.coded.select("id"), Seq("id"), "left_anti")
    val codedDir = new org.apache.hadoop.fs.Path(s"$path/coded")
    val fs = codedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.LakeSink.stageAndSwap(fs, codedDir) { staging =>
      idx.coded.unionByName(fresh).write.mode("overwrite").parquet(staging.toString)
    }
    reports
  }

  /** [[ivfPqTopK]] against a PERSISTED index: models come from
    * `index.{centroids,codebooks}`, the corpus-side coded layout is read
    * from disk, and only the rescore stage touches `corpus` (full vectors
    * fetched by shortlisted id). Same output contract as [[ivfPqTopK]] —
    * identical parameters yield identical results.
    */
  def searchIvfPqIndex(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 8,
      rescoreFactor: Int = 4): DataFrame = {
    val dsub = index.dim / index.m
    val coded = index.coded.select(col("id").alias("neighbor_id"),
      col("cell").alias("__cell"), col("codes").alias("__codes"))
    val q = queries.select(col(idCol).alias("query_id"),
      VectorFunctions.l2Normalize(col(vecCol)).alias("__qn"),
      explode(VectorFunctions.nearestCells(col(vecCol), index.centroids,
        index.dim, nprobe)).alias("__cell"))
    ivfPqSearch(coded, q, corpus, queries, idCol, vecCol, k, rescoreFactor,
      index.codebooks, index.m, dsub, index.ksub)
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

  /** Per-label embedding DISPERSION — mean pairwise cosine similarity
    * within each label, the compactness monitor behind clustering QA,
    * label-noise detection, and SemDeDup threshold tuning — computed in
    * O(n·d) by the sum-vector identity instead of the O(n²·d) pairwise
    * join the naive formulation implies:
    *
    *   Σ_{i≠j} cos(vᵢ,vⱼ) = ‖Σᵢ uᵢ‖² − n       (uᵢ = vᵢ/‖vᵢ‖, ‖uᵢ‖ = 1)
    *
    * so mean_cos = (‖Σu‖² − n) / (n(n−1)). The plan is one narrow
    * normalize, one (label, pos) hash aggregate whose shuffle carries
    * `dim` doubles per label per partition (map-side combined), and a
    * `dim`-row reduce per label. NO pairwise anything — at 100 TB this is
    * the difference between a broadcast-sized stats job and an impossible
    * self-join. Null and zero-norm vectors are excluded from `n`; labels
    * with fewer than 2 valid vectors are omitted (no pairs to average).
    *
    * Returns (`labelCol`, `n`, `mean_cos`) with mean_cos in [−1, 1].
    */
  /** Int8 scalar quantization (the Faiss-SQ8 storage path): per-DIMENSION
    * [min, max] over the corpus, each component mapped to
    * round((x − min_d) · 255 / (max_d − min_d)) — a 4× storage cut with a
    * per-component error bound of (max_d − min_d)/510, the simpler cousin
    * of the PQ codes the IVF-PQ index ships. Train-once posture: the
    * per-dimension ranges come from ONE posexplode aggregation (dim rows
    * out) and ride every encode as two broadcast array literals, so
    * encoding is a narrow codegen'd projection — no shuffle, no UDF.
    *
    * Returns (encoded, mins, maxs): encoded carries `idCol` and `codes`
    * array<int>; a constant dimension (max = min) encodes to 0 and
    * dequantizes exactly to that constant.
    */
  def scalarQuantize(embs: DataFrame, idCol: String,
      vecCol: String = "embedding", dim: Int = 64)
      : (DataFrame, Array[Double], Array[Double]) = {
    require(dim > 0, s"dim must be positive, got $dim")
    val valid = embs.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
    val ranges = valid
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__val")))
      .groupBy(col("__pos"))
      .agg(min(col("__val").cast("double")).alias("__mn"),
        max(col("__val").cast("double")).alias("__mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // a bare ranges(i) miss below would surface as an opaque
    // NoSuchElementException — name the real problem instead
    require(ranges.size == dim,
      s"scalarQuantize: found per-dimension ranges for ${ranges.size} of " +
        s"$dim dimensions — no input row passed the isNotNull && " +
        s"size == $dim filter (empty corpus, or the stored vectors have " +
        s"a different dim)")
    val mins = Array.tabulate(dim)(i => ranges(i)._1)
    val maxs = Array.tabulate(dim)(i => ranges(i)._2)
    val minLit = array(mins.map(lit): _*)
    val maxLit = array(maxs.map(lit): _*)
    val encoded = valid.select(col(idCol),
      zip_with(col(vecCol), sequence(lit(0), lit(dim - 1)), (x, i) => {
        val mn = element_at(minLit, i + 1)
        val mx = element_at(maxLit, i + 1)
        when(mx === mn, lit(0)).otherwise(
          round((x.cast("double") - mn) * 255.0 / (mx - mn)).cast("int"))
      }).alias("codes"))
    (encoded, mins, maxs)
  }

  def labelCosineSpread(embs: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val norm2 = aggregate(transform(v, x => x.cast("double") * x),
      lit(0.0), (a, x) => a + x)
    val valid = embs.filter(v.isNotNull)
      .withColumn("__n2", norm2).filter(col("__n2") > 0)
    // Normalize AFTER the explode, not inside a transform lambda: a
    // `transform(v, x -> x / sqrt(__n2))` gets its __n2 projection
    // collapsed INTO the lambda by CollapseProject, re-evaluating the
    // whole dim-element norm fold once per ELEMENT (dim² work per row —
    // measured as the dominant cost of this operator). Generate is a
    // collapse barrier, so here __n2 is computed once per row and each
    // exploded element pays one sqrt+divide.
    val sums = valid
      .select(col(labelCol), col("__n2"), posexplode(v).as(Seq("__pos", "__val")))
      .groupBy(col(labelCol), col("__pos"))
      .agg(sum(col("__val").cast("double") / sqrt(col("__n2"))).alias("__s"))
    val s2 = sums.groupBy(col(labelCol))
      .agg(sum(col("__s") * col("__s")).alias("__s2"))
    valid.groupBy(col(labelCol)).agg(count(lit(1)).alias("n"))
      .join(s2, Seq(labelCol))
      .filter(col("n") >= 2)
      .select(col(labelCol), col("n"),
        ((col("__s2") - col("n")) / (col("n") * (col("n") - lit(1))))
          .alias("mean_cos"))
  }

  // ---- binary (1-bit) quantization — the 32× embedding storage path ----

  /** Per-dimension mean thresholds for [[binaryEncode]]: bit d is set when
    * x_d exceeds the corpus mean of dimension d. Mean-thresholding (rather
    * than sign-at-zero) centers every dimension so each bit splits the
    * corpus ~50/50 even when the embedding space is not zero-centered —
    * the balanced-bit property binary Hamming search needs to be
    * discriminative. One posexplode aggregation, `dim` rows out. The mean
    * is a decimal(25,7)-summed ORDER-FREE mean (exact sum, one double
    * division) — a raw double avg's last ulp depends on merge order,
    * which could flip a bit for a component sitting exactly at the
    * threshold; this definition is bit-identical across engines/replays.
    */
  def binaryThresholds(embs: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    require(dim > 0, s"dim must be positive, got $dim")
    val means = embs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__val")))
      .groupBy(col("__pos"))
      .agg((sum(col("__val").cast("double").cast("decimal(25,7)"))
        .cast("double") / count(lit(1)).cast("double")).alias("__mean"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(means.size == dim,
      s"binaryThresholds: found means for ${means.size} of $dim dimensions " +
        "— no input row passed the isNotNull && size filter")
    Array.tabulate(dim)(means)
  }

  /** Encode each vector to `dim/64` packed 64-bit words (`code`
    * array<long>): bit i of word i/64 is `x_i > thresholds(i)`. The fold
    * adds disjoint power-of-two weights from a broadcast literal array —
    * addition IS bitwise-or here — so encoding is a narrow codegen'd
    * projection: no shuffle, no UDF, and the 1L<<63 weight wraps to
    * Long.MinValue exactly as two's-complement packing wants. 32× smaller
    * than float32: at 100 TB of embeddings the code column is ~3 TB, and
    * Hamming candidate generation scans ONLY codes.
    */
  def binaryEncode(embs: DataFrame, idCol: String, vecCol: String, dim: Int,
      thresholds: Array[Double]): DataFrame = {
    require(dim % 64 == 0, s"dim must pack into 64-bit words, got $dim")
    require(thresholds.length == dim,
      s"binaryEncode: ${thresholds.length} thresholds for dim $dim")
    val thLit = array(thresholds.map(lit): _*)
    val wLit  = array(Array.tabulate(dim)(i => lit(1L << (i % 64))): _*)
    val words = (0 until dim / 64).map { w =>
      aggregate(sequence(lit(w * 64), lit(w * 64 + 63)), lit(0L),
        (acc, i) => acc + when(
          element_at(col(vecCol), i + 1).cast("double") >
            element_at(thLit, i + 1),
          element_at(wLit, i + 1)).otherwise(lit(0L)))
    }
    embs.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol), array(words: _*).alias("code"))
  }

  /** Train thresholds AND encode in one call (train-once posture; ship the
    * returned thresholds to [[binaryEncode]] query vectors later).
    */
  def binaryQuantize(embs: DataFrame, idCol: String,
      vecCol: String = "embedding", dim: Int = 64): (DataFrame, Array[Double]) = {
    val th = binaryThresholds(embs, vecCol, dim)
    (binaryEncode(embs, idCol, vecCol, dim, th), th)
  }

  /** Hamming distance between two packed code arrays:
    * Σ bit_count(a_w xor b_w) — all codegen'd built-ins. */
  def hammingCode(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, c) => acc + c)

  /** Binary-prefiltered approximate top-k: Hamming shortlist over packed
    * 1-bit codes, exact cosine rerank of the shortlist only. Ids must be
    * numeric (castable to long) — the bounded shortlist aggregate carries
    * (score, id) pairs in a primitive buffer.
    *
    * Scale shape: phase 1 scans (id, code) — dim/8 bytes per row, 32×
    * narrower than the vectors — scoring `bit_count(xor)` against the
    * broadcast query codes; the per-query shortlist comes from the
    * bounded-buffer [[graft.functions.Aggregators.TopKByScore]] hash
    * aggregate (≤`shortlist` entries per buffer, map-side combined), so
    * only shortlist·partitions tiny rows cross the shuffle — no per-row
    * window sort of the corpus. Phase 2 joins the R×|queries| shortlist
    * (tiny, broadcast) back to the corpus to fetch ONLY shortlisted
    * vectors for the exact rescore: the full-precision column is touched
    * for R rows per query, never per corpus row. An identical planted
    * vector has Hamming 0 → survives any shortlist → cosine 1 → rank 1.
    */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, shortlist: Int = 50,
      thresholds: Option[Array[Double]] = None): DataFrame = {
    val th = thresholds.getOrElse(binaryThresholds(corpus, vecCol, dim))
    val coded = binaryEncode(corpus, idCol, vecCol, dim, th)
      .withColumnRenamed(idCol, "neighbor_id")
    binarySearch(coded, corpus, queries, idCol, vecCol, k, dim, shortlist, th)
  }

  /** Shared binary-search tail: Hamming shortlist over an already-coded
    * corpus layout (`neighbor_id`, `code`), exact cosine rescore via
    * `corpus`. [[binaryTopK]] codes in-memory; [[searchBinaryIndex]]
    * reads the coded layout from disk.
    */
  private def binarySearch(coded: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int, dim: Int,
      shortlist: Int, th: Array[Double]): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val q = binaryEncode(queries, idCol, vecCol, dim, th)
      .withColumnRenamed(idCol, "query_id")
      .withColumnRenamed("code", "__qcode")
    // score = −hamming: TopKByScore keeps the HIGHEST scores and breaks
    // ties to the smallest id, which is exactly (hamming ASC, id ASC)
    val topAgg = udaf(new graft.functions.Aggregators.TopKByScore(shortlist))
    val short = coded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", hammingCode(col("code"), col("__qcode")))
      .groupBy(col("query_id"))
      .agg(topAgg(-col("hamming").cast("double"),
        col("neighbor_id").cast("long")).alias("__top"))
      .select(col("query_id"), explode(col("__top")).alias("__e"))
      .select(col("query_id"), col("__e._2").alias("neighbor_id"),
        (-col("__e._1")).cast("long").alias("hamming"))
    val qv = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))
    val cv = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    cv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wC))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).alias("cosine"), col("hamming"))
  }

  /** Persisted binary index read back from [[buildBinaryIndex]].
    * `trainBalance` is the train-time mean bit balance — the drift
    * reference for [[binaryDriftReport]]; None on pre-r12 indexes.
    */
  final case class BinaryIndex(dim: Int, thresholds: Array[Double],
      coded: DataFrame, trainBalance: Option[Double] = None)

  /** Mean bit balance of `df` under frozen `thresholds`: the average
    * fraction of dimensions landing ABOVE their threshold. At train time
    * the thresholds are the per-dimension means, so balance sits near
    * 0.5 (stored exactly, not assumed); a shifted delivery pushes whole
    * dimensions to one side and the balance walks away — the
    * Hamming-margin collapse that silently degrades recall.
    */
  private def bitBalance(df: DataFrame, vecCol: String, dim: Int,
      thresholds: Array[Double]): Option[Double] = {
    val thLit = array(thresholds.map(lit): _*)
    val frac = aggregate(
      zip_with(col(vecCol), thLit,
        (x, t) => when(x.cast("double") > t, 1.0).otherwise(0.0)),
      lit(0.0), (a, b) => a + b) / lit(dim.toDouble)
    val r = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .agg(avg(frac)).head()
    // empty (or all-invalid-dim) frame: no balance to measure
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Persist a binary index: `path/params` holds (dim, trained
    * thresholds) as one parquet row; `path/coded` holds the packed codes
    * — (id, dim/64 longs) per vector, dim/8 bytes of payload. The encode
    * is the only full-precision pass binary search ever needs, so at
    * 100 TB it runs ONCE here; every query batch after that scans 32×
    * smaller rows. Same layout discipline as [[buildIvfPqIndex]].
    */
  def buildBinaryIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int = 64): Unit = {
    val th = binaryThresholds(corpus, vecCol, dim)
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((dim, th.toSeq, bitBalance(corpus, vecCol, dim, th).getOrElse(
        sys.error(s"buildBinaryIndex: no valid $dim-dim vector in the corpus"))))
      .toDF("dim", "thresholds", "train_balance")
      .write.mode("overwrite").parquet(s"$path/params")
    binaryEncode(corpus, idCol, vecCol, dim, th)
      .select(col(idCol).alias("id"), col("code"))
      .write.mode("overwrite").parquet(s"$path/coded")
  }

  def readBinaryIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): BinaryIndex = {
    val p = spark.read.parquet(s"$path/params").head()
    BinaryIndex(p.getAs[Int]("dim"),
      p.getAs[Seq[Double]]("thresholds").toArray,
      spark.read.parquet(s"$path/coded"),
      if (p.schema.fieldNames.contains("train_balance"))
        Some(p.getAs[Double]("train_balance")) else None)
  }

  /** Drift check of a delivery against a persisted binary index's FROZEN
    * thresholds: the delta's mean bit balance vs the train-time value
    * (alarm past `tolerance` absolute deviation). One aggregate over the
    * delta; None on pre-r12 indexes (rebuild to arm).
    */
  def binaryDriftReport(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, vecCol: String,
      tolerance: Double = 0.15): Option[IndexDriftReport] = {
    val idx = readBinaryIndex(spark, path)
    idx.trainBalance.flatMap { t =>
      // empty delta: no verdict — the append it rides on is a no-op
      bitBalance(delta, vecCol, idx.dim, idx.thresholds).map(obs =>
        IndexDriftReport("bit_balance", t, obs, math.abs(obs - t) > tolerance))
    }
  }

  /** Incremental append: encode ONLY the delta with the index's FROZEN
    * thresholds (train-once — codes stay mutually comparable across
    * deliveries; re-thresholding would silently flip bits of every
    * historical code), drop ids already present (idempotent re-delivery),
    * publish old ∪ fresh stage-and-swap so a crash leaves the previous
    * index intact and the union job's inputs are never deleted under it.
    */
  def appendToBinaryIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, idCol: String,
      vecCol: String): Option[IndexDriftReport] = {
    val idx = readBinaryIndex(spark, path)
    val report = binaryDriftReport(spark, path, delta, vecCol)
    val fresh = binaryEncode(delta, idCol, vecCol, idx.dim, idx.thresholds)
      .select(col(idCol).alias("id"), col("code"))
      .dropDuplicates("id")
      .join(idx.coded.select("id"), Seq("id"), "left_anti")
    val codedDir = new org.apache.hadoop.fs.Path(s"$path/coded")
    val fs = codedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.LakeSink.stageAndSwap(fs, codedDir) { staging =>
      idx.coded.unionByName(fresh).write.mode("overwrite").parquet(staging.toString)
    }
    report
  }

  /** [[binaryTopK]] against a PERSISTED index: thresholds come from
    * `index.thresholds`, the packed codes are read from disk, and only
    * the rescore stage touches `corpus` (full vectors fetched by
    * shortlisted id). Same output contract as [[binaryTopK]] — identical
    * parameters yield identical results.
    */
  def searchBinaryIndex(index: BinaryIndex, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      shortlist: Int = 50): DataFrame = {
    val coded = index.coded.select(col("id").alias("neighbor_id"), col("code"))
    binarySearch(coded, corpus, queries, idCol, vecCol, k, index.dim,
      shortlist, index.thresholds)
  }
}
