package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * leg of cluster-scoped curation (SemDeDup cluster scoping, cluster-
  * balanced sampling, topic discovery over a web corpus). The reference has
  * no analog (it is a tabular pandas ETL, `dags/coin_data_pipeline.py`);
  * this is north-star surface following Lloyd (1982), built the way a
  * 100 TB corpus actually trains:
  *
  *  - ASSIGNMENT reuses the codegen'd top-cell kernel
  *    ([[graft.functions.VectorFunctions.nearestCells]], a max-DOT-product
  *    scan) through the standard L2→MIPS reduction: argmin‖v−c‖² =
  *    argmax(⟨v,c⟩ − ‖c‖²/2), so vectors are augmented with a constant −1
  *    slot and centroids with ‖c‖²/2 (cf. the Shrivastava/Bachrach 2014
  *    asymmetric-transform family). The k·(dim+1) centroid array ships as
  *    a plan literal — a narrow map, no join, no shuffle of vectors, and
  *    the same kernel the IVF index probes with.
  *  - UPDATE is ONE grouped aggregation per iteration: the
  *    [[graft.functions.Aggregators.VectorMean]] buffer (map-side
  *    combined — the shuffle carries one dim-double buffer per
  *    (partition, cluster), never vectors) plus Σ‖v‖² per cluster.
  *  - INERTIA (the Lloyd's objective Σ‖v−c‖² against the ASSIGNING
  *    centroids) falls out of the same aggregation buffers by
  *    Σ_cluster ‖v−c‖² = Σ‖v‖² − 2⟨c, Σv⟩ + n‖c‖², so monotone descent
  *    is measured with zero extra passes over the data.
  *  - Driver state per iteration is one ≤ k-row collect (k·dim doubles +
  *    counts) — bounded by k, independent of corpus size. Clusters that
  *    receive no points keep their previous centroid (the standard
  *    empty-cluster rule; no resampling pass).
  *
  * Null and wrong-length vectors are excluded from fit and get a null
  * cluster in [[assign]] — consistent with [[Similarity.labelCentroids]].
  */
object Clustering {

  /** Row-major k·(dim+1) augmentation of k·dim `cents`: slot dim of row c
    * holds ‖c‖²/2, so a max-dot scan of (v, −1) against it ranks by
    * ⟨v,c⟩ − ‖c‖²/2 = (‖v‖² − ‖v−c‖²)/2 — Euclidean nearest-centroid.
    */
  private def l2Augment(cents: Array[Float], k: Int, dim: Int): Array[Float] = {
    val out = new Array[Float](k * (dim + 1))
    var c = 0
    while (c < k) {
      var n2 = 0.0
      var j = 0
      while (j < dim) {
        val cj = cents(c * dim + j)
        out(c * (dim + 1) + j) = cj
        n2 += cj.toDouble * cj
        j += 1
      }
      out(c * (dim + 1) + dim) = (n2 / 2.0).toFloat
      c += 1
    }
    out
  }

  /** `(v, −1)` augmentation as a column — stays inside codegen. */
  private def augmented(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(vec, array(lit(-1.0f)))

  /** Fitted model: `centroids` is row-major k·dim (cluster c starts at
    * c·dim), `inertia` one value per iteration (non-increasing for Lloyd's
    * on a fixed dataset), `sizes` the final per-cluster point counts.
    */
  final case class KMeansModel(centroids: Array[Float], k: Int, dim: Int,
      inertia: Seq[Double], sizes: Array[Long]) {
    /** Total within-cluster squared distance after the last update. */
    def finalInertia: Double = inertia.last
  }

  /** Deterministic initial centroids from the corpus: the `k` valid vectors
    * with the smallest values of `idCol` (one bounded ≤ k-row collect).
    * Seeding from data beats random points in space (every centroid starts
    * non-empty-able); callers with domain knowledge pass [[kMeansFit]] an
    * explicit init instead — e.g. one exemplar per known stratum.
    */
  def initFromSmallestIds(corpus: DataFrame, vecCol: String, idCol: String,
      dim: Int, k: Int): Array[Float] = {
    val rows = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .orderBy(col(idCol).asc)
      .limit(k)
      .select(col(vecCol))
      .collect()
    require(rows.length == k, s"need $k valid vectors for init, got ${rows.length}")
    val out = new Array[Float](k * dim)
    var c = 0
    while (c < k) {
      val v = rows(c).getSeq[Float](0)
      var j = 0
      while (j < dim) { out(c * dim + j) = v(j); j += 1 }
      c += 1
    }
    out
  }

  /** Lloyd's iterations from an explicit `init` (length k·dim). Each
    * iteration costs one corpus scan + one k-row collect; the centroid
    * literal re-plans per iteration (k·dim floats — fine for the k ≤ a few
    * thousand of coarse corpus clustering; a broadcast-join formulation
    * only wins when k·dim itself is too big for a plan literal).
    */
  def kMeansFit(corpus: DataFrame, vecCol: String, dim: Int, k: Int,
      iters: Int, init: Array[Float]): KMeansModel = {
    require(dim > 0 && k > 0 && iters >= 1, "dim, k, iters must be positive")
    require(init.length == k * dim,
      s"init length ${init.length} != k*dim = ${k * dim}")
    val vm = udaf(new graft.functions.Aggregators.VectorMean(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val valid = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).alias("__v"))

    var cents = init.clone()
    var sizes = new Array[Long](k)
    val inertias = Seq.newBuilder[Double]
    var it = 0
    while (it < iters) {
      val assigning = cents // stable reference for the closure-free literal
      val aug = l2Augment(assigning, k, dim)
      val rows = valid
        .select(
          element_at(VectorFunctions.nearestCells(augmented(col("__v")), aug, dim + 1, 1), 1)
            .alias("__c"),
          col("__v"),
          VectorFunctions.dotProduct(col("__v"), col("__v")).alias("__sq"))
        .groupBy(col("__c"))
        .agg(vm(col("__v")).alias("__m"), sum(col("__sq")).alias("__ssq"))
        .select(col("__c"), col("__m._1").alias("__mean"),
          col("__m._2").alias("__n"), col("__ssq"))
        .collect() // bounded: at most k rows of dim doubles

      val next = cents.clone() // empty clusters keep their centroid
      val ns = new Array[Long](k)
      var inertia = 0.0
      rows.foreach { r =>
        val c = r.getInt(0)
        val mean = r.getSeq[Double](1)
        val n = r.getLong(2)
        val ssq = r.getDouble(3)
        ns(c) = n
        // Σ‖v−c‖² over the cluster, against the centroid that assigned it:
        // Σ‖v‖² − 2⟨c, Σv⟩ + n‖c‖², with Σv = n·mean from the buffer.
        var dotCS = 0.0
        var cNorm2 = 0.0
        var j = 0
        while (j < dim) {
          val cj = assigning(c * dim + j).toDouble
          dotCS += cj * mean(j) * n
          cNorm2 += cj * cj
          j += 1
        }
        inertia += ssq - 2.0 * dotCS + n * cNorm2
        j = 0
        while (j < dim) { next(c * dim + j) = mean(j).toFloat; j += 1 }
      }
      inertias += inertia
      cents = next
      sizes = ns
      it += 1
    }
    KMeansModel(cents, k, dim, inertias.result(), sizes)
  }

  /** Persist a fitted model: one single-row parquet of (k, dim, centroids,
    * inertia, sizes) — same one-row params layout as the IVF-PQ index
    * ([[Similarity.buildIvfPqIndex]]), so a model trains once on a sample
    * epoch and assigns every later delivery with frozen centroids (codes
    * stay mutually comparable across deliveries, no retrain drift).
    */
  def saveModel(model: KMeansModel, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    Seq((model.k, model.dim, model.centroids.toSeq, model.inertia,
        model.sizes.toSeq))
      .toDF("k", "dim", "centroids", "inertia", "sizes")
      .write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): KMeansModel = {
    val r = spark.read.parquet(path).head()
    // getAs yields a mutable ArraySeq in 2.13 — convert before the
    // immutable-Seq field, or the case-class assignment throws CCE
    KMeansModel(r.getAs[scala.collection.Seq[Float]]("centroids").toArray,
      r.getAs[Int]("k"), r.getAs[Int]("dim"),
      r.getAs[scala.collection.Seq[Double]]("inertia").toSeq,
      r.getAs[scala.collection.Seq[Long]]("sizes").toArray)
  }

  /** Nearest-centroid assignment under a fitted model: adds `clusterCol`
    * (int; null for null/wrong-length vectors). A narrow codegen'd map —
    * composes with any downstream groupBy without an extra shuffle of its
    * own.
    */
  def assign(corpus: DataFrame, vecCol: String, model: KMeansModel,
      clusterCol: String = "cluster"): DataFrame = {
    val aug = l2Augment(model.centroids, model.k, model.dim)
    corpus.withColumn(clusterCol,
      when(col(vecCol).isNotNull && size(col(vecCol)) === model.dim,
        element_at(
          VectorFunctions.nearestCells(augmented(col(vecCol)), aug, model.dim + 1, 1), 1)))
  }
}
