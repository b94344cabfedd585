package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  private def planted(n: Int, dim: Int, k: Int, spread: Float): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val g = i % k
      // deterministic small jitter inside each planted cluster
      val v = (0 until dim).map(j => g * spread + ((i * 31 + j * 7) % 10) * 0.01f)
      (i.toLong, v)
    }

  test("kMeansFit recovers well-separated planted clusters exactly") {
    val dim = 4
    val df = planted(60, dim, 3, spread = 100f).toDF("id", "vec")
    val init = Clustering.initFromSmallestIds(df, "vec", "id", dim, k = 3)
    val m = Clustering.kMeansFit(df, "vec", dim, k = 3, iters = 3, init)

    m.sizes.toSeq shouldBe Seq(20L, 20L, 20L)
    // init row c came from id=c whose planted group is c — exact recovery
    // means every point's cluster equals its planted group
    val assigned = Clustering.assign(df, "vec", m)
      .select(col("id"), col("cluster"))
      .filter(col("cluster") =!= pmod(col("id"), lit(3)).cast("int"))
    assigned.count() shouldBe 0L
  }

  test("inertia is non-increasing across Lloyd's iterations") {
    val dim = 3
    // two true clusters, k=2 but a deliberately bad init: both seeds in the
    // same planted cluster — Lloyd's must still descend monotonically
    val df = planted(40, dim, 2, spread = 10f).toDF("id", "vec")
    val rows = df.filter(col("id").isin(0L, 2L)).orderBy("id")
      .select("vec").as[Seq[Float]].collect()
    val init = rows.flatten.toArray
    val m = Clustering.kMeansFit(df, "vec", dim, k = 2, iters = 4, init)
    m.inertia.size shouldBe 4
    m.inertia.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-6 }
    // and the final partition still splits the two planted groups
    Clustering.assign(df, "vec", m).select(countDistinct(col("cluster")))
      .head().getLong(0) shouldBe 2L
  }

  test("empty clusters keep their previous centroid; null/bad vectors excluded") {
    val dim = 2
    val data = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.1f, 0f)),
      (2L, null.asInstanceOf[Seq[Float]]),      // null: excluded
      (3L, Seq(1f, 2f, 3f)),                    // wrong length: excluded
      (4L, Seq(0f, 0.1f)))
    val df = data.toDF("id", "vec")
    // second centroid far from every point: receives nothing, must persist
    val init = Array(0f, 0f, 500f, 500f)
    val m = Clustering.kMeansFit(df, "vec", dim, k = 2, iters = 2, init)
    m.sizes.toSeq shouldBe Seq(3L, 0L)
    m.centroids(2) shouldBe 500f
    m.centroids(3) shouldBe 500f
    // assign: valid rows -> cluster 0, invalid -> null
    val out = Clustering.assign(df, "vec", m).select("id", "cluster")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    out(0L) shouldBe 0
    out(2L) shouldBe -1
    out(3L) shouldBe -1
  }

  test("saveModel/loadModel round-trips and frozen assignment matches") {
    val dim = 3
    val df = planted(30, dim, 3, spread = 50f).toDF("id", "vec")
    val init = Clustering.initFromSmallestIds(df, "vec", "id", dim, k = 3)
    val m = Clustering.kMeansFit(df, "vec", dim, k = 3, iters = 2, init)
    val path = java.nio.file.Files.createTempDirectory("kmeans").toString + "/model"
    Clustering.saveModel(m, path)
    val back = Clustering.loadModel(spark, path)
    back.k shouldBe m.k
    back.dim shouldBe m.dim
    back.centroids.toSeq shouldBe m.centroids.toSeq
    back.inertia shouldBe m.inertia
    back.sizes.toSeq shouldBe m.sizes.toSeq
    val a = Clustering.assign(df, "vec", m).select("id", "cluster").collect().toSeq
    val b = Clustering.assign(df, "vec", back).select("id", "cluster").collect().toSeq
    a should contain theSameElementsAs b
  }

  test("initFromSmallestIds takes the k smallest valid ids in order") {
    val df = Seq(
      (5L, Seq(5f, 5f)), (1L, Seq(1f, 1f)),
      (3L, null.asInstanceOf[Seq[Float]]), (2L, Seq(2f, 2f)))
      .toDF("id", "vec")
    val init = Clustering.initFromSmallestIds(df, "vec", "id", dim = 2, k = 2)
    init.toSeq shouldBe Seq(1f, 1f, 2f, 2f)
  }
}
