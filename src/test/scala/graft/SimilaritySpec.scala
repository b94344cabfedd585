package graft

import graft.functions.{VectorFunctions, VectorKernels}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine expression matches a reference implementation (codegen path)") {
    val rows = emb.limit(10).as[(Long, Array[Float])].collect()
    val df = Seq((rows(0)._2, rows(1)._2)).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSim($"a", $"b")).as[Double].head()
    got shouldBe cosine(rows(0)._2, rows(1)._2) +- 1e-12
  }

  test("cosine expression handles nulls and zero vectors") {
    val df = Seq(
      (Some(Array(1f, 0f)), Some(Array(0f, 1f))),
      (None: Option[Array[Float]], Some(Array(1f, 1f))),
      (Some(Array(0f, 0f)), Some(Array(1f, 1f)))
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.cosineSim($"a", $"b").alias("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    out(0) shouldBe Some(0.0)
    out(1) shouldBe None
    out(2) shouldBe Some(0.0)
  }

  test("brute-force top-k agrees with a driver-side exact computation") {
    val all = emb.as[(Long, Array[Float])].collect().toMap
    val queries = emb.filter($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    (0L until 3L).foreach { q =>
      val expect = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(all(q), v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5).map(_._1)
      got(q) shouldBe expect
    }
  }

  test("LSH top-k recovers planted near-duplicate queries (the scale use case)") {
    // The fixture embeddings are isotropic gaussians — real ANN workloads have
    // structure. Plant it: queries are lightly-perturbed copies of corpus
    // vectors (cosine ≈ 0.995); LSH must route each query to its source.
    val rnd = new java.util.Random(7L)
    val base = emb.filter($"vec_id" < 30).as[(Long, Array[Float])].collect()
    val perturbed = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val queries = spark.createDataset(perturbed.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 1, dim = 64, bits = 10, probeBits = 6)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .count()
    hits.toDouble / base.length should be >= 0.6

    // Brute force finds every planted source (sanity bound for the same task).
    val exactHits = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .filter($"neighbor_id" === $"query_id" - 100000L).count()
    exactHits shouldBe base.length.toLong
  }

  test("LSH path scans buckets, not the cross product") {
    val plan = Similarity.lshTopK(emb, emb.limit(5), "vec_id", "embedding",
      k = 3, dim = 64).queryExecution.executedPlan.toString()
    plan.toLowerCase should not include "cartesian"
    plan should include("hyperplanelsh")
  }

  test("IVF top-k routes planted near-duplicate queries to their source") {
    val rnd  = new java.util.Random(11L)
    val base = emb.filter($"vec_id" < 30).as[(Long, Array[Float])].collect()
    val perturbed = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val queries = spark.createDataset(perturbed.toSeq).toDF("vec_id", "embedding")
    // A barely-perturbed query lands in (or probes into) its source's cell.
    val hits = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 1, dim = 64, numCells = 16, nprobe = 4)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .count()
    hits.toDouble / base.length should be >= 0.9
  }

  test("IVF path probes cells, not the cross product") {
    val plan = Similarity.ivfTopK(emb, emb.limit(5), "vec_id", "embedding",
      k = 3, dim = 64, numCells = 8, nprobe = 2).queryExecution.executedPlan.toString()
    plan.toLowerCase should not include "cartesian"
    plan should include("nearestcells")
  }

  test("hyperplane bucket is deterministic across invocations") {
    val b1 = emb.select(Similarity.hyperplaneBucket($"embedding", 64, 12, 42L)).collect()
    val b2 = emb.select(Similarity.hyperplaneBucket($"embedding", 64, 12, 42L)).collect()
    b1 shouldBe b2
  }

  test("label centroids equal a driver-side exact mean; bad vectors skipped") {
    val rows = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f)),
      (1, null.asInstanceOf[Seq[Float]]), // skipped, not averaged as zeros
      (2, Seq(1.0f))                      // wrong length: skipped → empty
    ).toDF("label", "vec")
    val out = Similarity.labelCentroids(rows, "label", "vec", dim = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getSeq[Double](1), r.getLong(2)))).toMap
    out(0)._1 shouldBe Seq(2.0, 3.0)
    out(1)._1 shouldBe Seq(10.0, 20.0)
    out(2)._1 shouldBe Seq.empty
    out(0)._2 shouldBe 2L
    // n comes from the pooled buffer: null AND wrong-length rows excluded,
    // so centroid * n reconstructs the pooled sum (label 2 pooled nothing)
    out(1)._2 shouldBe 1L
    out(2)._2 shouldBe 0L

    // corpus-scale agreement with an independent per-dimension average
    val labeled = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.labelCentroids(labeled, "label", "embedding", dim = 64)
      .select($"label", posexplode($"centroid").as(Seq("pos", "c")))
    val ref = labeled.select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos").agg(avg($"v".cast("double")).alias("r"))
    cents.join(ref, Seq("label", "pos"))
      .filter(abs($"c" - $"r") > 1e-9).count() shouldBe 0L
  }
}
