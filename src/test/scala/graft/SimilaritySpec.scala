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

  test("PQ encode/ADC round-trip matches a driver-side reference") {
    val dim = 8; val m = 4; val dsub = dim / m; val ksub = 4
    val rnd = new java.util.Random(3L)
    val vecs = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = spark.createDataset(vecs).toDF("vec_id", "vec")
    val books = Similarity.trainPqCodebooks(df, "vec", dim, m, ksub, seed = 5L)
    books.length shouldBe m * ksub * dsub

    def norm(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // driver reference: nearest codebook entry per subspace on the
    // normalized vector, then the ADC sum via explicit lookups
    def refEncode(v: Array[Float]): Array[Byte] = {
      val nv = norm(v)
      (0 until m).map { j =>
        (0 until ksub).minBy { c =>
          (0 until dsub).map { i =>
            val d = nv(j * dsub + i).toDouble - books((j * ksub + c) * dsub + i)
            d * d
          }.sum
        }.toByte
      }.toArray
    }
    def refAdc(codes: Array[Byte], q: Array[Float]): Double = {
      val nq = norm(q)
      (0 until m).map { j =>
        (0 until dsub).map { i =>
          nq(j * dsub + i).toDouble * books((j * ksub + (codes(j) & 0xff)) * dsub + i)
        }.sum
      }.sum
    }

    val q = vecs.head._2
    val got = df
      .withColumn("codes", VectorFunctions.pqEncode(
        VectorFunctions.l2Normalize($"vec"), books, m, dsub, ksub))
      .withColumn("adc", VectorFunctions.adcDot($"codes",
        VectorFunctions.l2Normalize(typedLit(q.toSeq)), books, m, dsub, ksub))
      .select($"vec_id", $"codes", $"adc")
      .as[(Long, Array[Byte], Double)].collect().sortBy(_._1)
    got.zip(vecs).foreach { case ((_, codes, adc), (_, v)) =>
      codes shouldBe refEncode(v)
      adc shouldBe refAdc(codes, q) +- 1e-6
    }
    // an exact-duplicate query's ADC against its own codes beats unrelated
    // vectors' ADC (the shortlist property ivfPqTopK relies on)
    val self = got.head._3
    got.tail.map(_._3).max should be < self
  }

  test("PQ kernels reject dimension mismatches loudly") {
    val dim = 8; val m = 4; val dsub = 2; val ksub = 4
    val books = new Array[Float](m * ksub * dsub)
    val bad = Seq((1L, Seq.fill(5)(1.0f))).toDF("vec_id", "vec") // 5 != 8
    val e = intercept[Exception] {
      bad.select(VectorFunctions.pqEncode($"vec", books, m, dsub, ksub)).collect()
    }
    e.getMessage should include("pq_encode")
    val shortQ = Seq((1L, Array.fill[Byte](m)(0), Seq.fill(5)(1.0f)))
      .toDF("vec_id", "codes", "q")
    val e2 = intercept[Exception] {
      shortQ.select(VectorFunctions.adcDot($"codes", $"q", books, m, dsub, ksub)).collect()
    }
    e2.getMessage should include("adc_dot")
  }

  test("IVF-PQ recovers planted near-duplicate queries via the ADC shortlist") {
    val rnd  = new java.util.Random(13L)
    val base = emb.filter($"vec_id" < 30).as[(Long, Array[Float])].collect()
    val perturbed = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val queries = spark.createDataset(perturbed.toSeq).toDF("vec_id", "embedding")
    val res = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 1, dim = 64, numCells = 16, nprobe = 4, m = 8, ksub = 16)
    val hits = res.filter($"neighbor_id" === $"query_id" - 100000L).count()
    hits.toDouble / base.length should be >= 0.9
  }

  test("persisted IVF-PQ index round-trips: disk search equals the in-memory path row for row") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val queries = emb.filter($"vec_id" < 8)
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      dim = 64, numCells = 16, m = 8, ksub = 16)
    val idx = Similarity.readIvfPqIndex(spark, root)
    idx.dim shouldBe 64
    idx.centroids.length shouldBe 16 * 64
    idx.codebooks.length shouldBe 8 * 16 * 8
    idx.coded.count() shouldBe emb.count() // one coded row per vector

    val viaDisk = Similarity.searchIvfPqIndex(idx, emb, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val direct = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, numCells = 16, nprobe = 4, m = 8, ksub = 16)
    viaDisk.count() shouldBe direct.count()
    viaDisk.except(direct).count() shouldBe 0
    direct.except(viaDisk).count() shouldBe 0
  }

  test("incremental IVF-PQ append: delta searchable under frozen models, redelivery idempotent") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq_append").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      dim = 64, numCells = 16, m = 8, ksub = 16)
    val n0 = Similarity.readIvfPqIndex(spark, root).coded.count()
    n0 shouldBe emb.count()

    // delivery 2: planted twins of the queries PLUS a redelivered slice of
    // the already-indexed base — models must NOT retrain
    val queries = emb.filter($"vec_id" < 8)
    val planted = queries.withColumn("vec_id", $"vec_id" + 1000L)
    val delta = planted.unionByName(emb.limit(20))
    Similarity.appendToIvfPqIndex(spark, root, delta, "vec_id", "embedding")
    val idx = Similarity.readIvfPqIndex(spark, root)
    idx.coded.count() shouldBe emb.count() + 8 // dedup-on-write: redelivery adds nothing

    // the appended twins are searchable: each query finds its planted copy
    // at rank 1 through codes produced by the FROZEN codebooks
    val corpus = emb.unionByName(planted)
    val hits = Similarity.searchIvfPqIndex(idx, corpus, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .filter($"neighbor_id" === $"query_id" + 1000L)
    hits.count() shouldBe 8
    hits.filter($"rank" === 1).count() shouldBe 8

    // re-appending the identical delta is a no-op (idempotent deliveries)
    Similarity.appendToIvfPqIndex(spark, root, delta, "vec_id", "embedding")
    Similarity.readIvfPqIndex(spark, root).coded.count() shouldBe emb.count() + 8
  }

  test("prebuilt centroids/codebooks skip the training scans (train once, reuse)") {
    val scans = spark.sparkContext.longAccumulator("corpus-row-scans")
    val bump  = udf { (_: Long) => scans.add(1L); true }
    val spied = emb.filter(bump($"vec_id"))
    val n     = emb.count()

    val cents = Similarity.trainIvfCentroids(spied, "embedding", dim = 64, numCells = 8)
    val trainScans = scans.value.longValue() // count + sample collect ≈ 2n
    trainScans should be >= n

    val queries = emb.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 500L)
    Similarity.ivfTopK(spied, queries, "vec_id", "embedding", k = 3, dim = 64,
      nprobe = 4, centroids = Some(cents)).count()
    val batch1 = scans.value.longValue() - trainScans
    Similarity.ivfTopK(spied, queries, "vec_id", "embedding", k = 3, dim = 64,
      nprobe = 4, centroids = Some(cents)).count()
    val batch2 = scans.value.longValue() - trainScans - batch1
    // each prebuilt batch reads the corpus for cell assignment only — an
    // inline retrain would add the count()+sample scans (≈2n) on top
    batch1 should be < 2L * n
    batch2 should be < 2L * n
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

  test("label cosine spread equals the brute-force pairwise mean, no pairwise join") {
    val rnd = new scala.util.Random(11)
    def vec(base: Array[Float], noise: Float) =
      base.map(x => x + noise * rnd.nextFloat()).toSeq
    val tightBase = Array.fill(8)(rnd.nextFloat())
    val rows =
      (0 until 10).map(i => (1, vec(tightBase, 0.05f))) ++        // tight cluster
      (0 until 10).map(i => (2, Array.fill(8)(rnd.nextFloat() - 0.5f).toSeq)) ++ // spread
      Seq((3, Seq.fill(8)(0f)),                                   // zero vector: excluded
          (1, null.asInstanceOf[Seq[Float]]))                     // null: excluded
    val df = rows.toDF("label", "embedding")
    val out = Similarity.labelCosineSpread(df)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    out.keySet shouldBe Set(1, 2)   // label 3 has < 2 valid vectors
    out(1)._1 shouldBe 10L          // null row excluded from n
    // brute-force reference for label 1
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val tight = rows.collect { case (1, v) if v != null => v }
    val pairs = for (i <- tight.indices; j <- tight.indices if i != j) yield cos(tight(i), tight(j))
    out(1)._2 shouldBe (pairs.sum / pairs.size) +- 1e-9
    // a tight cluster is more compact than random noise
    out(1)._2 should be > out(2)._2
  }

  test("int8 scalar quantization: hand-computed codes, constant dims, error bound holds") {
    import spark.implicits._
    // dim 0 spans [0,10], dim 1 is CONSTANT (5), dim 2 spans [-1,1]
    val embs = Seq(
      (1L, Seq(0f, 5f, -1f)),
      (2L, Seq(10f, 5f, 1f)),
      (3L, Seq(5f, 5f, 0f)),
      (4L, null.asInstanceOf[Seq[Float]]),
      (5L, Seq(1f, 2f))          // wrong dim: excluded
    ).toDF("vec_id", "embedding")
    val (encoded, mins, maxs) = Similarity.scalarQuantize(embs, "vec_id", dim = 3)
    mins.toSeq shouldBe Seq(0.0, 5.0, -1.0)
    maxs.toSeq shouldBe Seq(10.0, 5.0, 1.0)
    val codes = encoded.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes(1L) shouldBe Seq(0, 0, 0)       // mins everywhere; constant dim -> 0
    codes(2L) shouldBe Seq(255, 0, 255)   // maxs everywhere
    codes(3L) shouldBe Seq(128, 0, 128)   // midpoints round half-up
    codes.keySet shouldBe Set(1L, 2L, 3L) // null and wrong-dim excluded

    // dequantization error bound: |x̂ − x| ≤ (max−min)/510 per component
    codes.foreach { case (id, cs) =>
      val x = embs.filter($"vec_id" === id).head().getSeq[Float](1)
      cs.indices.foreach { d =>
        val span = maxs(d) - mins(d)
        val xhat = if (span == 0) mins(d) else mins(d) + cs(d) * span / 255.0
        math.abs(xhat - x(d)) should be <= (span / 510.0 + 1e-9)
      }
    }
  }

  test("binary quantization: packing matches a driver-side bit-for-bit reference") {
    val (coded, th) = Similarity.binaryQuantize(emb, "vec_id", dim = 64)
    th.length shouldBe 64
    val got = coded.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val raw = emb.as[(Long, Array[Float])].collect()
    raw.foreach { case (id, v) =>
      var word = 0L
      v.indices.foreach { i =>
        if (v(i).toDouble > th(i)) word |= (1L << i)
      }
      got(id) shouldBe Seq(word)
    }
    // mean-thresholding balances bits: global popcount is near dim/2 per row
    val totalBits = got.values.map(_.map(java.lang.Long.bitCount(_).toLong).sum).sum
    val mean = totalBits.toDouble / got.size
    mean should be > 16.0
    mean should be < 48.0
  }

  test("binary quantization: multi-word packing and the 1L<<63 sign-bit wrap") {
    import spark.implicits._
    // dim 128 → two words; component 63 above threshold exercises the
    // Long.MinValue weight, component 64 lands in word 1 bit 0
    val v1 = Array.tabulate(128)(i => if (i == 63 || i == 64) 1f else -1f)
    val v2 = Array.fill(128)(-1f)
    val embs = Seq((1L, v1.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
    val coded = Similarity.binaryEncode(embs, "vec_id", "embedding", 128,
      Array.fill(128)(0.0))
    val got = coded.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    got(1L) shouldBe Seq(Long.MinValue, 1L)
    got(2L) shouldBe Seq(0L, 0L)
    val h = Seq((got(1L), got(2L))).toDF("a", "b")
      .select(Similarity.hammingCode(col("a"), col("b")).alias("h"))
      .as[Long].head()
    h shouldBe 2L
  }

  test("binaryTopK: planted identical vector survives the Hamming shortlist at rank 1") {
    val queries = emb.filter($"vec_id" < 5)
    val planted = queries.withColumn("vec_id", $"vec_id" + 1000000L)
    val out = Similarity.binaryTopK(emb.unionByName(planted), queries,
        "vec_id", "embedding", k = 5, dim = 64, shortlist = 50)
    val top = out.filter($"rank" === 1)
      .select("query_id", "neighbor_id", "cosine", "hamming")
      .as[(Long, Long, Double, Long)].collect()
    top.length shouldBe 5
    top.foreach { case (q, n, c, h) =>
      n shouldBe q + 1000000L
      c shouldBe 1.0 +- 1e-6
      h shouldBe 0L
    }
    // every query gets exactly k ranked rows, ranks contiguous
    val perQ = out.groupBy("query_id").agg(count(lit(1)).alias("n"),
        max($"rank").alias("mx"))
      .as[(Long, Long, Int)].collect()
    perQ.foreach { case (_, n, mx) => n shouldBe 5L; mx shouldBe 5 }
  }

  test("binaryTopK: Hamming shortlist carries useful recall vs exact brute force") {
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.binaryTopK(emb, queries, "vec_id", "embedding",
        k = 5, dim = 64, shortlist = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // isotropic random corpus is the HARDEST case for 1-bit codes; demand
    // aggregate recall strictly better than the ~5/n random-shortlist floor
    val hits = exact.map { case (q, ids) => (ids & approx(q)).size }.sum
    hits should be >= 5
  }

  test("binary index: disk round trip equals the in-memory path; append freezes thresholds") {
    val path = java.nio.file.Files.createTempDirectory("binidx").toString
    val queries = emb.filter($"vec_id" < 3)
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", path, dim = 64)
    val idx = Similarity.readBinaryIndex(spark, path)
    idx.dim shouldBe 64
    idx.thresholds shouldBe Similarity.binaryThresholds(emb, "embedding", 64)
    // disk path == in-memory path row for row (same thresholds by
    // construction: binaryTopK trains on the same corpus)
    val fromDisk = Similarity.searchBinaryIndex(idx, emb, queries,
        "vec_id", "embedding", k = 5, shortlist = 50)
      .select("query_id", "rank", "neighbor_id", "cosine", "hamming")
      .collect().map(_.toSeq).toSeq
    val inMem = Similarity.binaryTopK(emb, queries, "vec_id", "embedding",
        k = 5, dim = 64, shortlist = 50)
      .select("query_id", "rank", "neighbor_id", "cosine", "hamming")
      .collect().map(_.toSeq).toSeq
    fromDisk.sortBy(_.toString) shouldBe inMem.sortBy(_.toString)

    // append: planted twins + a redelivered slice — delta-only encode
    // under the FROZEN thresholds, dedup-on-write
    val planted = queries.withColumn("vec_id", $"vec_id" + 1000000L)
    Similarity.appendToBinaryIndex(spark, path,
      planted.unionByName(emb.filter($"vec_id" < 50)), "vec_id", "embedding")
    val idx2 = Similarity.readBinaryIndex(spark, path)
    idx2.thresholds shouldBe idx.thresholds
    idx2.coded.count() shouldBe emb.count() + 3
    val top = Similarity.searchBinaryIndex(idx2,
        emb.unionByName(planted), queries, "vec_id", "embedding", k = 5)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id", "hamming")
      .as[(Long, Long, Long)].collect()
    top.length shouldBe 3
    top.foreach { case (q, n, h) => n shouldBe q + 1000000L; h shouldBe 0L }
  }

  test("binary quantization: input validation") {
    intercept[IllegalArgumentException] {
      Similarity.binaryEncode(emb.toDF(), "vec_id", "embedding", 60,
        Array.fill(60)(0.0))
    }
    intercept[IllegalArgumentException] {
      Similarity.binaryTopK(emb.toDF(), emb.limit(1).toDF(), "vec_id",
        "embedding", k = 10, dim = 64, shortlist = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.binaryThresholds(emb.filter($"vec_id" < 0).toDF(), "embedding", 64)
    }
  }

  test("frozen-index drift alarm: in-distribution delivery quiet, shifted delivery fires, appends report") {
    val pqPath = java.nio.file.Files.createTempDirectory("graft-drift-pq").toString
    val binPath = java.nio.file.Files.createTempDirectory("graft-drift-bin").toString
    val train = emb.filter($"vec_id" % 2 === 0)
    val inDist = emb.filter($"vec_id" % 2 === 1)
    val shifted = inDist.withColumn("vec_id", $"vec_id" + 10000000L)
      .withColumn("embedding", transform($"embedding",
        x => (x * lit(0.05) + lit(3.0)).cast("float")))
    Similarity.buildIvfPqIndex(train.toDF(), "vec_id", "embedding", pqPath,
      dim = 64, numCells = 16, m = 8, ksub = 16)
    Similarity.buildBinaryIndex(train.toDF(), "vec_id", "embedding", binPath,
      dim = 64)
    // train-time references persisted and read back
    val idx = Similarity.readIvfPqIndex(spark, pqPath)
    idx.trainSelfAdc shouldBe defined
    idx.trainCellShare shouldBe defined
    Similarity.readBinaryIndex(spark, binPath).trainBalance shouldBe defined

    // an in-distribution APPEND reports, and stays quiet on every metric
    val quietPq = Similarity.appendToIvfPqIndex(spark, pqPath, inDist.toDF(),
      "vec_id", "embedding")
    quietPq.map(_.metric).sorted shouldBe Seq("cell_share", "self_adc")
    quietPq.foreach(r => withClue(r) { r.drifted shouldBe false })
    val quietBin = Similarity.appendToBinaryIndex(spark, binPath,
      inDist.toDF(), "vec_id", "embedding")
    quietBin shouldBe defined
    quietBin.get.drifted shouldBe false
    // the in-dist balance sits near the trained one
    math.abs(quietBin.get.observed - quietBin.get.trained) should be < 0.05

    // the planted shift collapses toward one direction: the coarse-cell
    // share and the bit balance both fire (report, not retrain — the
    // frozen models are untouched)
    val firedPq = Similarity.ivfPqDriftReports(spark, pqPath,
      shifted.toDF(), "embedding")
    firedPq.find(_.metric == "cell_share").get.drifted shouldBe true
    firedPq.find(_.metric == "cell_share").get.observed should be > 0.9
    val firedBin = Similarity.binaryDriftReport(spark, binPath,
      shifted.toDF(), "embedding")
    firedBin.get.drifted shouldBe true
    firedBin.get.observed should be > 0.9
    // the models really are untouched: search still answers from them
    Similarity.readIvfPqIndex(spark, pqPath).centroids shouldBe idx.centroids
  }
}
