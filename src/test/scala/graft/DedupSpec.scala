package graft

import graft.functions.TextKernels
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  test("exact dedup removes full duplicates") {
    val doubled = docs.unionByName(docs)
    Dedup.exact(doubled, Seq("doc_id", "text")).count() shouldBe docs.count()
    Dedup.exactByContent(doubled).count() shouldBe
      docs.select(lower(trim($"text"))).distinct().count()
  }

  test("minhash LSH recovers every planted exact duplicate with jaccard 1.0") {
    val planted = docs.filter($"doc_id" < 20).withColumn("doc_id", $"doc_id" + 1000000L)
    val pairs = Dedup.minhashLshPairs(docs.unionByName(planted), "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, minJaccard = 0.8)
    val exactPairs = pairs
      .filter($"id_b" === $"id_a" + 1000000L && $"jaccard" === 1.0)
      .count()
    exactPairs shouldBe 20L
  }

  test("minhash LSH plan contains no cartesian product") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    val physical = pairs.queryExecution.executedPlan.toString()
    physical.toLowerCase should not include "cartesian"
    physical.toLowerCase should not include "broadcastnestedloop"
  }

  test("simhash: identical docs collide; unrelated docs differ") {
    val withHash = Dedup.withSimhash(docs)
    val h = withHash.filter($"doc_id".isin(0L, 1L)).orderBy("doc_id")
      .select("simhash").as[Long].collect()
    h(0) should not be h(1)

    val dup = docs.filter($"doc_id" === 0L)
      .withColumn("doc_id", lit(7777L))
    val both = Dedup.withSimhash(docs.filter($"doc_id" === 0L).unionByName(dup))
      .select("simhash").as[Long].collect()
    both(0) shouldBe both(1)
  }

  test("simhash hamming distance is small for near-duplicates") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val hs = Dedup.withSimhash(df).orderBy("doc_id").select("simhash").as[Long].collect()
    TextKernels.hamming64(hs(0), hs(1)) should be <= 12
  }

  test("ngram Jaccard finds planted duplicates at threshold 0.9") {
    val planted = docs.filter($"doc_id" < 10).withColumn("doc_id", $"doc_id" + 1000000L)
    val pairs = Dedup.ngramJaccardPairs(docs.unionByName(planted), "doc_id", "text",
      n = 3, minJaccard = 0.9)
    pairs.filter($"id_b" === $"id_a" + 1000000L).count() shouldBe 10L
  }

  test("embedding near-dup finds planted identical vectors, no cartesian") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id" < 10).withColumn("vec_id", $"vec_id" + 1000000L)
    val pairs = Dedup.embeddingNearDupPairs(emb.unionByName(planted), "vec_id", "embedding",
      dim = 64, planeBits = 12, minCosine = 0.999)
    pairs.filter($"id_b" === $"id_a" + 1000000L).count() shouldBe 10L
    pairs.queryExecution.executedPlan.toString().toLowerCase should not include "cartesian"
  }

  test("connected components collapses transitive near-dup chains") {
    import spark.implicits._
    // chain 1-2-3-4 plus isolated pair 10-11, and 20-21-22 star
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    comps(1L) shouldBe 1L
    comps(2L) shouldBe 1L
    comps(3L) shouldBe 1L
    comps(4L) shouldBe 1L
    comps(10L) shouldBe 10L
    comps(11L) shouldBe 10L
    comps(21L) shouldBe 20L
    comps(22L) shouldBe 20L
  }

  test("pointer doubling: a 200-deep chain converges in O(log n) rounds") {
    import spark.implicits._
    // one-hop min propagation needs ~200 rounds here; doubling needs ~8
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxIter = 12,
        smallGraphThreshold = 0L) // force the distributed loop
      .select($"component").distinct().as[Long].collect()
    comps shouldBe Array(0L)
  }

  test("distributed loop, reliable checkpoint, and union-find paths agree") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 10L)).toDF("id_a", "id_b")
    val viaUnionFind = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val viaDistributed = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val viaReliable = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    viaDistributed shouldBe viaUnionFind
    viaReliable shouldBe viaUnionFind
    viaUnionFind shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 30L -> 10L)
  }

  test("mixed-width id columns skip the union-find fast path, labels stay exact") {
    import spark.implicits._
    // id_a int, id_b long with a value beyond int range: the narrow-cast
    // fast path would truncate it — must route to the distributed loop
    val pairs = Seq((1, 5000000000L), (2, 3L)).toDF("id_a", "id_b")
      .select($"id_a".cast("int").alias("id_a"), $"id_b".alias("id_b"))
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong)).toMap
    comps(5000000000L) shouldBe 1L
    comps(1L) shouldBe 1L
    comps(3L) shouldBe 2L
  }

  test("property: component labels are the true minimum over a random graph") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val edgeGen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.filter(e => e._1 != e._2))
    val prop = Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        // force the distributed loop — the driver union-find path is the
        // in-test reference below, so it must not be the implementation too
        val comps = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
            smallGraphThreshold = 0L)
          .as[(Long, Long)].collect().toMap
        // reference union-find on the driver
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map { n =>
          val members = nodes.filter(m => find(m) == find(n))
          n -> members.min
        }.toMap
        nodes.forall(n => comps(n) == want(n))
      }
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
      .passed shouldBe true
  }

  // ---------------- kernel-level algebraic properties (ScalaCheck) --------

  private def ints(xs: Seq[Int]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
  private def sig(xs: Seq[Int], k: Int): Seq[Int] =
    TextKernels.minhashSignature(ints(xs.distinct), k).toIntArray().toSeq

  test("property: minhash signature of a union is the elementwise min of signatures") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val setGen = Gen.nonEmptyListOf(Gen.choose(Int.MinValue, Int.MaxValue))
    val prop = Prop.forAll(setGen, setGen) { (a, b) =>
      val k = 16
      val union = (a ++ b).distinct
      sig(union, k) == sig(a, k).zip(sig(b, k)).map { case (x, y) => math.min(x, y) }
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
      .passed shouldBe true
  }

  test("hot bucket: 10k identical docs yield star pairs, not k-squared") {
    import spark.implicits._
    // 10k copies of one doc (every band collides → one 10k bucket per band)
    // plus a small distinct near-dup pair that must still be found all-pairs.
    val hot = spark.range(10000).select($"id".alias("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again and again").alias("text"))
    val tail = Seq(
      (20001L, "completely different text about spark shuffles and parquet files"),
      (20002L, "completely different text about spark shuffles and parquet files")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(hot.unionByName(tail), "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 3, minJaccard = 0.9,
      maxBucketSize = 64)
    val n = pairs.count()
    // star cap: k−1 pairs for the hot cluster (+1 for the tail pair), never
    // the ~50M all-pairs rows of an uncapped 10k bucket
    n shouldBe 10000L
    // the cap is audited, not silent: star pairs carry capped=true, the
    // small-bucket tail pair capped=false
    pairs.filter($"capped").count() shouldBe 9999L
    pairs.filter(!$"capped").count() shouldBe 1L
    // connectivity is preserved: connected components still collapses the
    // whole hot cluster to one representative
    val comps = Dedup.connectedComponents(pairs.select($"id_a", $"id_b"))
      .select($"component").distinct().as[Long].collect().sorted
    comps shouldBe Array(0L, 20001L)
    // and the oversized buckets are visible to the audit surface
    val flagged = Dedup.bucketStats(hot.unionByName(tail), "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 3, maxBucketSize = 64)
      .filter($"over_cap").count()
    flagged shouldBe 8L // one hot bucket per band
  }

  test("property: jaccard over hashed shingle sets is reflexive, symmetric, bounded") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, minJaccard = 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val bounded = pairs.values.forall(j => j >= 0.0 && j <= 1.0)
      // identical texts (if the generator repeats one) must score exactly 1.0
      val dupExact = texts.zipWithIndex.combinations(2).forall {
        case Seq((t1, i1), (t2, i2)) if t1 == t2 =>
          pairs.get((math.min(i1, i2).toLong, math.max(i1, i2).toLong)).forall(_ == 1.0)
        case _ => true
      }
      bounded && dupExact
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
      .passed shouldBe true
  }

  test("incremental dedup: batches accept only unseen content, index grows, rerun is a no-op") {
    val empty = docs.filter(lit(false)).select(md5($"text").alias("fp"))
    val batch1 = docs.filter($"doc_id" < 50)
    val r1 = Dedup.incremental(batch1, empty, "doc_id")
    r1.accepted.count() shouldBe
      batch1.select(lower(trim($"text"))).distinct().count()
    r1.updatedIndex.count() shouldBe r1.accepted.count()

    // batch 2 = 30 docs already delivered + 20 genuinely new → only the new
    // 20 survive, and within-batch duplicates collapse to the min id first
    val renumbered = docs.filter($"doc_id" >= 50 && $"doc_id" < 70)
    val batch2 = batch1.filter($"doc_id" < 30)
      .unionByName(renumbered)
      .unionByName(renumbered.withColumn("doc_id", $"doc_id" + 5000L)) // in-batch dups
    val r2 = Dedup.incremental(batch2, r1.updatedIndex, "doc_id")
    val acceptedIds = r2.accepted.select($"doc_id").as[Long].collect().sorted
    acceptedIds shouldBe (50L until 70L).toArray // min-id survivors, no 5000s
    r2.updatedIndex.count() shouldBe r1.updatedIndex.count() + 20

    // idempotent: re-delivering batch 2 against the updated index accepts 0
    val r3 = Dedup.incremental(batch2, r2.updatedIndex, "doc_id")
    r3.accepted.count() shouldBe 0L
    r3.updatedIndex.count() shouldBe r2.updatedIndex.count()

    // null-text docs fingerprint as empty content — accepted once, then
    // recognized on rerun (a NULL fp would be re-accepted forever)
    val nulls = Seq((9001L, null.asInstanceOf[String]), (9002L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rn = Dedup.incremental(nulls, r3.updatedIndex, "doc_id")
    rn.accepted.select($"doc_id").as[Long].collect() shouldBe Array(9001L)
    Dedup.incremental(nulls, rn.updatedIndex, "doc_id").accepted.count() shouldBe 0L

    an[IllegalArgumentException] should be thrownBy
      Dedup.incremental(batch1, batch1, "doc_id") // wrong index schema
  }

  test("bloom-prefiltered incremental dedup is exactly the plain path") {
    val index = docs.filter($"doc_id" % 3 === 0)
      .select(md5(coalesce(lower(trim($"text")), lit(""))).alias("fp"))
      .distinct()
    val plain = Dedup.incremental(docs, index, "doc_id")
    // deliberately undersized filter: fpp degrades, results must not
    val bloom = Dedup.incrementalBloom(docs, index, "doc_id",
      expectedItems = 64, fpp = 0.2)
    bloom.accepted.select($"doc_id").as[Long].collect().sorted shouldBe
      plain.accepted.select($"doc_id").as[Long].collect().sorted
    bloom.updatedIndex.count() shouldBe plain.updatedIndex.count()

    // empty index: the filter build yields no bloom; everything is new
    val empty = docs.filter(lit(false)).select(md5($"text").alias("fp"))
    Dedup.incrementalBloom(docs, empty, "doc_id").accepted.count() shouldBe
      Dedup.incremental(docs, empty, "doc_id").accepted.count()

    // idempotency carries over: replaying the batch accepts nothing
    Dedup.incrementalBloom(docs, bloom.updatedIndex, "doc_id")
      .accepted.count() shouldBe 0L

    an[IllegalArgumentException] should be thrownBy
      Dedup.incrementalBloom(docs, index, "doc_id", fpp = 1.5)
  }

  test("incremental near-dup: paraphrased twins rejected against the signature index") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (200 until 240).map(i => s"w$i").mkString(" ")
    val emptyIdx = Seq.empty[(Long, Seq[Int])].toDF("id", "sig")

    // bootstrap: two distinct docs + an in-batch near-dup of the first
    val b1 = Seq((10L, base), (20L, other), (30L, base + " tiny tail")).toDF("doc_id", "text")
    val r1 = Dedup.incrementalNearDup(b1, emptyIdx, "doc_id")
    r1.accepted.select($"doc_id").as[Long].collect().sorted shouldBe Array(10L, 20L)
    r1.updatedIndex.count() shouldBe 2L // index carries only survivors

    // next delivery: paraphrased twin of indexed content rejected, novel kept
    val b2 = Seq(
      (40L, base + " appended bits"),                     // near-dup of indexed 10
      (50L, (500 until 540).map(i => s"w$i").mkString(" ")) // genuinely new
    ).toDF("doc_id", "text")
    val r2 = Dedup.incrementalNearDup(b2, r1.updatedIndex, "doc_id")
    r2.accepted.select($"doc_id").as[Long].collect() shouldBe Array(50L)
    r2.updatedIndex.count() shouldBe 3L

    // idempotent: replaying delivery 2 accepts nothing
    Dedup.incrementalNearDup(b2, r2.updatedIndex, "doc_id")
      .accepted.count() shouldBe 0L

    an[IllegalArgumentException] should be thrownBy
      Dedup.incrementalNearDup(b1, b1, "doc_id") // wrong index schema
  }

  test("keep-best survivor selection: exact groups and transitive near-dup clusters keep the top score") {
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    // exact: one fingerprint group {1,2,3} with scores 5,9,9 → keep 2 (tie → lowest id)
    val docs = Seq(
      (1L, base, 5.0), (2L, base, 9.0), (3L, base, 9.0),
      (4L, "another unique document body here today", 1.0))
      .toDF("doc_id", "text", "score")
    val exact = Dedup.exactByContentKeepBest(docs, "doc_id", "score")
      .select($"doc_id").as[Long].collect().sorted
    exact shouldBe Array(2L, 4L)

    // near-dup: chain A~B~C (tails differ) with best score in the middle
    val chain = Seq(
      (10L, base + " t1", 0.2), (11L, base + " t1 t2", 0.9),
      (12L, base + " t1 t2 t3", 0.5),
      (20L, (100 until 140).map(i => s"w$i").mkString(" "), 0.1))
      .toDF("doc_id", "text", "score")
    val kept = Dedup.nearDupKeepBest(chain, "doc_id", "score", minJaccard = 0.7)
      .select($"doc_id").as[Long].collect().sorted
    kept shouldBe Array(11L, 20L) // one survivor per cluster, the best one
  }

  test("persisted near-dup index: N sequential deliveries re-read a bounded, compacted index") {
    val root = java.nio.file.Files.createTempDirectory("neardup_idx").toString
    val base  = (0 until 60).map(i => s"tok$i").mkString(" ")
    val mk    = (ids: Seq[Long], texts: Seq[String]) => ids.zip(texts).toDF("doc_id", "text")

    // delivery 1 bootstraps; each later delivery reads ONLY the persisted
    // layout (sigs + precomputed bands) — never the in-memory union lineage
    var accepted = Seq.empty[Long]
    val deliveries = Seq(
      mk(Seq(10L, 20L), Seq(base, (100 until 160).map(i => s"w$i").mkString(" "))),
      mk(Seq(30L, 40L), Seq(base + " tail", (200 until 260).map(i => s"v$i").mkString(" "))),
      mk(Seq(50L, 60L), Seq(base + " tail2", (300 until 360).map(i => s"u$i").mkString(" "))),
      mk(Seq(70L), Seq(base + " tail3")))
    deliveries.zipWithIndex.foreach { case (b, i) =>
      val idx = if (i == 0)
        Dedup.NearDupIndex(Seq.empty[(Long, Seq[Int])].toDF("id", "sig"), null)
      else Dedup.readNearDupIndex(spark, s"$root/v${i - 1}")
      val r = Dedup.incrementalNearDup(b, idx.sigs, "doc_id",
        indexBands = Option(idx.bands))
      accepted ++= r.accepted.select($"doc_id").as[Long].collect()
      Dedup.persistNearDupIndex(r.updatedIndex, s"$root/v$i")
    }
    // near-dups of the delivery-1 doc rejected in every later delivery
    accepted.sorted shouldBe Seq(10L, 20L, 40L, 60L)
    // the persisted index is bounded: exactly one row per accepted doc, and
    // the banded layout is exactly bands rows per doc
    val last = Dedup.readNearDupIndex(spark, s"$root/v${deliveries.size - 1}")
    last.sigs.count() shouldBe 4L
    last.bands.count() shouldBe 4L * 16
    // dedup-on-write: replaying a compaction with duplicated input rows
    // (a re-run delivery) still lands one row per id
    Dedup.persistNearDupIndex(last.sigs.unionByName(last.sigs), s"$root/replay")
    Dedup.readNearDupIndex(spark, s"$root/replay").sigs.count() shouldBe 4L
    // the persisted-bands probe path equals the derived-bands path
    val probe = mk(Seq(80L, 90L), Seq(base + " tail4", "novel words only here"))
    val viaDisk = Dedup.incrementalNearDup(probe, last.sigs, "doc_id",
        indexBands = Some(last.bands)).accepted.select($"doc_id").as[Long].collect().sorted
    val viaDerive = Dedup.incrementalNearDup(probe, last.sigs, "doc_id")
      .accepted.select($"doc_id").as[Long].collect().sorted
    viaDisk shouldBe viaDerive
  }

  test("compact-in-place: persisting an index whose lineage reads the same path is safe") {
    val root = java.nio.file.Files.createTempDirectory("neardup_inplace").toString
    val docs = Seq(
      (1L, (0 until 40).map(i => s"a$i").mkString(" ")),
      (2L, (50 until 90).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Seq[Int])].toDF("id", "sig")
    Dedup.persistNearDupIndex(
      Dedup.incrementalNearDup(docs, empty, "doc_id").updatedIndex, s"$root/v0")
    val before = Dedup.readNearDupIndex(spark, s"$root/v0")
      .sigs.as[(Long, Seq[Int])].collect().sortBy(_._1)
    // the updatedIndex-over-its-own-version shape: the frame being persisted
    // READS $root/v0 while the write targets $root/v0 — stage-and-swap must
    // keep the old fileset visible to the job, then atomically replace it
    val inPlace = Dedup.readNearDupIndex(spark, s"$root/v0").sigs
    Dedup.persistNearDupIndex(inPlace, s"$root/v0")
    Dedup.readNearDupIndex(spark, s"$root/v0")
      .sigs.as[(Long, Seq[Int])].collect().sortBy(_._1) shouldBe before
    Dedup.readNearDupIndex(spark, s"$root/v0").bands.count() shouldBe before.length * 16L
  }

  test("banding excludes contentless docs: no degenerate all-MaxValue bucket, pairs unchanged") {
    // null/empty/short texts share the degenerate signature; they must not
    // reach the LSH shuffle (their exact Jaccard is null — never a pair)
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " tail"),      // a real near-dup pair
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, "one two"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", minJaccard = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L)) // contentless rows pair with nothing
    // and the diagnostic bucket table carries no contentless mega-bucket:
    // every banded bucket now holds content-bearing docs only (2 docs x 16
    // bands at most here)
    Dedup.bucketStats(docs, "doc_id").agg(max($"bucket_size"))
      .head().getLong(0) should be <= 2L
  }

  test("HLL sketch overlap estimates cross-corpus intersection without a join") {
    // |A| = 30k, |B| = 25k, true overlap 15k
    val a = spark.range(0, 30000).select(concat(lit("k"), $"id").alias("k"))
    val b = spark.range(15000, 40000).select(concat(lit("k"), $"id").alias("k"))
    val r = Dedup.sketchOverlap(a, b, "k").head()
    val (ea, eb, eu, eo) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    ea.toDouble shouldBe 30000.0 +- 30000 * 0.05
    eb.toDouble shouldBe 25000.0 +- 25000 * 0.05
    eu.toDouble shouldBe 40000.0 +- 40000 * 0.05
    // overlap error compounds across three estimates: allow ~3x the union's
    // relative-error budget on the ABSOLUTE scale of the union
    math.abs(eo - 15000.0) should be < 3 * 0.016 * 40000

    // disjoint corpora: the clamped estimate stays near zero
    val c = spark.range(100000, 130000).select(concat(lit("k"), $"id").alias("k"))
    val r2 = Dedup.sketchOverlap(a, c, "k").head()
    r2.getLong(3).toDouble should be < 3 * 0.016 * 60000
  }

  test("winnowing fingerprints honor the shared-run guarantee and short-doc edges") {
    import graft.operators.Winnowing
    // k=5, w=4: any shared run of >= w+k-1 = 8 tokens must share a fingerprint
    val run = (0 until 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $run zeta eta theta iota"),
      (2L, s"$run completely different trailing words here now okay fine"),
      (3L, "unrelated text with its own vocabulary entirely distinct words galore today"),
      (4L, "tiny doc"),                                  // < k tokens: no grams
      (5L, "exactly five tokens right here")             // k tokens, < w grams: 1 fp
    ).toDF("doc_id", "text")

    val fps = Winnowing.fingerprints(docs, "doc_id")
      .as[(Long, Seq[String])].collect().toMap
    fps(4L) shouldBe Seq.empty
    fps(5L).size shouldBe 1
    // density: never more fingerprints than windows, sorted + distinct
    fps(1L).size should be <= 15 - 5 + 1 - 4 + 1
    fps(1L) shouldBe fps(1L).distinct.sorted

    val pairs = Winnowing.candidatePairs(docs, "doc_id", minShared = 1)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    pairs should contain((1L, 2L))   // winnowing guarantee
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))

    // fingerprints are content-stable: repartitioning changes nothing
    val again = Winnowing.fingerprints(docs.repartition(5), "doc_id")
      .as[(Long, Seq[String])].collect().toMap
    again shouldBe fps
  }

  // ---- exact-substring dedup (ExactSubstr; Lee et al. 2021) ------------

  test("substring dedup removes non-surviving copies of a shared passage, keeps the survivor") {
    val passage = (0 until 12).map(i => s"zqdup$i").mkString(" ")
    val rows = Seq(
      (0L, s"alpha beta gamma delta $passage epsilon zeta"),
      (1L, s"one two three four five six $passage"),
      (2L, s"$passage seven eight nine ten eleven twelve"),
      (3L, "entirely unrelated clean document with plenty of distinct words here")
    ).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup
      .removeDuplicateSpans(rows, "doc_id", "text", gramLen = 6)
      .orderBy("doc_id")
      .select($"doc_id", $"text_deduped", $"n_tokens", $"n_removed_tokens")
      .as[(Long, String, Int, Int)].collect()

    // survivor = min (doc, pos): doc 0 keeps the passage verbatim
    out(0)._2 should include(passage)
    out(0)._4 shouldBe 0
    // every other copy is swept out completely (overlapping spans merged)
    out(1)._2 should not include "zqdup"
    out(2)._2 should not include "zqdup"
    out(1)._4 shouldBe 12
    out(2)._4 shouldBe 12
    // surrounding unique text survives the sweep
    out(1)._2 shouldBe "one two three four five six"
    out(2)._2 shouldBe "seven eight nine ten eleven twelve"
    // untouched clean document passes through byte-identical (normalized)
    out(3)._2 shouldBe rows.filter($"doc_id" === 3L).head().getString(1)
    out(3)._4 shouldBe 0
  }

  test("substring dedup removes a within-document repeat, keeping the first occurrence") {
    val span = (0 until 8).map(i => s"rep$i").mkString(" ")
    val rows = Seq((7L, s"intro words before $span middle filler text $span tail end")).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup
      .removeDuplicateSpans(rows, "doc_id", "text", gramLen = 8)
      .select($"text_deduped").as[String].head()
    out shouldBe s"intro words before $span middle filler text tail end"
  }

  test("substring dedup leaves short docs and unique corpora untouched") {
    val rows = Seq(
      (0L, "short doc"),
      (1L, "another tiny one"),
      (2L, "completely unique longer document with many distinct tokens in it")
    ).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup
      .removeDuplicateSpans(rows, "doc_id", "text", gramLen = 6)
    out.agg(sum($"n_removed_tokens")).head().getLong(0) shouldBe 0L
    out.count() shouldBe 3L
  }

  test("substring dedup plan: occurrence shuffle only, no cartesian") {
    val out = graft.operators.SubstringDedup
      .removeDuplicateSpans(docs, "doc_id", "text", gramLen = 8)
    val plan = out.queryExecution.executedPlan.toString()
    plan.toLowerCase should not include "cartesian"
    plan.toLowerCase should not include "broadcastnestedloop"
    plan should include("positionalshingles64")
  }

  test("semantic near-dup (SemDeDup): planted copies recovered within their k-means cluster") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id" < 15).withColumn("vec_id", $"vec_id" + 1000000L)
    val pairs = Dedup.semanticNearDupPairs(emb.unionByName(planted), "vec_id",
      "embedding", dim = 64, numClusters = 8, minCosine = 0.999)
    pairs.filter($"id_b" === $"id_a" + 1000000L).count() shouldBe 15L
    // isotropic fixture background: no false positives at cosine 0.999
    pairs.filter($"id_b" =!= $"id_a" + 1000000L).count() shouldBe 0L
    // plan discipline: candidates from the cell equi-join, never a cartesian
    // (the nearestcells assignment itself runs before the candidate lineage
    // cut, so assert it on the un-cut pair plan of a tiny prebuilt model)
    val plan = pairs.queryExecution.executedPlan.toString()
    plan.toLowerCase should not include "cartesian"
    plan.toLowerCase should not include "broadcastnestedloop"
    val cents = graft.operators.Similarity
      .trainIvfCentroids(emb, "embedding", dim = 64, numCells = 8)
    val assigned = emb.select(
      element_at(graft.functions.VectorFunctions.nearestCells($"embedding", cents, 64, 1), 1))
    assigned.queryExecution.executedPlan.toString() should include("nearestcells")
  }
}
