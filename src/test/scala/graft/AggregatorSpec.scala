package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class AggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL estimate is within 3% of the exact distinct count (p=12 → ~1.6% stderr)") {
    val hll = udaf(new Aggregators.HyperLogLog(12))
    val n   = 50000
    val df  = spark.range(n).select(concat(lit("user-"), col("id")).alias("k"))
    val est = df.agg(hll(col("k"))).as[Long].head()
    math.abs(est - n).toDouble / n should be < 0.03
  }

  test("HLL merges across groups: sketch(union) == merge of partials") {
    val hll = udaf(new Aggregators.HyperLogLog(12))
    // 2 overlapping halves: [0, 30k) and [20k, 50k) — union is 50k distinct.
    val a = spark.range(0, 30000)
    val b = spark.range(20000, 50000)
    val df = a.union(b).select(concat(lit("k"), col("id")).alias("k"))
    // Merge path is exercised by partial aggregation across partitions.
    val est = df.repartition(8).agg(hll(col("k"))).as[Long].head()
    math.abs(est - 50000).toDouble / 50000 should be < 0.03
  }

  test("HLL sparse buffers stay tiny for small groups and estimate exactly like dense") {
    val hll = udaf(new Aggregators.HyperLogLog(12))
    // many groups, each with a handful of members: buffers must stay sparse
    val grouped = spark.range(10000).select(
      (col("id") % 2000).alias("g"), concat(lit("m"), col("id")).alias("k"))
      .groupBy(col("g")).agg(hll(col("k")).alias("est"))
    val ests = grouped.select(col("est")).as[Long].collect()
    ests.length shouldBe 2000
    // tiny groups: linear counting counts occupied registers — 5, minus the
    // rare in-group register collision (~0.25% of groups)
    ests.foreach(e => e should (be >= 4L and be <= 5L))
    ests.count(_ == 5L) should be > 1950

    // sparse->dense transition must not change the estimate: feed the same
    // keys through one group (forces densify) and through a fresh dense-only
    // computation path via many partitions (forces merges of mixed formats)
    val keys = spark.range(3000).select(concat(lit("x"), col("id")).alias("k"))
    val oneShot = keys.coalesce(1).agg(hll(col("k"))).as[Long].head()
    val merged  = keys.repartition(16).agg(hll(col("k"))).as[Long].head()
    merged shouldBe oneShot
  }

  test("HLL small-range linear counting is near-exact") {
    val hll = udaf(new Aggregators.HyperLogLog(12))
    val df  = spark.range(100).select(concat(lit("x"), col("id")).alias("k"))
    val est = df.agg(hll(col("k"))).as[Long].head()
    est.toDouble shouldBe 100.0 +- 2.0
  }

  // ---- kernel-level laws (no Spark jobs): drive reduce/merge/finish -----

  private def sketchOf(hll: Aggregators.HyperLogLog, keys: Seq[String]): Array[Byte] =
    keys.foldLeft(hll.zero)((b, k) => hll.reduce(b, k))

  test("HLL error stays within 3 sigma of 1.04/sqrt(m) across the full range") {
    val hll = new Aggregators.HyperLogLog(12)
    val bound = 3.0 * 1.04 / math.sqrt(4096.0) // ≈ 4.9%
    // spans the old linear-counting regime, the old bias-corrected gap
    // (n ≈ 2.5m..5m), and deep raw-estimator territory
    Seq(10, 100, 1000, 4000, 10000, 16000, 50000, 200000).foreach { n =>
      val est = hll.finish(sketchOf(hll, (0 until n).map(i => s"e$i")))
      withClue(s"n=$n est=$est: ") {
        math.abs(est - n).toDouble / n should be < math.max(bound, 2.0 / n)
      }
    }
  }

  test("DDSketch quantiles stay within the relative-error contract") {
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
    val sk = new Aggregators.DdSketchQuantiles(0.01, qs)
    // deterministic lognormal-ish + uniform + negative mixtures
    val data = (1 to 20000).map(i => math.exp((i % 97) / 10.0)) ++
      (1 to 5000).map(i => i.toDouble) ++
      (1 to 3000).map(i => -i / 7.0)
    val buf = data.foldLeft(sk.zero)(sk.reduce)
    val est = sk.finish(buf)
    val sorted = data.sorted
    qs.zip(est).foreach { case (q, e) =>
      val exact = sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))
      withClue(s"q=$q est=$e exact=$exact: ") {
        math.abs(e - exact) should be <= math.abs(exact) * 0.011 + 1e-9
      }
    }
    // zeros and empty input
    sk.finish(sk.reduce(sk.zero, 0.0)) shouldBe Seq(0.0, 0.0, 0.0, 0.0, 0.0)
    sk.finish(sk.zero).forall(_.isNaN) shouldBe true

    // the guarantee must hold at TIGHT alpha too: the bucket clamp derives
    // from alpha, so large magnitudes can't collapse into an edge bucket
    val tight = new Aggregators.DdSketchQuantiles(0.001, Seq(0.5))
    val big = (1 to 101).map(_ => 50000.0)
    val e50k = tight.finish(big.foldLeft(tight.zero)(tight.reduce)).head
    math.abs(e50k - 50000.0) should be <= 50000.0 * 0.0011
    // and a stray denormal only costs its clamped edge bucket, not accuracy
    val withDenormal = tight.finish(
      (big :+ 1e-300).foldLeft(tight.zero)(tight.reduce)).head
    math.abs(withDenormal - 50000.0) should be <= 50000.0 * 0.0011
  }

  test("property: DDSketch merge is exactly commutative and associative") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sk = new Aggregators.DdSketchQuantiles(0.02, Seq(0.5))
    val listGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 100)))
    val prop = Prop.forAll(listGen, listGen, listGen) { (xa, xb, xc) =>
      def s(xs: Seq[Double]) = xs.foldLeft(sk.zero)(sk.reduce)
      def c(b: Aggregators.DdBuffer) = sk.canonical(b)
      val ab_c  = sk.merge(sk.merge(s(xa), s(xb)), s(xc))
      val a_bc  = sk.merge(s(xa), sk.merge(s(xb), s(xc)))
      val ab    = sk.merge(s(xa), s(xb))
      val ba    = sk.merge(s(xb), s(xa))
      val union = s(xa ++ xb ++ xc)
      // canonical bucket-count equality — DDSketch counts are
      // order-insensitive EXACTLY (array offsets/slack are layout detail)
      c(ab_c) == c(a_bc) && c(ab) == c(ba) && c(ab_c) == c(union) &&
        c(sk.merge(s(xa), sk.zero)) == c(s(xa))
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
      .passed shouldBe true
  }

  test("Count-Min never undercounts and merge equals the union sketch") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keysUniverse = (0 until 50).map(i => s"key$i")
    val sk = new Aggregators.CountMinFreq(4, 256, keysUniverse)
    val listGen = Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 49).map(i => s"key$i")))
    val prop = Prop.forAll(listGen, listGen) { (xa, xb) =>
      def s(xs: Seq[String]) = xs.foldLeft(sk.zero)(sk.reduce)
      val merged = sk.finish(sk.merge(s(xa), s(xb)))
      val union  = sk.finish(s(xa ++ xb))
      val truth  = (xa ++ xb).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n      = (xa.size + xb.size).toLong
      merged == union &&
        keysUniverse.zip(merged).forall { case (k, est) =>
          val t = truth.getOrElse(k, 0L)
          // >= is the DETERMINISTIC guarantee; the eps bound is
          // probabilistic (prob 1-(1/e)^depth per key), so the property
          // uses 3x headroom to stay deterministic across random streams
          est >= t && est <= t + 3L * math.ceil(math.E / 256 * n).toLong + 1
        }
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
      .passed shouldBe true
  }

  test("property: HLL merge is commutative, associative, and has zero as identity") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val hll = new Aggregators.HyperLogLog(12)
    // structural comparison on canonical register content — estimates alone
    // could mask register-level divergence
    def regs(buf: Array[Byte]): Seq[Byte] = hll.registers(buf)
    val keysGen = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 999).map(i => s"k$i")))
    val prop = Prop.forAll(keysGen, keysGen, keysGen) { (ka, kb, kc) =>
      def s(keys: Seq[String]) = sketchOf(hll, keys)
      val ab_c = hll.merge(hll.merge(s(ka), s(kb)), s(kc))
      val a_bc = hll.merge(s(ka), hll.merge(s(kb), s(kc)))
      val ba   = hll.merge(s(kb), s(ka))
      val ab   = hll.merge(s(ka), s(kb))
      val aId  = hll.merge(s(ka), hll.zero)
      val union = sketchOf(hll, ka ++ kb ++ kc)
      regs(ab_c) == regs(a_bc) &&
        regs(ab) == regs(ba) &&
        regs(aId) == regs(s(ka)) &&
        // merge of partials is EXACTLY the sketch of the concatenated stream
        regs(ab_c) == regs(union)
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
      .passed shouldBe true
  }

  test("persisted-sketch union equals one-shot sketching (mergeable windows)") {
    val sk = new Aggregators.HyperLogLogSketch(12)
    val un = new Aggregators.HllUnion(12)
    val ref = new Aggregators.HyperLogLog(12)
    val windows = Seq(
      (0 until 4000).map(i => s"u$i"),
      (2000 until 7000).map(i => s"u$i"),
      (6000 until 8000).map(i => s"u$i"))
    // sketch each window independently (as an hourly job would persist)
    val sketches = windows.map(w => w.foldLeft(sk.zero)(sk.reduce))
    val unioned = un.finish(sketches.foldLeft(un.zero)(un.reduce))
    val oneShot = ref.finish(windows.flatten.foldLeft(ref.zero)(ref.reduce))
    unioned shouldBe oneShot // merging buffers IS sketching the union
    // and the estimate is near the true 8000
    math.abs(unioned - 8000.0) / 8000 should be < 0.05
    // null sketches are the empty window
    un.finish(un.reduce(un.zero, null)) shouldBe 0L
  }

  test("persisted DDSketch union equals one-shot sketching, alpha bound holds") {
    val alpha = 0.01
    val sk = new Aggregators.DdSketchBuffer(alpha)
    val un = new Aggregators.DdUnion(alpha, Seq(0.5, 0.95))
    val ref = new Aggregators.DdSketchQuantiles(alpha, Seq(0.5, 0.95))
    val rnd = new scala.util.Random(3)
    val windows = Seq.fill(3)(Seq.fill(500)(math.exp(rnd.nextGaussian()) * 10))
    val sketches = windows.map(w => w.foldLeft(sk.zero)(sk.reduce))
    val unioned = un.finish(sketches.foldLeft(un.zero)(un.reduce))
    val oneShot = ref.finish(windows.flatten.foldLeft(ref.zero)(ref.reduce))
    unioned shouldBe oneShot // merging buffers IS sketching the union
    // alpha relative-error bound against the discrete quantiles
    val sorted = windows.flatten.sorted
    def disc(q: Double) = sorted(math.ceil(q * sorted.size).toInt - 1)
    math.abs(unioned(0) / disc(0.5) - 1) should be < alpha + 1e-9
    math.abs(unioned(1) / disc(0.95) - 1) should be < alpha + 1e-9
    un.finish(un.reduce(un.zero, null)) shouldBe Seq(0.0, 0.0)
  }

  test("property: Misra-Gries keeps every phi-heavy item across merge trees, bounded undercount") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val k = 9
    val mg = new Aggregators.MisraGries(k)
    // skewed streams so heavy items actually exist
    val itemGen = Gen.frequency(
      (8, Gen.const("hot0")), (5, Gen.const("hot1")),
      (3, Gen.chooseNum(0, 4).map(i => s"warm$i")),
      (4, Gen.chooseNum(0, 200).map(i => s"cold$i")))
    val listGen = Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, itemGen))
    val prop = Prop.forAll(listGen, listGen, listGen) { (xa, xb, xc) =>
      def s(xs: Seq[String]) = xs.foldLeft(mg.zero)(mg.reduce)
      // two different merge trees over three partition sketches
      val t1 = mg.finish(mg.merge(mg.merge(s(xa), s(xb)), s(xc)))
      val t2 = mg.finish(mg.merge(s(xa), mg.merge(s(xc), s(xb))))
      val truth = (xa ++ xb ++ xc).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = (xa.size + xb.size + xc.size).toLong
      val bound = n / (k + 1)
      Seq(t1, t2).forall { summary =>
        summary.size <= k &&
          // every item above the n/(k+1) threshold must be present
          truth.forall { case (key, c) => c <= bound || summary.contains(key) } &&
          // estimates never overcount and undercount by at most the bound
          summary.forall { case (key, est) =>
            val t = truth.getOrElse(key, 0L)
            est <= t && est >= t - bound
          }
      }
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
      .passed shouldBe true
  }

  test("two-pass heavy hitters match the exact group-by, independent of partitioning") {
    val words = (0 until 3000).map { i =>
      if (i % 5 == 0) "alpha" else if (i % 7 == 0) "beta" else s"rare${i % 997}"
    }
    val df = words.toDF("tok")
    val phi = 0.05
    val expected = df.groupBy($"tok").agg(count(lit(1)).alias("cnt"))
      .filter($"cnt" > phi * 3000)
      .as[(String, Long)].collect().sortBy(_._1)
    for (parts <- Seq(1, 7, 32)) {
      val got = graft.operators.HeavyHitters
        .heavyHitters(df.repartition(parts), "tok", phi)
        .as[(String, Long)].collect().sortBy(_._1)
      got shouldBe expected
    }
    // degenerate inputs: all-null keys and an empty frame yield empty results
    val nulls = Seq[Option[String]](None, None).toDF("tok")
    graft.operators.HeavyHitters.heavyHitters(nulls, "tok", 0.5).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      graft.operators.HeavyHitters.heavyHitters(df, "tok", 1.5)
    // an explicit k too narrow for phi must be rejected, not silently lossy
    an[IllegalArgumentException] should be thrownBy
      graft.operators.HeavyHitters.heavyHitters(df, "tok", 0.05, k = 10)
  }

  test("TopKByScore: bounded hash-agg top-k matches the window formulation, any partitioning") {
    import org.apache.spark.sql.functions.udaf
    import org.apache.spark.sql.Encoders
    val df = spark.range(3000).select(
      (col("id") % 7).cast("string").alias("g"),
      (pmod(col("id") * 7919, lit(5000))).cast("double").alias("s"),
      col("id"))
    val topk = udaf(new graft.functions.Aggregators.TopKByScore(5),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    def run(parts: Int) = df.repartition(parts)
      .groupBy($"g").agg(topk($"s", $"id").alias("tk"))
      .select($"g", posexplode($"tk").as(Seq("rk", "p")))
      .select($"g", $"rk", $"p._1".alias("s"), $"p._2".alias("id"))
      .as[(String, Int, Double, Long)].collect().sortBy(t => (t._1, t._2))
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select($"g", ($"rn" - 1).alias("rk"), $"s", $"id")
        .as[(String, Int, Double, Long)].collect().sortBy(t => (t._1, t._2))
    }
    for (parts <- Seq(1, 13, 32)) run(parts) shouldBe want

    // tie-break: equal scores rank by ascending id, deterministically
    val ties = Seq(("a", 1.0, 9L), ("a", 1.0, 3L), ("a", 1.0, 7L))
      .toDF("g", "s", "id")
    ties.groupBy($"g").agg(topk($"s", $"id").alias("tk"))
      .select(posexplode($"tk").as(Seq("rk", "p")))
      .select($"p._2").as[Long].collect() shouldBe Array(3L, 7L, 9L)

    // k larger than the group: everything, still rank-ordered
    val small = Seq(("b", 2.0, 1L), ("b", 5.0, 2L)).toDF("g", "s", "id")
    small.groupBy($"g").agg(topk($"s", $"id").alias("tk"))
      .select(org.apache.spark.sql.functions.size($"tk")).as[Int]
      .head() shouldBe 2

    // plan shape: a hash aggregate, no Window and no per-group sort of
    // the input rows anywhere in the physical plan
    val plan = df.groupBy($"g").agg(topk($"s", $"id").alias("tk"))
      .queryExecution.executedPlan.toString()
    plan should include("Aggregate")
    plan should not include "Window"
  }

  test("property: TopKByScore reduce/merge equals sort-take-k for any split of the data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val agg = new graft.functions.Aggregators.TopKByScore(4)
    val pairGen = Gen.zip(Gen.chooseNum(-100, 100).map(_.toDouble),
      Gen.chooseNum(0L, 50L))
    val listGen = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, pairGen))
    def viaAgg(parts: Seq[Seq[(Double, Long)]]): Seq[(Double, Long)] =
      agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge))
    def reference(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
      xs.distinct.sortBy(t => (-t._1, t._2)).take(4) // dups of a pair tie anyway
    val prop = Prop.forAll(listGen, Gen.chooseNum(1, 5)) { (xs, nParts) =>
      // duplicates of the SAME (score,id) pair collapse in the reference
      // only if the aggregator keeps both — it does (multiset), so
      // compare against the raw sorted take instead
      val want = xs.sortBy(t => (-t._1, t._2)).take(4)
      val parts = xs.grouped(math.max(1, xs.length / nParts + 1)).toSeq
      val got = viaAgg(if (parts.isEmpty) Seq(Seq.empty) else parts)
      got == want
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
      .passed shouldBe true
  }

  test("property: MultisetSubtract removes exactly one copy per deleted value") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val valGen = Gen.chooseNum(0, 8).map(_.toDouble)
    val listGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, valGen))
    val prop = Prop.forAll(listGen, listGen) { (xs, ds) =>
      val got = Seq((xs, ds)).toDF("xs", "ds")
        .select(graft.functions.ArrayFunctions.multisetSubtract($"xs", $"ds"))
        .as[Seq[Double]].head()
      // reference: walk xs, cancel against a count map of ds
      val counts = scala.collection.mutable.Map.empty[Double, Int]
      ds.foreach(d => counts(d) = counts.getOrElse(d, 0) + 1)
      val want = xs.filter { x =>
        if (counts.getOrElse(x, 0) > 0) { counts(x) -= 1; false } else true
      }
      got == want
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
      .passed shouldBe true
  }
}
