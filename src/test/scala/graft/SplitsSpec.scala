package graft

import graft.operators.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  test("split assignment is content-stable, complete, and near the weights") {
    val docs = spark.range(20000).select($"id".alias("doc_id"))
    val out = Splits.assignSplit(docs, "doc_id")
    val counts = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    counts.values.sum shouldBe 20000L
    counts.keySet shouldBe Set("train", "val", "test")
    counts("train").toDouble / 20000 shouldBe 0.9 +- 0.02
    counts("val").toDouble / 20000 shouldBe 0.05 +- 0.01
    counts("test").toDouble / 20000 shouldBe 0.05 +- 0.01

    // repartitioning must not move a single row between splits
    val a = out.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = Splits.assignSplit(docs.repartition(17), "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    b shouldBe a

    // growing the corpus never reassigns existing ids
    val grown = Splits.assignSplit(
      spark.range(40000).select($"id".alias("doc_id")), "doc_id")
      .filter($"doc_id" < 20000)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    grown shouldBe a
  }

  test("custom weights validate and the last split absorbs the remainder") {
    val docs = spark.range(1000).select($"id".alias("doc_id"))
    val out = Splits.assignSplit(docs, "doc_id", Seq("a" -> 1.0, "b" -> 3.0))
    val counts = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    counts("a").toDouble / 1000 shouldBe 0.25 +- 0.05
    counts("b").toDouble / 1000 shouldBe 0.75 +- 0.05
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 1.0, "a" -> 1.0))
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 0.0))
    // a weight too small to own a bucket must be rejected, not silently empty
    an[IllegalArgumentException] should be thrownBy
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 0.99999, "b" -> 0.00001))
  }

  test("leakage-safe split co-assigns every cluster, leaves singletons exactly where assignSplit puts them") {
    val docs = spark.range(5000).select($"id".alias("doc_id"))
    // three clusters, incl. a transitive A~B~C chain (1,2,3)
    val pairs = Seq((1L, 2L), (2L, 3L), (100L, 101L), (4000L, 4999L))
      .toDF("id_a", "id_b")
    val out = Splits.assignSplitLeakageSafe(docs, "doc_id", pairs)
    val bySplit = out.filter($"doc_id".isin(1L, 2L, 3L, 100L, 101L, 4000L, 4999L))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    bySplit(1L) shouldBe bySplit(2L)
    bySplit(2L) shouldBe bySplit(3L) // transitive chain shares one split
    bySplit(100L) shouldBe bySplit(101L)
    bySplit(4000L) shouldBe bySplit(4999L)
    // docs in no pair: bit-identical to the plain split (the guard never
    // reshuffles the non-duplicated corpus)
    val clustered = Set(1L, 2L, 3L, 100L, 101L, 4000L, 4999L)
    val plain = Splits.assignSplit(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    out.select($"doc_id", $"split").as[(Long, String)].collect()
      .filterNot(kv => clustered(kv._1))
      .foreach { case (id, s) => s shouldBe plain(id) }
    // schema untouched beyond the split column
    out.columns shouldBe Array("doc_id", "split")
  }

  test("deterministic shuffle is a reproducible permutation, seeds decorrelate") {
    val docs = spark.range(5000).select($"id".alias("doc_id"))
    val s1 = Splits.deterministicShuffle(docs, "doc_id", seed = 42)
    s1.columns shouldBe Array("doc_id", "pos")

    // permutation: positions are exactly 0..n-1, ids all present once
    val rows = s1.select($"pos", $"doc_id").as[(Long, Long)].collect()
    rows.map(_._1).sorted shouldBe (0L until 5000L).toArray
    rows.map(_._2).sorted shouldBe (0L until 5000L).toArray

    // reproducible: same seed → identical order, even across repartitioning
    val s1b = Splits.deterministicShuffle(docs.repartition(13), "doc_id", seed = 42)
      .select($"pos", $"doc_id").as[(Long, Long)].collect().toMap
    rows.toMap shouldBe s1b

    // genuinely shuffled and seed-sensitive: a different seed moves most rows
    val s2 = Splits.deterministicShuffle(docs, "doc_id", seed = 7)
      .select($"pos", $"doc_id").as[(Long, Long)].collect().toMap
    val movedVsIdentity = rows.count { case (pos, id) => pos != id }
    val movedVsSeed2    = rows.count { case (pos, id) => s2.get(pos).exists(_ != id) }
    movedVsIdentity should be > 4900
    movedVsSeed2 should be > 4900
  }

  test("stratified sampling hits the per-stratum rates, content-stably") {
    val docs = spark.range(40000)
      .select($"id".alias("doc_id"),
        concat(lit("s"), pmod($"id", lit(4))).alias("src"))
    val out = Splits.sampleStratified(docs, "src", "doc_id",
      Map("s0" -> 0.5, "s1" -> 1.0, "s2" -> 0.0), default = 0.1)
    val counts = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    counts("s0").toDouble / 10000 shouldBe 0.5 +- 0.03
    counts("s1") shouldBe 10000L            // f = 1.0 keeps everything
    counts.get("s2") shouldBe None          // f = 0.0 drops everything
    counts("s3").toDouble / 10000 shouldBe 0.1 +- 0.03

    // content-stable: growing the corpus never flips an existing decision
    val small = Splits.sampleStratified(docs.filter($"doc_id" < 20000),
        "src", "doc_id", Map("s0" -> 0.5, "s1" -> 1.0, "s2" -> 0.0), default = 0.1)
      .select($"doc_id").as[Long].collect().toSet
    val grownKept = out.filter($"doc_id" < 20000)
      .select($"doc_id").as[Long].collect().toSet
    grownKept shouldBe small

    an[IllegalArgumentException] should be thrownBy
      Splits.sampleStratified(docs, "src", "doc_id", Map("s0" -> 1.5))
  }

  test("token-budget selection is greedy by score, exact at the boundary, partition-independent") {
    // scores 0..999, tokens 10 each -> budget 105 tokens selects exactly the
    // top 10 scorers (100 tokens); an 11th would overflow
    val docs = spark.range(1000).select(
      $"id".alias("doc_id"), $"id".alias("score"), lit(10L).alias("toks"))
    val out = Splits.selectByTokenBudget(docs, "doc_id", "toks", "score", 105L)
      .select($"doc_id", $"rank", $"cum_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    out.map(_._1).toSeq shouldBe (990L to 999L).reverse
    out.map(_._2).toSeq shouldBe (0L to 9L)
    out.map(_._3).toSeq shouldBe (10L to 100L by 10)

    // identical under different input partitioning
    val again = Splits.selectByTokenBudget(docs.repartition(13), "doc_id",
      "toks", "score", 105L)
      .select($"doc_id", $"rank", $"cum_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    again shouldBe out

    // score ties broken by ascending id; zero budget selects nothing;
    // null scores/tokens are excluded rather than poisoning the sum
    val ties = Seq((3L, Some(1.0), 5L), (1L, Some(1.0), 5L), (2L, Some(1.0), 5L),
      (4L, None: Option[Double], 5L))
      .toDF("doc_id", "score", "toks")
    Splits.selectByTokenBudget(ties, "doc_id", "toks", "score", 10L)
      .select($"doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    Splits.selectByTokenBudget(docs, "doc_id", "toks", "score", 0L)
      .count() shouldBe 0L
    an[org.apache.spark.SparkException] should be thrownBy
      Splits.selectByTokenBudget(
        docs.withColumn("toks", lit(-1L)), "doc_id", "toks", "score", 10L)
        .count()
  }

  test("per-group sampling keeps exactly min(n, group size), reproducibly") {
    val docs = spark.range(1000)
      .select($"id".alias("doc_id"),
        concat(lit("g"), pmod($"id", lit(7))).alias("grp"))
    val out = Splits.samplePerGroup(docs, "grp", "doc_id", 20)
    out.columns shouldBe Array("doc_id", "grp") // helper column dropped
    val counts = out.groupBy($"grp").count().as[(String, Long)].collect().toMap
    counts.values.foreach(_ shouldBe 20L)

    // a group smaller than n survives whole
    val tiny = Splits.samplePerGroup(docs.filter($"doc_id" < 10), "grp", "doc_id", 20)
    tiny.count() shouldBe 10L

    // reproducible across repartitioning; seed changes the draw
    val a = out.select($"doc_id").as[Long].collect().toSet
    val b = Splits.samplePerGroup(docs.repartition(13), "grp", "doc_id", 20)
      .select($"doc_id").as[Long].collect().toSet
    b shouldBe a
    val c = Splits.samplePerGroup(docs, "grp", "doc_id", 20, seed = 7)
      .select($"doc_id").as[Long].collect().toSet
    c should not be a
  }

  test("weighted sampling without replacement favors weight, replays exactly") {
    // 5k rows at weight 100 vs 5k at weight 1: ln(u)/w pulls heavy keys
    // toward 0, so a top-1000 draw is almost entirely heavy rows
    val docs = spark.range(10000).select($"id".alias("doc_id"),
      when($"id" < 5000, 100L).otherwise(1L).alias("w"))
    val out = Splits.sampleWeighted(docs, "doc_id", "w", k = 1000)
    out.count() shouldBe 1000L
    out.select($"doc_id").distinct().count() shouldBe 1000L  // no replacement
    out.filter($"w" === 100L).count().toDouble should be > 950.0

    // content-stable across partitioning; a different seed redraws
    val a = out.select($"doc_id").as[Long].collect().toSet
    val b = Splits.sampleWeighted(docs.repartition(13), "doc_id", "w", 1000)
      .select($"doc_id").as[Long].collect().toSet
    b shouldBe a
    Splits.sampleWeighted(docs, "doc_id", "w", 1000, seed = 7)
      .select($"doc_id").as[Long].collect().toSet should not be a

    // k >= eligible rows degrades to "keep all with positive weight"
    val tiny = docs.filter($"doc_id" < 10)
      .withColumn("w", when($"doc_id" === 5L, lit(null)).otherwise($"w"))
    Splits.sampleWeighted(tiny, "doc_id", "w", 1000).count() shouldBe 9L
  }

  test("per-group token budget caps every group independently, exact at each boundary") {
    // two groups: g0 rows score 9..0 / 10 tokens each, budget 35 -> top 3
    // (cum 30; a 4th would hit 40); g1 has one 36-token row that never fits
    val g0 = spark.range(10).select($"id".alias("doc_id"), lit("g0").alias("g"),
      (lit(9L) - $"id").alias("score"), lit(10L).alias("toks"))
    val g1 = Seq((100L, "g1", 5L, 36L), (101L, "g1", 4L, 20L))
      .toDF("doc_id", "g", "score", "toks")
    val out = Splits.selectByTokenBudgetPerGroup(
      g0.unionByName(g1), "g", "doc_id", "toks", "score", 35L)
    val byGroup = out.select($"g", $"doc_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byGroup("g0") shouldBe Set(0L, 1L, 2L)  // highest scores = lowest ids here
    // g1's best row (36 tokens) overflows; cum is monotone so the NEXT row
    // cannot fit either — the whole group is cut at its first overflow
    byGroup.get("g1") shouldBe None
    out.filter($"g" === "g0").agg(max($"cum_tokens")).head().getLong(0) shouldBe 30L

    an[Exception] should be thrownBy Splits.selectByTokenBudgetPerGroup(
      Seq((1L, "g", 1L, -5L)).toDF("doc_id", "g", "score", "toks"),
      "g", "doc_id", "toks", "score", 10L).collect()
  }

  test("matchDistribution reshapes source bin shares to the target's, content-stably") {
    // source: 30k rows in bin 0, 10k in bin 1 (75/25); target: 50/50.
    // Bin 1 is the scarcest-relative-to-target -> keeps everything (a=1);
    // bin 0 accepts 1/3 so accepted shares are 10k/10k = 50/50.
    val src = spark.range(40000).select($"id".alias("doc_id"),
      when($"id" < 30000, 0L).otherwise(1L).alias("b"))
    val tgt = spark.range(2000).select($"id".alias("doc_id"),
      pmod($"id", lit(2)).cast("long").alias("b"))
    val out = Splits.matchDistribution(src, tgt, "doc_id", $"b")
    val counts = out.groupBy($"b").count().as[(Long, Long)].collect().toMap
    counts(1L) shouldBe 10000L                       // a = 1 keeps all
    counts(0L).toDouble / 10000 shouldBe 1.0 +- 0.05 // a = 1/3 of 30k
    // expectation check: accepted shares match the target's 50/50
    val total = counts.values.sum.toDouble
    counts(0L) / total shouldBe 0.5 +- 0.02

    // content-stable: a row's accept decision never depends on partitioning
    val again = Splits.matchDistribution(src.repartition(17), tgt, "doc_id", $"b")
      .select($"doc_id").as[Long].collect().toSet
    again shouldBe out.select($"doc_id").as[Long].collect().toSet

    // scale shape: the corpus is never shuffled — the threshold table
    // broadcasts onto it; only the tiny histograms aggregate
    out.queryExecution.executedPlan.toString() should not include "SortMergeJoin"

    // a target bin absent from the source is ignored; a source bin absent
    // from the target is rejected wholesale
    val tgtOnly = spark.range(100).select($"id".alias("doc_id"), lit(9L).alias("b"))
    val srcOnly = Splits.matchDistribution(
      src, tgt.unionByName(tgtOnly), "doc_id", $"b")
    srcOnly.filter($"b" === 9L).count() shouldBe 0L
    val rejected = Splits.matchDistribution(
      src.unionByName(tgtOnly), tgt, "doc_id", $"b")
    rejected.filter($"b" === 9L).count() shouldBe 0L
  }
}
