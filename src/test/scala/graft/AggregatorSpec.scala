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
}
