package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("salted two-phase aggregation equals the direct groupBy") {
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), "l_quantity", buckets = 8)
    val direct = li.groupBy($"l_returnflag")
      .agg(
        sum($"l_quantity".cast("decimal(18,6)")).cast("double").alias("sum_val"),
        count($"l_quantity").alias("n"),
        min($"l_quantity").alias("min_val"),
        max($"l_quantity").alias("max_val"),
        (sum($"l_quantity".cast("decimal(18,6)")).cast("double") /
          count($"l_quantity")).alias("avg_val"))
    salted.except(direct).count() shouldBe 0
    direct.except(salted).count() shouldBe 0
  }

  test("extreme skew: one hot key still aggregates correctly") {
    val skewed = spark.range(100000).select(
      when($"id" % 100 === 0, lit("cold")).otherwise(lit("hot")).alias("k"),
      ($"id" % 7).cast("double").alias("v"))
    val out = Skew.saltedAgg(skewed, Seq("k"), "v", buckets = 32)
      .orderBy("k").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("cold", "hot")
    val hot = out.find(_.getString(0) == "hot").get
    hot.getAs[Long]("n") shouldBe 99000L
  }

  test("constant-value hot key still fans out over salt buckets") {
    // The canonical skew shape: one hot key whose METRIC is a constant.
    // A value-hash salt would put all 50k rows in one bucket; the row-hash
    // salt spreads them because the id column varies.
    val skewed = spark.range(50000).select(
      lit("hot").alias("k"), lit(0.0).alias("v"), $"id")
    val spread = skewed
      .select(Skew.rowSalt(skewed, 32).alias("salt"))
      .agg(countDistinct($"salt").alias("d"), max($"salt").alias("mx"),
        min($"salt").alias("mn"))
      .head()
    spread.getAs[Long]("d").toInt should be >= 24 // ~all 32 buckets in use
    spread.getAs[Int]("mn") should be >= 0
    spread.getAs[Int]("mx") should be <= 31
    // and the aggregate is still exact
    val out = Skew.saltedAgg(skewed, Seq("k"), "v", buckets = 32).head()
    out.getAs[Long]("n") shouldBe 50000L
    out.getAs[Double]("sum_val") shouldBe 0.0
  }

  test("frames with MapType payload columns still salt (maps skipped, not fatal)") {
    // hash() rejects MapType at analysis — the salt must skip it instead of
    // failing the whole aggregation.
    val withMap = spark.range(10000).select(
      lit("hot").alias("k"), ($"id" % 5).cast("double").alias("v"),
      map(lit("a"), $"id").alias("payload"), $"id")
    val out = Skew.saltedAgg(withMap, Seq("k"), "v", buckets = 16).head()
    out.getAs[Long]("n") shouldBe 10000L
    out.getAs[Double]("sum_val") shouldBe (0 until 10000).map(_ % 5).sum.toDouble
    // the varying id column (hashable) still fans the hot key out
    val spread = withMap.select(Skew.rowSalt(withMap, 16).alias("s"))
      .agg(countDistinct($"s")).head().getLong(0)
    spread.toInt should be >= 12
  }

  test("caller-designated saltCols bound the hash to a column subset") {
    val wide = spark.range(20000).select(
      lit("hot").alias("k"), lit(1.0).alias("v"), $"id",
      concat(lit("x" * 100), $"id".cast("string")).alias("wide_payload"))
    // salt only on id: deterministic, no wide-payload hashing
    val out = Skew.saltedAgg(wide, Seq("k"), "v", buckets = 16, saltCols = Seq("id"))
      .head()
    out.getAs[Long]("n") shouldBe 20000L
    out.getAs[Double]("sum_val") shouldBe 20000.0
    val spread = wide.select(Skew.rowSalt(wide, 16, Seq("id")).alias("s"))
      .agg(countDistinct($"s")).head().getLong(0)
    spread shouldBe 16L
  }
}
