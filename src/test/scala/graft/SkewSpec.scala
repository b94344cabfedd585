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
}
