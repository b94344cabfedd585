package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("binned range join equals the naive theta join") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"),
        (col("s_acctbal") - 50.0).alias("lo"), (col("s_acctbal") + 50.0).alias("hi"))

    val binned = RangeJoin.pointInInterval(cust, supp, "c_acctbal", "lo", "hi", 100.0)
      .select("c_custkey", "s_suppkey")
    val naive = cust.join(supp,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select("c_custkey", "s_suppkey")

    binned.count() shouldBe naive.count()
    binned.except(naive).count() shouldBe 0
    naive.except(binned).count() shouldBe 0
  }

  test("binned range join plans as a hash join, not nested-loop/cartesian") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"),
        (col("s_acctbal") - 50.0).alias("lo"), (col("s_acctbal") + 50.0).alias("hi"))
    val plan = RangeJoin.pointInInterval(cust, supp, "c_acctbal", "lo", "hi", 100.0)
      .queryExecution.executedPlan.toString()
    plan should not include "BroadcastNestedLoop"
    plan.toLowerCase should not include "cartesian"
    plan should include("HashJoin")
  }

  test("interval spanning many bins still matches every contained point") {
    import spark.implicits._
    val points = Seq(1.0, 5.0, 99.0, 250.0, 999.0).toDF("p").withColumn("pid", col("p"))
    val intervals = Seq((0.0, 1000.0, "wide"), (90.0, 110.0, "narrow")).toDF("lo", "hi", "name")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
      .groupBy("name").agg(count(lit(1)).alias("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("wide") shouldBe 5L
    out("narrow") shouldBe 1L
  }
}
