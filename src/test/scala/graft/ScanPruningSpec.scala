package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The three scan-side guarantees a 100 TB plan lives or dies by: partition
  * pruning, predicate pushdown, and column pruning. Asserted against the
  * formatted physical plan, the same way a human audit reads `.explain`.
  */
class ScanPruningSpec extends SparkTestBase {

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("pruning").toString + "/lineitem_parted"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.partitionBy("l_returnflag").parquet(dir)
    dir
  }

  test("partition filter prunes to one hive partition") {
    val df = spark.read.parquet(partedDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    val scan = df.queryExecution.executedPlan.toString()
    scan should include("PartitionFilters")
    scan should include("l_returnflag")
    // The partition predicate must NOT degrade into a post-scan Filter on
    // the partition column.
    df.queryExecution.executedPlan.toString() should include regex
      "PartitionFilters: \\[.*l_returnflag.*\\]"
  }

  test("data predicate is pushed to the parquet reader") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString()
    scan should include("PushedFilters")
    scan should include regex "PushedFilters: \\[.*GreaterThan\\(l_quantity,45.0\\).*\\]"
  }

  test("projection prunes the read schema to the selected columns") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString()
    scan should include("ReadSchema")
    scan should include regex "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"
  }

  test("the gold aggregate runs inside WholeStageCodegen as partial+final hash agg") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").alias("coin_id"),
        col("l_extendedprice").alias("price_usd"), col("l_quantity").alias("market_cap"))
    val df = graft.ops.CoinOps.goldDailyMetrics(li, "2026-01-01")
    df.collect() // AQE only materializes codegen spans per finalized stage
    val full = df.queryExecution.executedPlan.toString()
    val initialIdx = full.indexOf("== Initial Plan ==")
    val finalPlan = if (initialIdx >= 0) full.substring(0, initialIdx) else full
    // '*(n)' prefixes mark WholeStageCodegen stages in the simple plan string.
    finalPlan should include regex "\\*\\(\\d+\\) HashAggregate"
    finalPlan.sliding("HashAggregate".length)
      .count(_ == "HashAggregate") shouldBe 2 // partial+final
  }
}
