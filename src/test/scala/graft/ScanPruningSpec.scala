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

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // star-join shape: hive-partitioned fact, small filtered dim — the
    // partition predicate is only known at runtime, so the scan must carry
    // a dynamicpruning subquery on the partition column instead of reading
    // every partition.
    // dim must be a SCANNED relation with a surviving Filter — a local
    // relation's filter constant-folds away and DPP sees no selective
    // predicate on the build side
    val dimDir = Files.createTempDirectory("dpp_dim").toString + "/dim"
    spark.createDataFrame(
        Seq(("R", "returned"), ("A", "accepted"), ("N", "none")))
      .toDF("flag", "label").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter(col("label") === "returned") // the runtime-only partition predicate
    val fact = spark.read.parquet(partedDir)
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .select(col("l_orderkey"), col("label"))
    val plan = joined.queryExecution.executedPlan.toString()
    plan.toLowerCase should include("dynamicpruning")
    joined.count() shouldBe
      fact.filter(col("l_returnflag") === "R").count()
  }

  test("runtime bloom-filter pruning applies a selective join's filter to the big side") {
    // Spark injects a bloom filter built from the small (filtered) side
    // into the probe-side scan when the feature is enabled and the sizes
    // warrant it — the shuffle then carries only likely-matching rows.
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    try {
      val li  = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).alias("n"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      plan.toLowerCase should include("bloomfilter")
      joined.collect().length shouldBe 1
    } finally {
      prev match {
        case Some(v) => conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", v)
        case None    => conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      }
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
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
