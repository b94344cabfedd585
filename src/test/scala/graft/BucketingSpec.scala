package graft

import graft.sinks.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val tmp = java.nio.file.Files.createTempDirectory("bucketing").toString

  test("co-bucketed equi-join plans with zero shuffle exchanges") {
    val orders   = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", s"$tmp/orders_b", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", s"$tmp/lineitem_b", 4, Seq("l_orderkey"))

    // Force the sort-merge path so the assertion is about bucketing, not
    // broadcast thresholds.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "orders_b")
        .join(Bucketing.readTable(spark, "lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).alias("n"))

      val plan = joined.queryExecution.executedPlan.toString()
      plan should include("SortMergeJoin")
      // The join itself must not shuffle either side: in the printed tree the
      // join's inputs appear AFTER the SortMergeJoin line, so no Exchange may
      // occur from there on (the final aggregate's exchange sits above).
      val joinInputs = plan.substring(plan.indexOf("SortMergeJoin"))
      joinInputs should not include "Exchange"

      // And it still computes the right answer.
      val direct = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).alias("n"))
      joined.except(direct).count() shouldBe 0
      direct.except(joined).count() shouldBe 0
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("the registered q_join_bucketed joins its bucketed twins shuffle-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_join_bucketed")(spark, "/root/testdata/sf0.001")
      df.count() should be > 0L // materialize (first run also writes tables)
      val plan = df.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      val joinInputs = plan.substring(plan.indexOf("SortMergeJoin"))
      joinInputs should not include "Exchange"
      // and re-running reuses the tables instead of rewriting
      SparkEntry.queries("q_join_bucketed")(spark, "/root/testdata/sf0.001")
        .count() should be > 0L
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
