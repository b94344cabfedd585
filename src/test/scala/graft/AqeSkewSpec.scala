package graft

import org.apache.spark.sql.functions._

/** AQE is the engine's answer for runtime join skew (Skew.saltedAgg covers
  * aggregation-side hot keys) — assert it actually engages: a join with one
  * massive hot key must show skew-split sort-merge partitions in the final
  * adaptive plan.
  */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // 200k rows on ONE key vs a uniform right side: the hot key's shuffle
      // partition dwarfs the others.
      val left = spark.range(200000).select(
        when(col("id") < 199000, 0L).otherwise(col("id") % 100).alias("k"),
        concat(lit("payload-"), col("id")).alias("v"))
      val right = spark.range(100).select(col("id").alias("k"),
        concat(lit("dim-"), col("id")).alias("d"))

      val joined = left.join(right, Seq("k"))
      // collect() executes joined's OWN QueryExecution — count() would spawn
      // a separate one and leave this plan un-finalized.
      joined.collect().length shouldBe 200000

      val plan = joined.queryExecution.executedPlan.toString()
      plan should include("isFinalPlan=true")
      plan should include regex "SortMergeJoin.*\\(skew=true\\)"
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
