import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_bm25", "q_dsir_weights", "q_heavy_hitters", "q_line_dedup", "q_snapshot_diff")) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("Scan parquet") ||
        l.contains("PushedFilters") || l.contains("SortMergeJoin") || l.contains("CartesianProduct") ||
        l.contains("BroadcastNestedLoop")).take(20).toList
      ex.foreach(l => println(l.trim.take(150)))
      println(s"codegen spans: ${plan.linesIterator.count(_.contains("WholeStageCodegen"))}")
    }
    spark.stop()
  }
}
