package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over registry queries: prints each query's join /
  * exchange / scan skeleton so shuffle shape, broadcast choices, pushed
  * filters, and any accidental cartesian are reviewable at a glance
  * without running the data. Usage:
  *
  *   runMain graft.PlanAudit <sfDir> [querySubstr,querySubstr,...]
  *
  * No argument after sfDir audits every registered query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nameFilter: String => Boolean = args.lift(1) match {
      case Some(subs) =>
        val pats = subs.split(",").toSeq
        name => pats.exists(name.contains)
      case None => _ => true
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Exchange", "Broadcast", "Scan parquet", "PushedFilters",
      "SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop", "TakeOrdered")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => nameFilter(kv._1)).foreach { case (name, fn) =>
        println(s"===== $name =====")
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          plan.linesIterator
            .filter(l => interesting.exists(l.contains))
            .take(24)
            .foreach(l => println(l.trim.take(160)))
        } catch { case e: Exception => println(s"[plan failed] ${e.getMessage}") }
      }
    spark.stop()
  }
}
