package graft.orchestration

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for one lake-maintenance task (the argument
  * list the generated Airflow DAG passes each `SparkSubmitOperator`), and
  * the DAG-artifact generator (`--render-dag <path>`). Mirrors
  * [[CoinStageRunner]]/[[CorpusStageRunner]].
  */
object LakeStageRunner {

  def main(args: Array[String]): Unit = {
    val opts = CoinStageRunner.parseArgs(args)
    opts.get("render-dag") match {
      case Some(path) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
          LakeDag.renderAirflowDag())
        println(s"[orchestration] wrote DAG artifact to $path")
      case None =>
        def req(k: String): String = opts.getOrElse(k,
          throw new IllegalArgumentException(s"missing required --$k"))
        val conf = LakeDag.StageConf(
          ds = req("ds"),
          inputRoot = req("input-root"),
          lakeRoot = req("lake-root"))
        val spark = SparkSession.builder()
          .appName(s"graft-lake-${req("stage")}")
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try LakeDag.runStage(spark, req("stage"), conf)
        finally spark.stop()
    }
  }
}
