package graft.orchestration

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for one DAG task: parses `--stage`/`--ds`/root
  * args (the exact argument list the generated Airflow DAG passes to each
  * `SparkSubmitOperator`) and dispatches to [[CoinDag.runStage]]. Also the
  * DAG-artifact generator: `--render-dag <path>` writes
  * [[CoinDag.renderAirflowDag]] to `path` and exits.
  */
object CoinStageRunner {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    opts.get("render-dag") match {
      case Some(path) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
          CoinDag.renderAirflowDag())
        println(s"[orchestration] wrote DAG artifact to $path")
      case None =>
        def req(k: String): String = opts.getOrElse(k,
          throw new IllegalArgumentException(s"missing required --$k"))
        val conf = CoinDag.StageConf(
          ds = req("ds"),
          rawRoot = req("raw-root"),
          bronzeRoot = req("bronze-root"),
          lakeRoot = req("lake-root"),
          serveRoot = req("serve-root"),
          apiUrl = opts.get("api-url"),
          scheduled = opts.get("scheduled").exists(_.toBoolean)
        )
        val spark = SparkSession.builder()
          .appName(s"graft-coin-${req("stage")}")
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try CoinDag.runStage(spark, req("stage"), conf)
        finally spark.stop()
    }
  }

  /** `--key value` pairs → map (later occurrences win). */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}
