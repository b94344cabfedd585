package graft.orchestration

import graft.ops.CoinOps
import graft.pipeline.CoinPipeline
import graft.schema.CoinSchemas
import graft.sinks.{LakeSink, Merge}
import graft.sources.{CoinSources, HttpCoinMarketsFetcher}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Orchestration twin of the reference's flagship DAG (SURVEY §3 EP1,
  * `dags/coin_data_pipeline_optimized.py:1243`): the same 14-task linear
  * chain, re-expressed as idempotent per-stage Spark jobs whose ONLY state
  * handoff is durable lake/warehouse layout — exactly what a scheduler
  * restarting an individual task requires.
  *
  * Three artifacts keep the twin honest:
  *  - [[stageChain]] — the task ids in reference order (asserted against the
  *    reference chain by OrchestrationSpec);
  *  - [[runStage]] — each task id dispatched to its engine implementation
  *    (the scheduler-facing entry is [[CoinStageRunner]], one spark-submit
  *    per task);
  *  - [[renderAirflowDag]] — generates `orchestration/coin_pipeline_dag.py`,
  *    an Airflow DAG of `SparkSubmitOperator`s with the reference's retry
  *    policy (`coin_data_pipeline_optimized.py:47-48`: retries=2,
  *    retry_delay=5 min); the checked-in file is asserted byte-identical to
  *    the generator's output so the artifact can never drift from the code.
  *
  * [[CoinPipeline.run]] remains the single-session in-process composition of
  * the same stages (one Spark job chain, gates before publish); this module
  * is the per-task decomposition for scheduler-driven runs (gates as their
  * own retryable tasks, matching the reference's task granularity).
  */
object CoinDag {

  /** Everything a stage needs to find its inputs/outputs. Stages read ONLY
    * durable state written by their upstreams — any stage can be re-run in
    * isolation.
    */
  final case class StageConf(
      ds: String,
      rawRoot: String,
      bronzeRoot: String,
      lakeRoot: String,
      serveRoot: String,
      apiUrl: Option[String] = None,
      scheduled: Boolean = false,
      now: java.time.Instant = java.time.Instant.now
  ) {
    def rawFile: String      = s"$rawRoot/coins_$ds.json"
    def bronzeDir: String    = s"$bronzeRoot/coins/dt=$ds"
    def silverDir: String    = s"$lakeRoot/silver/coins/dt=$ds"
    def goldDir: String      = s"$lakeRoot/gold/coins_daily/dt=$ds"
    def dimTable: String     = s"$serveRoot/coin_dimension"
    def factTable: String    = s"$serveRoot/coin_prices_fact"
  }

  /** The reference chain, in order (`coin_data_pipeline_optimized.py:1243`). */
  val stageChain: Seq[String] = Seq(
    "create_tables",
    "extract",
    "upload_raw_to_s3",
    "transform_bronze_to_silver",
    "validate",
    "load_dim",
    "load_fact",
    "build_gold_minio",
    "load_gold_postgres",
    "validate_gold_row_count",
    "validate_gold_sanity",
    "validate_gold_freshness",
    "validate_gold_sla",
    "validate_gold"
  )

  /** Reference retry policy (`coin_data_pipeline_optimized.py:47-48`). */
  val retries: Int           = 2
  val retryDelayMinutes: Int = 5

  /** Execute one task of the chain. Every stage is idempotent: re-running a
    * stage after a crash (or an Airflow retry) converges because lake writes
    * go through the atomic publish and warehouse writes are key-based
    * insert-ignore/upsert merges.
    */
  def runStage(spark: SparkSession, stage: String, conf: StageConf): Unit = stage match {
    case "create_tables" =>
      // Parquet serving layout needs no DDL; materialize the warehouse roots
      // so downstream merges have a stable parent, and surface the star-DDL
      // (S9) for operators running against a real warehouse.
      val fs = new org.apache.hadoop.fs.Path(conf.serveRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(conf.serveRoot))
      CoinSchemas.WarehouseDdl.all.foreach(ddl => spark.sparkContext.setJobDescription(
        s"create_tables: ${ddl.linesIterator.next()}"))

    case "extract" =>
      // HTTP pull (S1) → LOCAL raw staging file, the reference's extract
      // contract. Requires an endpoint; offline runs stage the raw file by
      // other means (fixture/backfill) and start from upload_raw_to_s3.
      val url = conf.apiUrl.getOrElse(throw new IllegalArgumentException(
        "extract requires --api-url (offline runs pre-stage the raw file and skip extract)"))
      val json = new HttpCoinMarketsFetcher(url).fetchJson()
      val p = java.nio.file.Paths.get(conf.rawFile)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)

    case "upload_raw_to_s3" =>
      // Local raw staging → bronze lake partition, atomically (the
      // reference's tmp→copy→delete protocol, `:443-456`).
      val fs = new org.apache.hadoop.fs.Path(conf.bronzeDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      LakeSink.stageAndSwap(fs, new org.apache.hadoop.fs.Path(conf.bronzeDir)) { staging =>
        fs.mkdirs(staging)
        fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(conf.rawFile),
          new org.apache.hadoop.fs.Path(staging, s"coins_${conf.ds}.json"))
      }

    case "transform_bronze_to_silver" =>
      val bronze = CoinSources.readBronzeJson(spark, conf.bronzeDir)
      CoinOps.assertNonEmpty(bronze, s"bronze dt=${conf.ds}")
      LakeSink.publishPartition(spark, CoinOps.bronzeToSilver(bronze), conf.lakeRoot,
        "silver/coins", conf.ds, CoinSchemas.silverSchemaVersion, conf.bronzeDir)

    case "validate" =>
      // V1 contract + V2 expectations as their OWN retryable task over the
      // published silver (the reference's task granularity; the in-process
      // EP1 gates before publish instead).
      val silver = CoinSources.readSilver(spark, conf.silverDir)
      CoinOps.enforcedSilver(silver)
      graft.expectations.Suites.fluentSilverSuite.enforce(silver)

    case "load_dim" =>
      val silver = CoinSources.readSilver(spark, conf.silverDir)
      mergeIntoParquet(spark, CoinOps.dimensionRows(silver), conf.dimTable,
        keys = Seq("coin_id"), update = false)

    case "load_fact" =>
      val silver = CoinSources.readSilver(spark, conf.silverDir)
      mergeIntoParquet(spark, CoinOps.factRows(silver), conf.factTable,
        keys = Seq("coin_id", "timestamp"), update = false)

    case "build_gold_minio" =>
      val silver = CoinSources.readSilver(spark, conf.silverDir)
      val gold = CoinOps.goldDailyMetrics(silver, conf.ds)
      CoinOps.assertGoldSanity(gold, conf.ds)
      LakeSink.publishPartition(spark, gold.orderBy("coin_id"), conf.lakeRoot,
        "gold/coins_daily", conf.ds, "v1", conf.silverDir)

    case "load_gold_postgres" =>
      val lakeGold = CoinSources.readGold(spark, conf.goldDir)
        .withColumn("dt", lit(conf.ds))
      CoinPipeline.upsertServe(spark, lakeGold, conf.serveRoot)

    case "validate_gold_row_count" =>
      val lakeGold = CoinSources.readGold(spark, conf.goldDir)
      val served = spark.read.parquet(s"${conf.serveRoot}/gold_coin_daily_metrics")
        .filter(col("dt") === conf.ds)
      CoinOps.assertCountsReconcile(lakeGold, served, conf.ds)

    case "validate_gold_sanity" =>
      CoinOps.assertGoldSanity(CoinSources.readGold(spark, conf.goldDir), conf.ds)

    case "validate_gold_freshness" =>
      CoinOps.assertFreshness(spark, conf.goldDir)

    case "validate_gold_sla" =>
      CoinOps.assertSla(java.time.LocalDate.parse(conf.ds), conf.now, conf.scheduled)

    case "validate_gold" =>
      CoinOps.assertGoldQuality(CoinSources.readGold(spark, conf.goldDir), conf.ds)

    case other =>
      throw new IllegalArgumentException(
        s"unknown stage '$other' — expected one of: ${stageChain.mkString(", ")}")
  }

  /** Key-based insert-ignore (update=false) merge into a parquet warehouse
    * table, published atomically — the parquet twin of the reference's
    * `ON CONFLICT DO NOTHING` dim/fact loads (S6/S7), so stage re-runs
    * converge instead of appending duplicates.
    */
  private def mergeIntoParquet(spark: SparkSession, incoming: DataFrame,
      path: String, keys: Seq[String], update: Boolean): Unit = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(p)) {
        val existing = spark.read.parquet(path)
        if (update) Merge.upsert(existing, incoming, keys)
        else Merge.insertIgnore(existing, incoming, keys)
      } else incoming
    LakeSink.stageAndSwap(fs, p)(staging =>
      merged.write.mode("overwrite").parquet(staging.toString))
    // The swap is a rename, not a Spark write to `path`, so the session's
    // file-listing cache still holds the replaced part files — readers would
    // hit FILE_NOT_EXIST. Invalidate explicitly.
    spark.catalog.refreshByPath(path)
  }

  /** Render the Airflow DAG artifact: one `SparkSubmitOperator` per stage,
    * chained linearly in reference order, with the reference's retry policy.
    * OrchestrationSpec asserts `orchestration/coin_pipeline_dag.py` equals
    * this output exactly.
    */
  def renderAirflowDag(
      jarPath: String = "{{ var.value.graft_jar_path }}",
      mainClass: String = "graft.orchestration.CoinStageRunner"
  ): String = {
    val tasks = stageChain.map { stage =>
      s"""$stage = SparkSubmitOperator(
         |    task_id="$stage",
         |    application=JAR_PATH,
         |    java_class=MAIN_CLASS,
         |    application_args=[
         |        "--stage", "$stage",
         |        "--ds", "{{ ds }}",
         |        "--raw-root", RAW_ROOT,
         |        "--bronze-root", BRONZE_ROOT,
         |        "--lake-root", LAKE_ROOT,
         |        "--serve-root", SERVE_ROOT,
         |        "--scheduled", "true",
         |    ]${if (stage == "extract") """ + ["--api-url", API_URL]""" else ""},
         |    dag=dag,
         |)
         |""".stripMargin
    }.mkString("\n")
    s"""# GENERATED by graft.orchestration.CoinDag.renderAirflowDag — do not edit
       |# by hand; regenerate via `sbt "runMain graft.orchestration.CoinStageRunner
       |# --render-dag orchestration/coin_pipeline_dag.py"`. OrchestrationSpec
       |# asserts this file matches the generator output.
       |#
       |# Orchestration twin of the reference 14-task chain
       |# (dags/coin_data_pipeline_optimized.py:1243) with its retry policy
       |# (:47-48). Each task is one spark-submit of an idempotent stage;
       |# state hands off through the lake, so any task can retry alone.
       |from datetime import timedelta
       |
       |from airflow import DAG
       |from airflow.providers.apache.spark.operators.spark_submit import (
       |    SparkSubmitOperator,
       |)
       |from airflow.utils.dates import days_ago
       |
       |JAR_PATH = "$jarPath"
       |MAIN_CLASS = "$mainClass"
       |RAW_ROOT = "{{ var.value.graft_raw_root }}"
       |BRONZE_ROOT = "{{ var.value.graft_bronze_root }}"
       |LAKE_ROOT = "{{ var.value.graft_lake_root }}"
       |SERVE_ROOT = "{{ var.value.graft_serve_root }}"
       |API_URL = "{{ var.value.graft_api_url }}"
       |
       |default_args = {
       |    "owner": "data-platform",
       |    "depends_on_past": False,
       |    "retries": $retries,
       |    "retry_delay": timedelta(minutes=$retryDelayMinutes),
       |    "email_on_failure": False,
       |    "email_on_retry": False,
       |}
       |
       |dag = DAG(
       |    dag_id="coin_data_pipeline_graft",
       |    default_args=default_args,
       |    description="Spark-native coin medallion pipeline (graft engine)",
       |    schedule_interval="@daily",
       |    start_date=days_ago(1),
       |    catchup=False,
       |)
       |
       |$tasks
       |${stageChain.mkString(" >> ")}
       |""".stripMargin
  }
}
