package graft.pipeline

import graft.sinks.LakeSink
import graft.sources.CoinSources
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Twins of the reference's two transformed-CSV-to-MinIO DAG variants —
  * the last unmirrored legacy pipelines:
  *
  *  - '''day9''' (`dags/crypto_etl_pipeline_day9.py:30-150`): extract
  *    (`per_page=10`, the API's market-cap-descending default order) →
  *    transform (the v1 6-column projection + wall-clock `last_updated`)
  *    with a CSV HANDOFF between every task (`crypto_raw.csv` →
  *    `crypto_transformed.csv` — each task reads what the previous one
  *    put on disk, not what it returned) → row-loop INSERT into the flat
  *    `crypto_data_pipeline` table (`:85-107`, duplicate-on-rerun like
  *    v1) → upload `crypto_transformed.csv` into the `processed` bucket
  *    at `crypto/crypto_transformed.csv` (`:119-141` — create the bucket
  *    if missing, `fput_object` last-writer-wins overwrite).
  *  - '''v4''' (`dags/crypto_etl_pipeline_v4.py:27-79`): `run_etl` shells
  *    out to an EXTERNAL script (subprocess against a developer-machine
  *    path) — outside any engine's scope by design; the variant's whole
  *    in-DAG data surface is the same upload task, which [[runV4]] twins
  *    1:1 over an already-produced transformed CSV.
  *
  * The transform/load kernels are [[FlatPipeline]]'s (same projection,
  * same DDL, same conflict-free append); what this twin adds is the CSV
  * handoff discipline and the object-store publish. The wall clock is
  * injected, as everywhere (`now()` inside a transform would defeat the
  * golden tests).
  */
object MinioPipelines {

  /** day9's `per_page` — the variant fetches 10 rows, not the flagship's
    * 100 (`crypto_etl_pipeline_day9.py:32`).
    */
  val PerPage = 10

  /** The transformed handoff's schema — the 6 kept columns plus the
    * stamp, exactly what `to_csv(index=False)` wrote.
    */
  private val transformedSchema: StructType = StructType.fromDDL(
    "id STRING, symbol STRING, name STRING, current_price DOUBLE, " +
      "market_cap BIGINT, price_change_percentage_24h DOUBLE, " +
      "last_updated TIMESTAMP")

  /** extract + transform with the CSV handoff: the `per_page`-sized slice
    * of bronze in the API's market-cap-descending order (id tiebreak for
    * determinism), projected through [[FlatPipeline.transform]] and
    * staged as ONE headered CSV — pandas' `to_csv(index=False)`. Returns
    * the handoff dir.
    */
  def stageTransformed(spark: SparkSession, bronzePath: String,
      stagingDir: String, lastUpdated: java.sql.Timestamp): String = {
    val bronze = CoinSources.readBronzeJson(spark, bronzePath)
      .orderBy(col("market_cap").desc_nulls_last, col("id"))
      .limit(PerPage)
    val flat = FlatPipeline.transform(bronze, lastUpdated).coalesce(1)
    val dir = s"$stagingDir/crypto_transformed.csv"
    LakeSink.writeCsv(spark, flat, dir)
    dir
  }

  /** day9's load: read the handoff BACK from disk (the reference loads
    * what the file says, not what the transform returned — a schema skew
    * between the two is a bug this twin would surface) and append it
    * row-loop-style into `crypto_data_pipeline`. Duplicates on rerun,
    * exactly like v1. Returns rows loaded.
    */
  def loadFromCsv(spark: SparkSession, transformedCsvDir: String,
      jdbcUrl: String, props: java.util.Properties): Long = {
    val df = spark.read.schema(transformedSchema)
      .option("header", value = true).csv(transformedCsvDir)
    FlatPipeline.ensureTable(jdbcUrl, props)
    val n = df.count()
    FlatPipeline.load(df, jdbcUrl, props)
    n
  }

  /** The MinIO upload twin (day9 task 4; v4's whole in-DAG surface):
    * ensure the bucket "exists" (`make_bucket` if missing), then publish
    * the handoff's single CSV part as ONE object at
    * `<storeRoot>/<bucket>/<objectName>` — staged copy + delete + rename,
    * so a reader sees the old object or the new one, never a half-written
    * file (`fput_object`'s last-writer-wins overwrite, made atomic).
    * Returns the object path.
    */
  def uploadTransformed(spark: SparkSession, transformedCsvDir: String,
      storeRoot: String, bucket: String = "processed",
      objectName: String = "crypto/crypto_transformed.csv"): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcDir = new Path(transformedCsvDir)
    val srcFs = srcDir.getFileSystem(conf)
    val part = srcFs.listStatus(srcDir)
      .find(f => f.getPath.getName.startsWith("part-") &&
        f.getPath.getName.endsWith(".csv"))
      .getOrElse(sys.error(
        s"no CSV part file under $transformedCsvDir — stage the handoff first"))
      .getPath
    val bucketDir = new Path(storeRoot, bucket)
    val dstFs = bucketDir.getFileSystem(conf)
    if (!dstFs.exists(bucketDir)) dstFs.mkdirs(bucketDir) // make_bucket
    val dst = new Path(bucketDir, objectName)
    if (!dstFs.exists(dst.getParent)) dstFs.mkdirs(dst.getParent)
    val staged = new Path(dst.getParent,
      s".staging-${java.util.UUID.randomUUID}")
    org.apache.hadoop.fs.FileUtil.copy(srcFs, part, dstFs, staged,
      false, conf)
    dstFs.delete(dst, false)
    if (!dstFs.rename(staged, dst))
      sys.error(s"upload publish failed: could not rename $staged to $dst")
    dst.toString
  }

  /** The whole day9 chain: extract→transform (CSV handoff) → load →
    * upload. Returns (rows loaded, published object path).
    */
  def runDay9(spark: SparkSession, bronzePath: String, stagingDir: String,
      jdbcUrl: String, props: java.util.Properties, storeRoot: String,
      lastUpdated: java.sql.Timestamp): (Long, String) = {
    val handoff = stageTransformed(spark, bronzePath, stagingDir, lastUpdated)
    val n = loadFromCsv(spark, handoff, jdbcUrl, props)
    (n, uploadTransformed(spark, handoff, storeRoot))
  }

  /** The v4 chain's in-DAG surface: upload an externally-produced
    * transformed CSV (the `run_etl` subprocess is out of scope — it runs
    * a developer-machine script the repo doesn't contain).
    */
  def runV4(spark: SparkSession, transformedCsvDir: String,
      storeRoot: String): String =
    uploadTransformed(spark, transformedCsvDir, storeRoot)
}
