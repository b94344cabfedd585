package graft.pipeline

import graft.expectations.GeCheckpoint
import graft.ops.CoinOps
import graft.sinks.{JdbcUpsertSink, LakeSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP2 twin — the reference's day-10 warehouse DAG
  * (`dags/crypto_etl_datawarehouse_day10.py:144`: extract >> transform >>
  * validate >> load_dim >> load_fact). Stage handoffs are CSV files in a
  * datasets dir (the reference's `/opt/airflow/datasets` file boundary),
  * validation is a FILE-CONFIGURED expectations checkpoint
  * ([[GeCheckpoint]], twin of `ge.DataContext(...).run_checkpoint` at
  * `:70-84`), the dimension load is insert-ignore with the constant
  * `category='cryptocurrency'` (`:97-102`), and the fact load is a
  * conflict-free append (`:125-129`).
  */
object WarehousePipeline {

  final case class Ep2Result(extracted: Long, validated: Int, dimLoaded: Long,
      factLoaded: Long)

  val dimDdl: String =
    """CREATE TABLE coin_dimension (
      |  coin_id VARCHAR(128) NOT NULL PRIMARY KEY, name VARCHAR(256),
      |  symbol VARCHAR(64), category VARCHAR(64)
      |)""".stripMargin

  val factDdl: String =
    """CREATE TABLE coin_prices_fact (
      |  coin_id VARCHAR(128), price_usd DOUBLE, market_cap BIGINT,
      |  ts TIMESTAMP
      |)""".stripMargin

  def ensureTables(jdbcUrl: String, props: java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
    try Seq(dimDdl, factDdl).foreach { ddl =>
      try conn.createStatement().execute(ddl)
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
    } finally conn.close()
  }

  /** Day-10 transform (`crypto_etl_datawarehouse_day10.py:48-57`): 6-column
    * projection + rename to (coin_id, price_usd, timestamp). The timestamp
    * string is cast (the reference defers coercion to Postgres).
    */
  def transform(raw: DataFrame): DataFrame =
    raw.select(
      col("id").alias("coin_id"),
      col("symbol"), col("name"),
      col("current_price").cast("double").alias("price_usd"),
      col("market_cap").cast("long").alias("market_cap"),
      try_to_timestamp(col("last_updated")).alias("timestamp"))

  /** extract >> transform >> validate(file checkpoint) >> dim >> fact. */
  def run(
      spark: SparkSession,
      bronzePath: String,
      datasetsDir: String,
      checkpointPath: String,
      jdbcUrl: String,
      props: java.util.Properties
  ): Ep2Result = {
    // Extract: bronze JSON → raw CSV handoff (struct columns dropped — CSV
    // can't carry them; the reference stringifies the unused `roi` dict).
    val bronze = graft.sources.CoinSources.readBronzeJson(spark, bronzePath)
    val rawCols = bronze.schema.fields.toSeq
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      .map(f => col(f.name))
    LakeSink.writeCsv(spark, bronze.select(rawCols: _*), s"$datasetsDir/coin_raw")

    // Transform: read the handoff back (schema supplied, never inferred),
    // project + rename, write the transformed handoff.
    val raw = spark.read
      .schema(org.apache.spark.sql.types.StructType(
        graft.schema.CoinSchemas.bronze.fields.toSeq
          .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])))
      .option("header", value = true)
      .csv(s"$datasetsDir/coin_raw")
    val transformedOut = transform(raw)
    LakeSink.writeCsv(spark, transformedOut
      .withColumn("timestamp", date_format(col("timestamp"),
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")), s"$datasetsDir/coin_transformed")

    // Validate + load consume the handoff FILE, not the in-memory frame —
    // the reference's validate/load stages re-read the transformed CSV, so
    // round-trip corruption (timestamp formatting, null encoding) must be
    // caught here, not silently bypassed.
    val transformed = spark.read
      .schema(transformedOut.schema)
      .option("header", value = true)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(s"$datasetsDir/coin_transformed")

    // Validate: file-configured checkpoint, throw on failure (reference
    // raises ValueError when result.success is false).
    val suite = GeCheckpoint.load(spark, checkpointPath)
    val results = suite.enforce(transformed)

    ensureTables(jdbcUrl, props)

    // Dimension: insert-ignore, constant category (P5).
    val dim = CoinOps.dimensionRows(transformed)
    val dimStmt = JdbcUpsertSink.mergeSql("coin_dimension", dim.schema,
      Seq("coin_id"), updateOnMatch = false)
    JdbcUpsertSink.write(dim, jdbcUrl, props, dimStmt)

    // Fact: conflict-free append (the reference's plain INSERT loop).
    val fact = transformed.select(col("coin_id"), col("price_usd"),
      col("market_cap"), col("timestamp").alias("ts"))
    val factSql = "INSERT INTO coin_prices_fact (coin_id, price_usd, market_cap, ts) " +
      "VALUES (?, ?, ?, ?)"
    JdbcUpsertSink.write(fact, jdbcUrl, props, factSql)

    Ep2Result(bronze.count(), results.size, dim.count(), fact.count())
  }
}
