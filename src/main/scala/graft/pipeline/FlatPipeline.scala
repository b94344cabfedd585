package graft.pipeline

import graft.sinks.JdbcUpsertSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP3 twin — the reference's v1 `crypto_etl_pipeline`
  * (`dags/crypto_etl_dag.py:132`: extract >> transform >> load): a 6-column
  * projection of bronze plus a WALL-CLOCK `last_updated` stamp
  * (`crypto_etl_dag.py:60-61`), appended row-loop-style into the flat
  * `crypto_data_pipeline` table (`:91-107`). Two deliberate reference
  * behaviors are preserved: `market_cap` is BIGINT (unlike EP1's silver
  * double), and the load has NO conflict handling — re-running a day
  * duplicates its rows.
  *
  * The wall-clock stamp is injected as a parameter (the engine never calls
  * `now()` inside a transform — that would make runs unreproducible and
  * defeat the oracle).
  */
object FlatPipeline {

  val tableName = "crypto_data_pipeline"

  /** `CREATE TABLE` DDL (`crypto_etl_dag.py:91-101`), ANSI/Derby types. */
  val ddl: String =
    s"""CREATE TABLE $tableName (
       |  id VARCHAR(128), symbol VARCHAR(64), name VARCHAR(256),
       |  current_price DOUBLE, market_cap BIGINT,
       |  price_change_percentage_24h DOUBLE, last_updated TIMESTAMP
       |)""".stripMargin

  /** `CREATE TABLE IF NOT EXISTS` semantics: Derby lacks the clause, so the
    * table-already-exists SQLState (X0Y32) is swallowed — everything else
    * propagates.
    */
  def ensureTable(jdbcUrl: String, props: java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
    try conn.createStatement().execute(ddl)
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    } finally conn.close()
  }

  /** The v1 transform (`crypto_etl_dag.py:60-61`): keep 6 columns, stamp
    * `last_updated` with the (injected) wall clock. `market_cap` keeps its
    * raw int64.
    */
  def transform(bronze: DataFrame, lastUpdated: java.sql.Timestamp): DataFrame =
    bronze.select(
      col("id"), col("symbol"), col("name"),
      col("current_price").cast("double").alias("current_price"),
      col("market_cap").cast("long").alias("market_cap"),
      col("price_change_percentage_24h").cast("double")
        .alias("price_change_percentage_24h"),
      lit(lastUpdated).alias("last_updated"))

  /** Plain batched INSERT append — the reference's conflict-free row loop
    * (`crypto_etl_dag.py:103-107`). Executor-parallel, batched.
    */
  def load(df: DataFrame, jdbcUrl: String, props: java.util.Properties,
      batchSize: Int = 1000): Unit = {
    val cols = df.columns
    val sql = s"INSERT INTO $tableName (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    JdbcUpsertSink.write(df, jdbcUrl, props, sql, batchSize)
  }

  /** extract(bronze json) >> transform >> load. Returns rows loaded. */
  def run(spark: SparkSession, bronzePath: String, jdbcUrl: String,
      props: java.util.Properties, lastUpdated: java.sql.Timestamp): Long = {
    val bronze = graft.sources.CoinSources.readBronzeJson(spark, bronzePath)
    val flat   = transform(bronze, lastUpdated)
    ensureTable(jdbcUrl, props)
    val n = flat.count()
    load(flat, jdbcUrl, props)
    n
  }
}
