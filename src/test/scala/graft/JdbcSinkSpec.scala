package graft

import graft.sinks.JdbcUpsertSink
import org.apache.spark.sql.functions._
import java.sql.DriverManager

/** Executes the JDBC sink's executor-side path (connection, prepared-batch,
  * commit) against embedded Derby — the reference's daily warehouse loads
  * are insert-ignore (dim/fact) and last-writer-wins upsert (gold)
  * (`dags/coin_data_pipeline_optimized.py:578-589,672-677,923-933`); this
  * suite proves those semantics and idempotent re-runs on a real database,
  * not just the generated SQL text.
  */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()

  private def withTable(ddl: String, name: String)(body: => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(s"DROP TABLE $name")
      catch { case _: java.sql.SQLException => () } // didn't exist
      conn.createStatement().execute(ddl)
    } finally conn.close()
    body
  }

  private def queryMap(sql: String): Map[String, Double] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val out = scala.collection.mutable.Map[String, Double]()
      while (rs.next()) out += rs.getString(1) -> rs.getDouble(2)
      out.toMap
    } finally conn.close()
  }

  private def count(table: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("insert-ignore: existing rows keep their values; re-run is idempotent") {
    withTable(
      "CREATE TABLE dim_coin (coin_id VARCHAR(64) NOT NULL PRIMARY KEY, price DOUBLE)",
      "dim_coin") {
      val conn = DriverManager.getConnection(url)
      try conn.createStatement()
        .execute("INSERT INTO dim_coin VALUES ('btc', 1.0), ('eth', 2.0)")
      finally conn.close()

      val df = Seq(("btc", 999.0), ("eth", 999.0), ("sol", 3.0), ("ada", 4.0))
        .toDF("coin_id", "price").repartition(2, col("coin_id"))
      val sql = JdbcUpsertSink.mergeSql("dim_coin", df.schema, Seq("coin_id"),
        updateOnMatch = false)
      JdbcUpsertSink.write(df, url, props, sql)

      queryMap("SELECT coin_id, price FROM dim_coin") shouldBe
        Map("btc" -> 1.0, "eth" -> 2.0, "sol" -> 3.0, "ada" -> 4.0)

      JdbcUpsertSink.write(df, url, props, sql) // idempotent re-run
      count("dim_coin") shouldBe 4L
      queryMap("SELECT coin_id, price FROM dim_coin")("btc") shouldBe 1.0
    }
  }

  test("upsert: last-writer-wins on non-key columns; re-run is idempotent") {
    withTable(
      "CREATE TABLE gold_agg (coin_id VARCHAR(64) NOT NULL PRIMARY KEY, " +
        "price DOUBLE, n BIGINT)",
      "gold_agg") {
      val conn = DriverManager.getConnection(url)
      try conn.createStatement()
        .execute("INSERT INTO gold_agg VALUES ('btc', 1.0, 10), ('eth', 2.0, 20)")
      finally conn.close()

      val df = Seq(("btc", 100.0, 11L), ("sol", 3.0, 30L))
        .toDF("coin_id", "price", "n").repartition(2, col("coin_id"))
      val sql = JdbcUpsertSink.mergeSql("gold_agg", df.schema, Seq("coin_id"),
        updateOnMatch = true)
      JdbcUpsertSink.write(df, url, props, sql)

      queryMap("SELECT coin_id, price FROM gold_agg") shouldBe
        Map("btc" -> 100.0, "eth" -> 2.0, "sol" -> 3.0)

      JdbcUpsertSink.write(df, url, props, sql)
      count("gold_agg") shouldBe 3L
      queryMap("SELECT coin_id, n FROM gold_agg") shouldBe
        Map("btc" -> 11.0, "eth" -> 20.0, "sol" -> 30.0)
    }
  }

  test("batch boundaries: batchSize dividing and not dividing the partition") {
    withTable(
      "CREATE TABLE facts (k VARCHAR(64) NOT NULL PRIMARY KEY, v BIGINT)",
      "facts") {
      // 23 rows in ONE partition with batchSize 7 → executeBatch at 7, 14,
      // 21 and a final flush of 2; then 21 rows re-run (exact multiple, and
      // all conflicting → DO NOTHING path through every batch).
      val df = (1 to 23).map(i => (f"k$i%03d", i.toLong)).toDF("k", "v").coalesce(1)
      val sql = JdbcUpsertSink.mergeSql("facts", df.schema, Seq("k"),
        updateOnMatch = false)
      JdbcUpsertSink.write(df, url, props, sql, batchSize = 7)
      count("facts") shouldBe 23L
      JdbcUpsertSink.write(df.limit(21), url, props, sql, batchSize = 7)
      count("facts") shouldBe 23L
    }
  }

  test("typed columns (timestamp, date, decimal, boolean) round-trip") {
    withTable(
      "CREATE TABLE typed (k VARCHAR(64) NOT NULL PRIMARY KEY, ts TIMESTAMP, " +
        "d DATE, amount DECIMAL(10,2), flag BOOLEAN)",
      "typed") {
      val df = Seq(
        ("a", java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
          java.sql.Date.valueOf("2024-01-02"), BigDecimal("12.34"), true),
        ("b", java.sql.Timestamp.valueOf("2024-02-03 04:05:06"),
          java.sql.Date.valueOf("2024-02-03"), BigDecimal("56.78"), false)
      ).toDF("k", "ts", "d", "amount", "flag")
        .withColumn("amount", col("amount").cast("decimal(10,2)"))
      val sql = JdbcUpsertSink.mergeSql("typed", df.schema, Seq("k"),
        updateOnMatch = true)
      JdbcUpsertSink.write(df, url, props, sql)

      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT ts, d, amount, flag FROM typed WHERE k = 'a'")
        rs.next()
        rs.getTimestamp(1) shouldBe java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
        rs.getDate(2).toString shouldBe "2024-01-02"
        rs.getBigDecimal(3) shouldBe new java.math.BigDecimal("12.34")
        rs.getBoolean(4) shouldBe true
      } finally conn.close()
    }
  }

  test("generated merge SQL casts every placeholder and binds in clause order") {
    val schema = Seq(("k", 1L, 2.0)).toDF("k", "n", "x").schema
    val st = JdbcUpsertSink.mergeSql("t", schema, Seq("k"), updateOnMatch = true)
    st.sql should include ("ON t.k = CAST(? AS VARCHAR(4000))")
    st.sql should include ("CAST(? AS BIGINT)")
    st.sql should include ("WHEN MATCHED THEN UPDATE SET n = CAST(? AS BIGINT), " +
      "x = CAST(? AS DOUBLE)")
    // keys (ON), all columns (INSERT), non-keys (UPDATE)
    st.paramColumns shouldBe Seq("k", "k", "n", "x", "n", "x")
    val ignore = JdbcUpsertSink.mergeSql("t", schema, Seq("k"), updateOnMatch = false)
    ignore.sql should not include "WHEN MATCHED"
    ignore.paramColumns shouldBe Seq("k", "k", "n", "x")
    an[IllegalArgumentException] should be thrownBy
      JdbcUpsertSink.mergeSql("t", schema, Seq("nope"), updateOnMatch = false)
  }

  test("Postgres dialect: generated ON CONFLICT text matches the reference statements") {
    // The reference's two warehouse loads, verbatim
    // (dags/coin_data_pipeline_optimized.py:665-670 fact insert-ignore,
    // :923-933 gold upsert). execute_values' VALUES %s template expands to
    // a row tuple per record; the JDBC equivalent is one (?, …) tuple
    // bound per batched row — that substitution and whitespace layout are
    // the ONLY differences allowed: after canonicalizing both, the texts
    // must be byte-identical (column order and conflict targets included).
    def canon(sql: String): String =
      sql.replaceAll("\\s+", " ").stripSuffix(";").replace(" ;", "").trim
    def pgize(referenceSql: String, arity: Int): String =
      canon(referenceSql).replace("VALUES %s",
        s"VALUES (${Seq.fill(arity)("?").mkString(", ")})")

    val refFact =
      """INSERT INTO coin_prices_fact
        |(coin_id, price_usd, market_cap, timestamp)
        |VALUES %s
        |ON CONFLICT (coin_id, timestamp) DO NOTHING""".stripMargin
    JdbcUpsertSink.insertIgnoreSql("coin_prices_fact",
      Seq("coin_id", "price_usd", "market_cap", "timestamp"),
      keys = Seq("coin_id", "timestamp")) shouldBe pgize(refFact, 4)

    val refGold =
      """INSERT INTO gold_coin_daily_metrics
        |(dt, coin_id, avg_price_usd, min_price_usd, max_price_usd, avg_market_cap)
        |VALUES %s
        |ON CONFLICT (dt, coin_id)
        |DO UPDATE SET
        |    avg_price_usd   = EXCLUDED.avg_price_usd,
        |    min_price_usd   = EXCLUDED.min_price_usd,
        |    max_price_usd   = EXCLUDED.max_price_usd,
        |    avg_market_cap  = EXCLUDED.avg_market_cap;""".stripMargin
    canon(JdbcUpsertSink.upsertSql("gold_coin_daily_metrics",
      Seq("dt", "coin_id", "avg_price_usd", "min_price_usd", "max_price_usd",
        "avg_market_cap"),
      keys = Seq("dt", "coin_id"))) shouldBe pgize(refGold, 6)
  }

  test("long strings: loud failure at the default width, typeOverrides widen") {
    withTable(
      "CREATE TABLE docs_t (k VARCHAR(64) NOT NULL PRIMARY KEY, body VARCHAR(8000))",
      "docs_t") {
      val long = "x" * 5000 // over the default CAST width of 4000
      val df = Seq(("a", long)).toDF("k", "body")

      // default mapping: fails loudly instead of silently truncating
      val st = JdbcUpsertSink.mergeSql("docs_t", df.schema, Seq("k"),
        updateOnMatch = false)
      st.varcharWidths shouldBe Map("k" -> 4000, "body" -> 4000)
      val e = intercept[Throwable](JdbcUpsertSink.write(df, url, props, st))
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
        include("truncate")

      // per-column override: declared width matches the target column
      val wide = JdbcUpsertSink.mergeSql("docs_t", df.schema, Seq("k"),
        updateOnMatch = false, typeOverrides = Map("body" -> "VARCHAR(8000)"))
      wide.sql should include ("CAST(? AS VARCHAR(8000))")
      wide.varcharWidths("body") shouldBe 8000
      JdbcUpsertSink.write(df, url, props, wide)
      count("docs_t") shouldBe 1L

      // overrides must name real columns
      an[IllegalArgumentException] should be thrownBy
        JdbcUpsertSink.mergeSql("docs_t", df.schema, Seq("k"),
          updateOnMatch = false, typeOverrides = Map("nope" -> "VARCHAR(10)"))
    }
  }
}
