package graft

import graft.sinks.JdbcUpsertSink
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.sys.process._

/** LIVE PostgreSQL leg for S6-S8: boots a DISPOSABLE PostgreSQL 15
  * cluster (initdb + pg_ctl as an unprivileged user on a unix socket —
  * the server binaries ship in this image; no TCP port is taken) and
  * executes the sink's GENERATED statements against it via psql
  * `PREPARE`/`EXECUTE` — the reference's actual warehouse engine
  * (`docker-compose.yaml:36-59` runs Postgres 13; its `ON CONFLICT`
  * texts live at `dags/coin_data_pipeline_optimized.py:578-589,672-677,
  * 923-933`), so the dialect, conflict-key semantics, TIMESTAMPTZ
  * equality and NUMERIC exactness are proven on a real server, not just
  * asserted as text.
  *
  * Boundary (SURVEY §8): the image carries the Postgres SERVER but no
  * pgjdbc driver jar (and the build is zero-egress), so the
  * executor-side JDBC path — connection pooling, prepared-batch,
  * commit — is proven on Derby ([[JdbcSinkSpec]]) while the statements
  * are proven here on live PG; the one untested seam that remains is
  * the pgjdbc driver itself.
  *
  * Skips (cancels) cleanly when the server binaries are absent.
  */
class JdbcPgLiveSpec extends AnyFunSuite with Matchers
    with BeforeAndAfterAll {

  private val pgBin = "/usr/local/bin"
  private def sh(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(
      s => out.append(s).append('\n'), s => out.append(s).append('\n')))
    (code, out.toString)
  }

  private val available: Boolean =
    new java.io.File(s"$pgBin/postgres").exists() &&
      new java.io.File("/usr/bin/psql").exists() &&
      new java.io.File("/usr/sbin/runuser").exists()

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-pglive").toString
  private def sock = s"$dir/sock"
  private var booted = false

  override def beforeAll(): Unit = if (available) {
    sh(Seq("mkdir", "-p", s"$dir/data", sock))
    sh(Seq("chown", "-R", "nobody", dir))
    val (c1, o1) = sh(Seq("runuser", "-u", "nobody", "--",
      s"$pgBin/initdb", "-D", s"$dir/data", "-A", "trust", "-U", "graft"))
    require(c1 == 0, s"initdb failed:\n$o1")
    val (c2, o2) = sh(Seq("runuser", "-u", "nobody", "--",
      s"$pgBin/pg_ctl", "-D", s"$dir/data",
      "-o", s"-k $sock -c listen_addresses=",
      "-l", s"$dir/log", "-w", "start"))
    require(c2 == 0, s"pg_ctl start failed:\n$o2")
    booted = true
  }

  override def afterAll(): Unit = if (booted) {
    sh(Seq("runuser", "-u", "nobody", "--",
      s"$pgBin/pg_ctl", "-D", s"$dir/data", "-m", "immediate", "stop"))
    sh(Seq("rm", "-rf", dir))
  }

  private def psql(sql: String): String = {
    val (c, out) = sh(Seq("/usr/bin/psql", "-h", sock, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql))
    withClue(out) { c shouldBe 0 }
    out.trim
  }

  /** `?` placeholders → `$1..$n` (psql's PREPARE form; positional order
    * is identical to the JDBC bind order).
    */
  private def prepared(sql: String): String = {
    var i = 0
    sql.flatMap {
      case '?' => i += 1; s"$$$i"
      case ch => ch.toString
    }
  }

  /** PREPARE the generated statement once, EXECUTE it per row with
    * string literals (PG coerces to the target column types — exactly
    * the untyped-parameter behavior the prepared JDBC path relies on).
    */
  private def execRows(sql: String, rows: Seq[Seq[String]]): Unit = {
    val name = s"g${math.abs(sql.hashCode)}"
    val execs = rows.map(_.map(v => "'" + v.replace("'", "''") + "'")
      .mkString(s"EXECUTE $name(", ",", ");")).mkString(" ")
    psql(s"PREPARE $name AS ${prepared(sql)}; $execs DEALLOCATE $name;")
  }

  test("live PG: dim insert-ignore keeps existing rows, re-run idempotent") {
    assume(available, "postgres server binaries not present")
    psql("""CREATE TABLE coin_dimension (
      coin_id VARCHAR(64) PRIMARY KEY, symbol VARCHAR(32),
      category VARCHAR(32))""")
    psql("INSERT INTO coin_dimension VALUES ('btc','BTC','cryptocurrency')")
    val sql = JdbcUpsertSink.insertIgnoreSql("coin_dimension",
      Seq("coin_id", "symbol", "category"), Seq("coin_id"))
    sql should include("ON CONFLICT (coin_id) DO NOTHING")
    val rows = Seq(
      Seq("btc", "CLOBBERED", "cryptocurrency"), // conflict: must not land
      Seq("eth", "ETH", "cryptocurrency"))
    execRows(sql, rows)
    execRows(sql, rows) // idempotent re-run
    psql("SELECT coin_id || '|' || symbol FROM coin_dimension ORDER BY 1")
      .split("\n").toSeq shouldBe Seq("btc|BTC", "eth|ETH")
  }

  test("live PG: fact composite-key ignore under TIMESTAMPTZ equality across spellings") {
    assume(available, "postgres server binaries not present")
    psql("""CREATE TABLE coin_prices_fact (
      coin_id VARCHAR(64), ts TIMESTAMPTZ, price NUMERIC,
      PRIMARY KEY (coin_id, ts))""")
    val sql = JdbcUpsertSink.insertIgnoreSql("coin_prices_fact",
      Seq("coin_id", "ts", "price"), Seq("coin_id", "ts"))
    // the same instant spelled in two zones: TIMESTAMPTZ normalizes, so
    // the second row is a CONFLICT and must be ignored — the exact edge
    // a naive text-equality key check would get wrong
    execRows(sql, Seq(
      Seq("btc", "2026-01-01T00:00:00Z", "100.5"),
      Seq("btc", "2026-01-01 01:00:00+01", "999.9")))
    psql("SELECT COUNT(*) FROM coin_prices_fact") shouldBe "1"
    psql("SELECT price FROM coin_prices_fact") shouldBe "100.5"
  }

  test("live PG: gold upsert is last-writer-wins and NUMERIC stays exact beyond double precision") {
    assume(available, "postgres server binaries not present")
    psql("""CREATE TABLE gold_coin_daily_metrics (
      dt DATE, coin_id VARCHAR(64), avg_price NUMERIC, market_cap NUMERIC,
      PRIMARY KEY (dt, coin_id))""")
    val cols = Seq("dt", "coin_id", "avg_price", "market_cap")
    val sql = JdbcUpsertSink.upsertSql("gold_coin_daily_metrics", cols,
      Seq("dt", "coin_id"))
    sql should include("DO UPDATE SET avg_price = EXCLUDED.avg_price")
    val bigExact = "12345678901234567890.123456789" // > double mantissa
    execRows(sql, Seq(Seq("2026-01-01", "btc", "1.0", "10")))
    execRows(sql, Seq(Seq("2026-01-01", "btc", "2.5", bigExact)))
    psql("SELECT avg_price || '|' || market_cap " +
      "FROM gold_coin_daily_metrics") shouldBe s"2.5|$bigExact"
    // idempotent re-run of the same delivery
    execRows(sql, Seq(Seq("2026-01-01", "btc", "2.5", bigExact)))
    psql("SELECT COUNT(*) FROM gold_coin_daily_metrics") shouldBe "1"
  }
}
