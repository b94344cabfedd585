package graft

import graft.sinks.{JdbcUpsertSink, Merge}
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def kv(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("k", "v")

  private def asMap(df: DataFrame): Map[Long, Set[String]] =
    df.collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("insertIgnore keeps existing rows on conflict and adds fresh keys") {
    val existing = kv(Seq(1L -> "old1", 2L -> "old2"))
    val incoming = kv(Seq(2L -> "new2", 3L -> "new3"))
    val out = asMap(Merge.insertIgnore(existing, incoming, Seq("k")))
    out shouldBe Map(1L -> Set("old1"), 2L -> Set("old2"), 3L -> Set("new3"))
  }

  test("upsert replaces on conflict and keeps both unmatched sides") {
    val existing = kv(Seq(1L -> "old1", 2L -> "old2"))
    val incoming = kv(Seq(2L -> "new2", 3L -> "new3"))
    val out = asMap(Merge.upsert(existing, incoming, Seq("k")))
    out shouldBe Map(1L -> Set("old1"), 2L -> Set("new2"), 3L -> Set("new3"))
  }

  test("property: both merges are idempotent (load ∘ load ≡ load)") {
    val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.oneOf("a", "b", "c")))
    val prop = Prop.forAll(rowsGen, rowsGen) { (tgt, src) =>
      val existing = kv(tgt.distinctBy(_._1))
      val incoming = kv(src.distinctBy(_._1))
      val up1 = Merge.upsert(existing, incoming, Seq("k"))
      val up2 = Merge.upsert(up1, incoming, Seq("k"))
      val ii1 = Merge.insertIgnore(existing, incoming, Seq("k"))
      val ii2 = Merge.insertIgnore(ii1, incoming, Seq("k"))
      asMap(up1) == asMap(up2) && asMap(ii1) == asMap(ii2)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("upsert result keys are the union; each key has exactly one row") {
    val existing = kv(Seq(1L -> "a", 2L -> "a", 5L -> "a"))
    val incoming = kv(Seq(2L -> "b", 3L -> "b"))
    val out = Merge.upsert(existing, incoming, Seq("k"))
    out.count() shouldBe 4
    out.select("k").distinct().count() shouldBe 4
  }

  test("incoming duplicates: insertIgnore picks at most one winner per key") {
    val existing = kv(Seq(1L -> "old"))
    val incoming = kv(Seq(2L -> "x", 2L -> "y"))
    val out = Merge.insertIgnore(existing, incoming, Seq("k"))
    out.filter($"k" === 2L).count() shouldBe 1
  }

  // ---- SCD2 --------------------------------------------------------------

  private val histCols = Seq("k", "v", "valid_from", "valid_to", "is_current")

  private def emptyHist: DataFrame =
    Seq.empty[(Long, String, Long, Option[Long], Boolean)]
      .toDF(histCols: _*)

  private def versions(df: DataFrame): Seq[(Long, String, Long, Option[Long], Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSeq.sortBy(t => (t._1, t._3))

  test("scd2: changes open versions, validity windows butt-join, no-change collapses") {
    val batch = Seq(
      (1L, "a", 10L), (1L, "a", 20L), (1L, "b", 30L), // a re-observed, then changes
      (2L, "x", 15L)
    ).toDF("k", "v", "ts")
    val out = versions(Merge.scd2(emptyHist, batch, Seq("k"), Seq("v"), "ts"))
    out shouldBe Seq(
      (1L, "a", 10L, Some(30L), false), // closed exactly at the change instant
      (1L, "b", 30L, None, true),
      (2L, "x", 15L, None, true))
  }

  test("scd2: second batch closes current rows; closed history passes through; late data dropped") {
    val h1 = Merge.scd2(emptyHist,
      Seq((1L, "a", 10L), (1L, "b", 30L)).toDF("k", "v", "ts"),
      Seq("k"), Seq("v"), "ts")
    val h2 = Merge.scd2(h1,
      Seq((1L, "c", 50L), (1L, "zz", 5L)).toDF("k", "v", "ts"), // 5L is late: ignored
      Seq("k"), Seq("v"), "ts")
    versions(h2) shouldBe Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(50L), false),
      (1L, "c", 50L, None, true))
    // re-applying the SAME batch is a no-op (every observation is now late)
    versions(Merge.scd2(h2,
      Seq((1L, "c", 50L), (1L, "zz", 5L)).toDF("k", "v", "ts"),
      Seq("k"), Seq("v"), "ts")) shouldBe versions(h2)
  }

  test("scd2: same-ts ties break on tieCol for a deterministic chain") {
    val batch = Seq((1L, "a", 10L, 1L), (1L, "b", 10L, 2L))
      .toDF("k", "v", "ts", "seq")
    val out = versions(Merge.scd2(emptyHist, batch, Seq("k"), Seq("v"), "ts",
      tieCol = Some("seq")))
    out shouldBe Seq(
      (1L, "a", 10L, Some(10L), false),
      (1L, "b", 10L, None, true))
  }

  test("JDBC sink executes batched partition writes against a real database") {
    // Derby ships with Spark (metastore dependency); its SQL has no ON
    // CONFLICT, so this exercises the execution path — per-partition
    // connections, prepared-statement batching, transaction commit — with a
    // plain INSERT. The ON CONFLICT texts are asserted separately below.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE fact (coin_id VARCHAR(32), price_usd DOUBLE)")
    conn.close()

    val df = spark.range(250).selectExpr(
      "CAST(concat('coin-', id) AS STRING) AS coin_id",
      "CAST(id AS DOUBLE) * 1.5 AS price_usd")
    JdbcUpsertSink.write(df, url, new java.util.Properties,
      "INSERT INTO fact (coin_id, price_usd) VALUES (?, ?)", batchSize = 100)

    val check = java.sql.DriverManager.getConnection(url)
    val rs = check.createStatement().executeQuery(
      "SELECT COUNT(*), SUM(price_usd) FROM fact")
    rs.next() shouldBe true
    rs.getLong(1) shouldBe 250L
    rs.getDouble(2) shouldBe (0 until 250).map(_ * 1.5).sum +- 1e-9
    check.close()
  }

  test("JDBC upsert SQL generation matches Postgres ON CONFLICT shapes") {
    JdbcUpsertSink.insertIgnoreSql("coin_dimension",
      Seq("coin_id", "name", "symbol", "category"), Seq("coin_id")) shouldBe
      "INSERT INTO coin_dimension (coin_id, name, symbol, category) " +
        "VALUES (?, ?, ?, ?) ON CONFLICT (coin_id) DO NOTHING"
    JdbcUpsertSink.upsertSql("gold_coin_daily_metrics",
      Seq("dt", "coin_id", "avg_price_usd"), Seq("dt", "coin_id")) shouldBe
      "INSERT INTO gold_coin_daily_metrics (dt, coin_id, avg_price_usd) " +
        "VALUES (?, ?, ?) ON CONFLICT (dt, coin_id) DO UPDATE SET " +
        "avg_price_usd = EXCLUDED.avg_price_usd"
  }
}
