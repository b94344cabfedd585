package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must light up the custom expressions as SQL functions in
  * a session configured only via `spark.sql.extensions` — no imperative
  * registration.
  */
class ExtensionsSpec extends SparkTestBase {

  // getOrCreate would reuse the shared test session and silently skip
  // extension injection — build a genuinely new session over the same
  // SparkContext with GraftExtensions applied.
  private lazy val extSpark: SparkSession =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.newSessionWithExtensions(
      spark.sparkContext, new graft.plans.GraftExtensions().apply(_))

  test("extension-injected SQL functions resolve and compute") {
    val row = extSpark.sql(
      """SELECT
        |  round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS cos_same,
        |  round(cosine_similarity(array(1.0F, 0.0F), array(0.0F, 1.0F)), 6) AS cos_orth,
        |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
        |  simhash64(array('a', 'b')) = simhash64(array('a', 'b')) AS sim_det,
        |  rolling_hash('abc') AS rh,
        |  size(hashed_shingles(array('a','b','c','d'), 2)) AS n_shingles,
        |  size(minhash_sig(hashed_shingles(array('a','b','c'), 2), 8)) AS sig_len,
        |  round(sqrt(aggregate(transform(l2_normalize(array(3.0F, 4.0F)), x -> CAST(x * x AS DOUBLE)),
        |    CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)), 6) AS unit_norm
        |""".stripMargin).collect()(0)
    row.getDouble(0) shouldBe 1.0
    row.getDouble(1) shouldBe 0.0
    row.getDouble(2) shouldBe 11.0
    row.getBoolean(3) shouldBe true
    row.getLong(4) should not be 0L
    row.getInt(5) shouldBe 3   // "a b","b c","c d"
    row.getInt(6) shouldBe 8
    row.getDouble(7) shouldBe 1.0
  }

  test("BinnedRangeJoinRule rewrites a BETWEEN join to a hash join when enabled") {
    val sfDir = "/root/testdata/sf0.001"
    val cust = extSpark.read.parquet(s"$sfDir/customer.parquet")
      .select(org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.col("c_acctbal"))
    val supp = extSpark.read.parquet(s"$sfDir/supplier.parquet")
    cust.createOrReplaceTempView("cust_v")
    supp.createOrReplaceTempView("supp_v")

    val sql =
      """SELECT c_custkey, s_suppkey FROM cust_v JOIN supp_v
        |  ON c_acctbal >= s_acctbal - 50 AND c_acctbal <= s_acctbal + 50""".stripMargin

    // Without the conf: nested-loop (baseline result + plan).
    val naive = extSpark.sql(sql)
    naive.queryExecution.executedPlan.toString() should include("BroadcastNestedLoop")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    extSpark.conf.set("spark.graft.rangejoin.binwidth", "100")
    try {
      val rewritten = extSpark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString()
      plan should not include "BroadcastNestedLoop"
      plan should include("HashJoin")
      rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
    } finally extSpark.conf.unset("spark.graft.rangejoin.binwidth")
  }

  test("BinnedRangeJoinRule derives bin width from CBO column stats when conf unset") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    extSpark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
      .write.mode("overwrite").saveAsTable("cust_stats_t")
    extSpark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_acctbal"))
      .write.mode("overwrite").saveAsTable("supp_stats_t")
    try {
      extSpark.sql(
        "ANALYZE TABLE supp_stats_t COMPUTE STATISTICS FOR COLUMNS s_acctbal")
      val sql =
        """SELECT c_custkey, s_suppkey FROM cust_stats_t JOIN supp_stats_t
          |  ON c_acctbal >= s_acctbal - 50 AND c_acctbal <= s_acctbal + 50""".stripMargin

      // CBO off: no column stats reach the rule → untouched nested loop.
      extSpark.conf.set("spark.sql.cbo.enabled", "false")
      val naive = extSpark.sql(sql)
      naive.queryExecution.executedPlan.toString() should include("BroadcastNestedLoop")
      val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // CBO on, conf still unset: width derived from the analyzed stats.
      extSpark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val rewritten = extSpark.sql(sql)
        val plan = rewritten.queryExecution.executedPlan.toString()
        plan should not include "BroadcastNestedLoop"
        plan should include("HashJoin")
        rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
      } finally extSpark.conf.set("spark.sql.cbo.enabled", "false")
    } finally {
      extSpark.sql("DROP TABLE IF EXISTS cust_stats_t")
      extSpark.sql("DROP TABLE IF EXISTS supp_stats_t")
    }
  }

  test("stats-derived width clamps the per-interval bin count at maxbins") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    extSpark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
      .write.mode("overwrite").saveAsTable("cust_clamp_t")
    // Interval table with one OUTLIER row spanning the whole acctbal domain:
    // with width = span/rowCount that row alone would explode into ~rowCount
    // Generate rows; the maxbins clamp keeps it at ≤ maxbins+1.
    extSpark.read.parquet(s"$sfDir/supplier.parquet")
      .selectExpr("s_suppkey",
        "CASE WHEN s_suppkey = 1 THEN -99999.0 ELSE s_acctbal END AS lo_b",
        "CASE WHEN s_suppkey = 1 THEN  99999.0 ELSE s_acctbal END AS hi_b")
      .write.mode("overwrite").saveAsTable("supp_clamp_t")
    try {
      extSpark.sql(
        "ANALYZE TABLE supp_clamp_t COMPUTE STATISTICS FOR COLUMNS lo_b, hi_b")
      val sql =
        """SELECT c_custkey, s_suppkey FROM cust_clamp_t JOIN supp_clamp_t
          |  ON c_acctbal >= lo_b - 50 AND c_acctbal <= hi_b + 50""".stripMargin
      extSpark.conf.set("spark.sql.cbo.enabled", "false")
      val expected = extSpark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      extSpark.conf.set("spark.sql.cbo.enabled", "true")
      extSpark.conf.set("spark.graft.rangejoin.maxbins", "8")
      try {
        val rewritten = extSpark.sql(sql)
        val plan = rewritten.queryExecution.executedPlan.toString()
        plan should not include "BroadcastNestedLoop"
        plan should include("HashJoin")
        rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
      } finally {
        extSpark.conf.unset("spark.graft.rangejoin.maxbins")
        extSpark.conf.set("spark.sql.cbo.enabled", "false")
      }
    } finally {
      extSpark.sql("DROP TABLE IF EXISTS cust_clamp_t")
      extSpark.sql("DROP TABLE IF EXISTS supp_clamp_t")
    }
  }
}
