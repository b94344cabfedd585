package graft

import graft.sinks.LakeSink
import java.nio.file.Files

class LakeSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("publishPartition writes atomically with a sidecar, and re-publish replaces") {
    val root = Files.createTempDirectory("graft-lake").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")

    val n1 = LakeSink.publishPartition(spark, df, root, "silver/t", "2026-01-01", "v1", "src")
    n1 shouldBe 2
    spark.read.parquet(s"$root/silver/t/dt=2026-01-01").count() shouldBe 2

    val sidecar = LakeSink.readSidecar(spark, s"$root/silver/t/dt=2026-01-01").get
    sidecar should include(""""dataset": "silver/t"""")
    sidecar should include(""""row_count": 2""")
    sidecar should include(""""execution_date": "2026-01-01"""")

    // Re-publish with different content: replaced wholesale, not appended.
    val df2 = Seq((9L, "z")).toDF("k", "v")
    LakeSink.publishPartition(spark, df2, root, "silver/t", "2026-01-01", "v1", "src")
    spark.read.parquet(s"$root/silver/t/dt=2026-01-01").count() shouldBe 1

    // No staging junk left behind.
    new java.io.File(s"$root/silver/t").listFiles().map(_.getName)
      .filter(_.startsWith(".staging")) shouldBe empty
  }

  test("CSV write round-trips with header and matches the raw reader") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/raw"
    val df = Seq(("bitcoin", 91343.0), ("ethereum", 3116.61)).toDF("id", "current_price")
    LakeSink.writeCsv(spark, df, dir)
    val back = spark.read.option("header", true)
      .option("inferSchema", true).csv(dir)
    back.count() shouldBe 2
    back.columns.toSeq shouldBe Seq("id", "current_price")
    back.filter($"id" === "bitcoin").select($"current_price")
      .head().getDouble(0) shouldBe 91343.0
  }

  test("partitions land side by side and read as a partitioned table") {
    val root = Files.createTempDirectory("graft-lake2").toString
    LakeSink.publishPartition(spark, Seq((1L, "a")).toDF("k", "v"), root, "gold/t",
      "2026-01-01", "v1", "s")
    LakeSink.publishPartition(spark, Seq((2L, "b")).toDF("k", "v"), root, "gold/t",
      "2026-01-02", "v1", "s")
    val all = spark.read.parquet(s"$root/gold/t")
    all.count() shouldBe 2
    all.columns should contain("dt")
  }
}
