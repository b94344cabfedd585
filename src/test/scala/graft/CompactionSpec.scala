package graft

import graft.sinks.Compaction
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionSpec extends SparkTestBase {

  test("compaction collapses a fragmented dataset and preserves every row") {
    val dir = Files.createTempDirectory("compact").toString + "/lineitem"
    val li  = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(40).write.parquet(dir)

    val before = spark.read.parquet(dir)
    val checksumBefore = before
      .agg(sum(col("l_orderkey")), count(lit(1))).collect()(0)

    val res = Compaction.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    res.filesBefore shouldBe 40
    res.filesAfter shouldBe 1   // tiny dataset → single target file
    res.rows shouldBe checksumBefore.getLong(1)

    val after = spark.read.parquet(dir)
    after.agg(sum(col("l_orderkey")), count(lit(1))).collect()(0) shouldBe checksumBefore
  }

  test("range-clustered compaction orders files for min/max pruning") {
    val dir = Files.createTempDirectory("compact2").toString + "/orders"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(16).write.parquet(dir)

    // Force >1 output file with a small target so ranges are observable.
    val bytes = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val res = Compaction.compact(spark, dir, targetFileBytes = bytes / 3,
      sortCols = Seq("o_orderkey"))
    res.filesAfter should be >= 2

    // Per-file key ranges must not overlap (range partitioning property).
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => hi1 should be <= lo2
      case _                         =>
    }
  }
}
